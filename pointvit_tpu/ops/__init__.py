"""XLA/Pallas compute kernels for point-cloud tokenization and rendering."""

from pointvit_tpu.ops.fps import farthest_point_sample, fps_gather
from pointvit_tpu.ops.knn import (
    knn_gather,
    knn_group,
    knn_indices,
    square_distance,
)
from pointvit_tpu.ops.morton import (
    encode_morton3,
    morton_argsort,
    morton_codes,
    part1by2,
)
from pointvit_tpu.ops.group import apf_group, p3_group
from pointvit_tpu.ops.sampler_bench import (
    benchmark_fps_implementations,
    fps_sampling_with_knn,
)
from pointvit_tpu.ops.render import (
    rasterize_amax_fast,
    depth_intensity,
    fixed_view_angles,
    project_orthographic,
    project_points_spherical,
    rasterize_amax,
    render_diff_views,
    render_fixed_views,
    rotate_az_el,
    splat_bilinear,
)

__all__ = [
    "farthest_point_sample",
    "fps_gather",
    "knn_gather",
    "knn_group",
    "knn_indices",
    "square_distance",
    "encode_morton3",
    "morton_argsort",
    "morton_codes",
    "part1by2",
    "apf_group",
    "p3_group",
    "fps_sampling_with_knn",
    "benchmark_fps_implementations",
    "depth_intensity",
    "fixed_view_angles",
    "project_orthographic",
    "project_points_spherical",
    "rasterize_amax",
    "render_diff_views",
    "render_fixed_views",
    "rotate_az_el",
    "splat_bilinear",
]
