"""Renderer exerciser — capability parity with ``test/test_renderer.py``.

Renders one cloud through the fixed-view renderer (6 views), times it, and
saves a view grid PNG. ``--diff`` uses the differentiable renderer with the
default camera ring instead.

Usage:
    python scripts/render_sample.py [--root DIR] [--synthetic] [--diff]
                                    [--views N] [--out rendered_views.png]
"""

from __future__ import annotations

import argparse
import os
import tempfile
import time

import numpy as np
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default=".data/h5_files")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--diff", action="store_true")
    parser.add_argument("--views", type=int, default=6)
    parser.add_argument("--img-size", type=int, default=224)
    parser.add_argument("--out", default="rendered_views.png")
    args = parser.parse_args()

    import jax.numpy as jnp

    from pointvit_tpu.data import ScanObjectNN
    from pointvit_tpu.ops import (
        fixed_view_angles,
        render_diff_views,
        render_fixed_views,
    )

    root = args.root
    if args.synthetic:
        from pointvit_tpu.data.synthetic import write_scanobjectnn_h5

        root = tempfile.mkdtemp(prefix="sonn_")
        write_scanobjectnn_h5(root)

    ds = ScanObjectNN(root, normalize=True)
    points, label = ds[0]
    pts = jnp.asarray(points)[None]
    print(f"sample 0: {points.shape[0]} points, class {label}")

    t0 = time.time()
    if args.diff:
        az_deg, el_deg = fixed_view_angles(args.views)
        az = jnp.deg2rad(jnp.tile(az_deg, 1))
        el = jnp.deg2rad(jnp.tile(el_deg, 1))
        flat = jnp.broadcast_to(pts, (args.views,) + pts.shape[1:])
        views = render_diff_views(flat, az, el, args.img_size)
    else:
        views = render_fixed_views(pts, args.img_size, args.views)[0]
    views = np.asarray(views)
    print(f"rendered {args.views} views at {args.img_size}² in {time.time()-t0:.2f}s "
          f"(includes compile)")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cols = min(args.views, 3)
    rows = int(np.ceil(args.views / 3))
    fig = plt.figure(figsize=(cols * 4, rows * 4))
    for i in range(args.views):
        ax = fig.add_subplot(rows, cols, i + 1)
        ax.imshow(np.clip(views[i], 0, 1), cmap="gray")
        ax.axis("off")
        ax.set_title(f"View {i}")
    fig.tight_layout()
    fig.savefig(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
