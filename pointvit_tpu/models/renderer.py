"""Multi-view renderer classifier: point cloud → rendered views → adapted ViT.

Capability rebuild of ``src/models/renderer.py`` + ``src/models/diff_renderer.py``:

- :class:`ViewTransformationNetwork` — predicts per-cloud azimuth/elevation
  for each view (MVTN-style, diff_renderer.py:5-94).
- :class:`PointCloudRendererClassifier` — fixed or learned-view rendering
  (both renderers live in :mod:`pointvit_tpu.ops.render`), a frozen
  torchvision-layout ViT with serial adapters per view, learned softmax view
  aggregation, MLP head (renderer.py:181-368).

TPU-native deltas: rendering and the per-view ViT forwards are batched over
the view axis as one (B·V, …) graph instead of the reference's per-view
Python loops (renderer.py:174-177, 313-317), and the single-channel depth
image is broadcast to RGB only at the patchify conv input.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pointvit_tpu.nn.heads import RendererHead
from pointvit_tpu.nn.vit import ImageViT
from pointvit_tpu.ops.render import render_diff_views, render_fixed_views

__all__ = [
    "ViewTransformationNetwork",
    "PointCloudRendererClassifier",
    "renderer_trainable_mask",
    "TORCHVISION_VIT_PRESETS",
]

# torchvision variants the reference supports (vit.py:6-37).
TORCHVISION_VIT_PRESETS = {
    "vit_b_16": dict(patch_size=16, embed_dim=768, depth=12, num_heads=12),
    "vit_b_32": dict(patch_size=32, embed_dim=768, depth=12, num_heads=12),
    "vit_l_16": dict(patch_size=16, embed_dim=1024, depth=24, num_heads=16),
    "vit_l_32": dict(patch_size=32, embed_dim=1024, depth=24, num_heads=16),
}

_BN = dict(momentum=0.9, epsilon=1e-5)


def _angle_bias_init(num_views: int, which: str):
    """Head bias = default camera ring in radians (diff_renderer.py:56-60).
    Pure numpy — this runs inside ``init`` traces, where calling the jnp
    helpers would produce tracers."""
    if which == "az":
        angles = np.linspace(0.0, 360.0, num_views + 1)[:-1]
    else:
        angles = np.asarray([0.0, 30.0, -30.0, 0.0, 0.0, 0.0])[:num_views]
    angles = np.deg2rad(angles)

    def init(key, shape, dtype=jnp.float32):
        del key
        return jnp.asarray(angles, dtype).reshape(shape)

    return init


class ViewTransformationNetwork(nn.Module):
    """Predict per-cloud view angles: azimuth ∈ [-π, π], elevation ∈ [-π/3, π/3]."""

    num_views: int = 6
    hidden_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points: jax.Array, *, train: bool = False) -> tuple[jax.Array, jax.Array]:
        x = points  # (B, N, 3); k=1 convs are pointwise Dense
        for i, width in enumerate((64, 128, self.hidden_dim)):
            x = nn.Dense(width, dtype=self.dtype, name=f"enc{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name=f"enc_bn{i}", **_BN)(x)
            x = nn.relu(x)
        x = jnp.max(x, axis=1)  # adaptive max pool over points

        for i in range(2):
            x = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"pred{i}")(x)
            x = nn.relu(x)

        az = nn.Dense(
            self.num_views,
            kernel_init=nn.initializers.zeros,
            bias_init=_angle_bias_init(self.num_views, "az"),
            dtype=self.dtype,
            name="azimuth_head",
        )(x)
        el = nn.Dense(
            self.num_views,
            kernel_init=nn.initializers.zeros,
            bias_init=_angle_bias_init(self.num_views, "el"),
            dtype=self.dtype,
            name="elevation_head",
        )(x)
        az = jnp.tanh(az) * jnp.pi
        el = jnp.tanh(el) * (jnp.pi / 3)
        return az, el


class PointCloudRendererClassifier(nn.Module):
    """Render → per-view adapted ViT → learned view aggregation → head."""

    num_classes: int = 15
    vit_name: str = "vit_b_16"
    adapter_dim: int = 64
    num_views: int = 6
    img_size: int = 224
    diff_renderer: bool = False
    view_transform_hidden: int = 256
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    # None = auto; 'xla' forces the einsum attention path (no Pallas).
    implementation: str | None = None

    def setup(self):
        preset = TORCHVISION_VIT_PRESETS.get(self.vit_name)
        if preset is None:
            raise ValueError(f"Unsupported ViT model: {self.vit_name}")
        if self.diff_renderer:
            self.view_transform_net = ViewTransformationNetwork(
                self.num_views, self.view_transform_hidden, dtype=self.dtype
            )
        self.vit = ImageViT(
            depth=preset["depth"],
            embed_dim=preset["embed_dim"],
            num_heads=preset["num_heads"],
            patch_size=preset["patch_size"],
            adapter_bottleneck=self.adapter_dim,
            dropout_rate=0.0,
            dtype=self.dtype,
            implementation=self.implementation,
        )
        self.view_aggregation = self.param(
            "view_aggregation",
            lambda key, shape: jnp.ones(shape) / self.num_views,
            (self.num_views,),
        )
        self.classifier = RendererHead(
            self.num_classes, dropout_rate=self.dropout_rate, dtype=self.dtype
        )

    def render_views(self, points: jax.Array, *, train: bool = False) -> jax.Array:
        """(B, N, 3) → (B, V, H, W) depth-shaded views (renderer.py:261-294)."""
        B, N, _ = points.shape
        if not self.diff_renderer:
            return render_fixed_views(points, self.img_size, self.num_views)
        az, el = self.view_transform_net(points, train=train)
        flat_pts = jnp.broadcast_to(
            points[:, None], (B, self.num_views, N, 3)
        ).reshape(B * self.num_views, N, 3)
        views = render_diff_views(
            flat_pts,
            az.astype(points.dtype).reshape(-1),
            el.astype(points.dtype).reshape(-1),
            self.img_size,
        )
        return views.reshape(B, self.num_views, self.img_size, self.img_size)

    def predict_views(self, points: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Learned view angles in degrees (renderer.py:351-368)."""
        if not self.diff_renderer:
            raise ValueError("predict_views requires diff_renderer=True")
        az, el = self.view_transform_net(points, train=False)
        return jnp.rad2deg(az), jnp.rad2deg(el)

    def __call__(self, points: jax.Array, *, train: bool = False) -> jax.Array:
        B = points.shape[0]
        views = self.render_views(points, train=train)  # (B, V, H, W)
        # One batched ViT pass over all views (replaces the reference's
        # sequential per-view loop, renderer.py:313-317). Broadcast the depth
        # intensity to RGB at the last moment (renderer.py:94 semantics).
        images = views.reshape(B * self.num_views, self.img_size, self.img_size, 1)
        images = jnp.broadcast_to(
            images, (B * self.num_views, self.img_size, self.img_size, 3)
        ).astype(self.dtype)

        feats = self.vit(images, deterministic=not train)
        feats = feats.reshape(B, self.num_views, -1)

        w = jax.nn.softmax(self.view_aggregation.astype(feats.dtype))
        agg = jnp.einsum("bvc,v->bc", feats, w)
        return self.classifier(agg, train=train)


def renderer_trainable_mask(params):
    """Trainable mask matching renderer.py:242-244: inside the ViT only
    adapter params train; everything outside the ViT (view transform net,
    view aggregation, classifier head) trains."""
    import jax.tree_util as jtu

    def trainable(path) -> bool:
        keys = "/".join(p.key for p in path if isinstance(p, jtu.DictKey))
        if "vit/" in keys or keys.startswith("vit"):
            return "adapter" in keys
        return True

    flat = jtu.tree_flatten_with_path(params)[0]
    return jtu.tree_unflatten(
        jtu.tree_structure(params), [trainable(p) for p, _ in flat]
    )
