"""StableHLO export round-trips: artifact == live model, any batch size."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointvit_tpu.export import export_forward, load_exported, load_forward, save_exported


@pytest.fixture(scope="module")
def apf():
    from pointvit_tpu.models import AdaptPointFormer

    model = AdaptPointFormer(
        num_classes=15, in_channels=3, embedding_dim=32, npoint=16, nsample=8,
        depth=2, num_heads=4,
    )
    pts = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(1)}, pts[:1])
    return model, variables, pts


def test_export_round_trip_batch_polymorphic(apf):
    model, variables, pts = apf
    blob = export_forward(model, variables, pts)
    assert isinstance(blob, bytes) and len(blob) > 0
    fn = load_forward(blob)
    ref = model.apply(variables, pts, train=False)
    np.testing.assert_allclose(
        np.asarray(fn(pts)), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
    # One artifact serves other batch sizes (symbolic batch dim).
    pts2 = jnp.concatenate([pts, pts], axis=0)
    ref2 = model.apply(variables, pts2, train=False)
    np.testing.assert_allclose(
        np.asarray(fn(pts2)), np.asarray(ref2), rtol=1e-5, atol=1e-5
    )


def test_export_static_batch_rejects_other_sizes(apf):
    model, variables, pts = apf
    blob = export_forward(model, variables, pts, batch_polymorphic=False)
    fn = load_forward(blob)
    np.testing.assert_allclose(
        np.asarray(fn(pts)),
        np.asarray(model.apply(variables, pts, train=False)),
        rtol=1e-5, atol=1e-5,
    )
    with pytest.raises(Exception):
        fn(pts[:2])


def test_export_file_round_trip(apf, tmp_path):
    model, variables, pts = apf
    path = str(tmp_path / "apf.stablehlo")
    save_exported(path, export_forward(model, variables, pts))
    fn = load_exported(path)
    np.testing.assert_allclose(
        np.asarray(fn(pts)),
        np.asarray(model.apply(variables, pts, train=False)),
        rtol=1e-5, atol=1e-5,
    )


def test_export_renderer(tmp_path):
    # Third family: rasterization (scatter-max + reduce_window) and the
    # per-view ViT all serialize; artifact == live model.
    from pointvit_tpu.models import renderer as rmod
    from pointvit_tpu.models import PointCloudRendererClassifier

    rmod.TORCHVISION_VIT_PRESETS["vit_export_test"] = dict(
        patch_size=8, embed_dim=32, depth=1, num_heads=4
    )
    model = PointCloudRendererClassifier(
        num_classes=5, vit_name="vit_export_test", num_views=2, img_size=32,
        implementation="xla",
    )
    pts = jax.random.normal(jax.random.PRNGKey(4), (2, 128, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(5)}, pts[:1])
    fn = load_forward(export_forward(model, variables, pts))
    np.testing.assert_allclose(
        np.asarray(fn(pts)),
        np.asarray(model.apply(variables, pts, train=False)),
        rtol=1e-5, atol=1e-5,
    )


def test_export_pix4point(apf, tmp_path):
    from pointvit_tpu.models import Pix4Point

    model = Pix4Point(
        num_classes=5, embed_dim=32, depth=2, num_heads=4, k_neighbors=4,
        implementation="xla",
    )
    pts = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(3)}, pts[:1])
    fn = load_forward(export_forward(model, variables, pts))
    np.testing.assert_allclose(
        np.asarray(fn(pts)),
        np.asarray(model.apply(variables, pts, train=False)),
        rtol=1e-5, atol=1e-5,
    )
