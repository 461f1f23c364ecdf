"""Public-API surface tests: sampler bench API, ViT registry, profiling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_fps_sampling_with_knn_shapes(rng):
    from pointvit_tpu.ops import fps_sampling_with_knn

    pts = jnp.asarray(rng.standard_normal((2, 64, 3)).astype(np.float32))
    centers, grouped = fps_sampling_with_knn(pts, 16, 8, implementation="xla")
    assert centers.shape == (2, 16, 3)
    assert grouped.shape == (2, 16, 8, 3)
    # first grouped point of each centre is the centre itself
    np.testing.assert_allclose(np.asarray(grouped[:, :, 0]), np.asarray(centers), atol=1e-6)


def test_get_vit_registry():
    from pointvit_tpu.models import get_vit

    module, dim = get_vit("vit_b_16", pretrained=False)
    assert dim == 768
    assert module.depth == 12
    with pytest.raises(ValueError):
        get_vit("not_a_vit")


def test_get_timm_vit_no_cache(tmp_path, monkeypatch):
    from pointvit_tpu.models import get_timm_vit

    monkeypatch.setenv("POINTVIT_WEIGHTS", str(tmp_path))
    with pytest.warns(UserWarning):
        assert get_timm_vit("vit_base_patch16_224") is None
    assert get_timm_vit("vit_base_patch16_224", pretrained=False) is None
    with pytest.raises(ValueError):
        get_timm_vit("bogus_model")


def test_step_timer():
    from pointvit_tpu.utils import StepTimer

    t = StepTimer()
    for _ in range(5):
        t.start()
        x = jnp.ones((8,)) * 2
        t.stop(x)
    s = t.summary()
    assert s["steps"] == 4  # first skipped as warmup
    assert s["p50_ms"] >= 0
    t.reset()
    assert t.count == 0
