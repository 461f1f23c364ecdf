"""Dynamic w8a8 quantization: numeric closeness to the float path and
param-tree compatibility (QuantDense must be checkpoint-identical to Dense)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointvit_tpu.nn.quant import QuantDense, dynamic_quant_matmul


class TestQuantDense:
    def test_param_tree_matches_dense(self):
        import flax.linen as nn

        x = jnp.ones((4, 32))
        qd = QuantDense(64).init(jax.random.PRNGKey(0), x)["params"]
        d = nn.Dense(64).init(jax.random.PRNGKey(0), x)["params"]
        assert jax.tree.structure(qd) == jax.tree.structure(d)
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(qd),
            jax.tree_util.tree_leaves_with_path(d),
        ):
            assert pa == pb and a.shape == b.shape and a.dtype == b.dtype

    def test_matmul_close_to_f32(self, rng):
        x = jnp.asarray(rng.normal(size=(128, 96)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(96, 64)), jnp.float32)
        ref = x @ w
        got = dynamic_quant_matmul(x, w)
        # dynamic per-row/per-col int8: relative L2 error well under 2%
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert rel < 0.02, rel

    def test_extreme_rows_stable(self):
        # tiny-magnitude and zero rows must not produce NaN/inf
        x = jnp.stack([jnp.zeros((16,)), jnp.full((16,), 1e-12), jnp.full((16,), 1e6)])
        w = jnp.ones((16, 8), jnp.float32)
        out = dynamic_quant_matmul(x, w)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_rows_scaled_independently(self, rng):
        # a huge row must not destroy small rows' precision (per-row scales)
        small = jnp.asarray(rng.normal(size=(1, 64)), jnp.float32) * 1e-3
        big = jnp.asarray(rng.normal(size=(1, 64)), jnp.float32) * 1e3
        x = jnp.concatenate([small, big])
        w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
        got = dynamic_quant_matmul(x, w)
        ref = x @ w
        rel_small = float(
            jnp.linalg.norm(got[0] - ref[0]) / jnp.linalg.norm(ref[0])
        )
        assert rel_small < 0.02, rel_small


class TestQuantizedAPF:
    @pytest.fixture(scope="class")
    def models(self):
        from pointvit_tpu.models import AdaptPointFormer

        kw = dict(
            num_classes=15, in_channels=3, embedding_dim=96, npoint=16,
            nsample=8, depth=2, num_heads=4,
        )
        mf = AdaptPointFormer(**kw)
        mq = AdaptPointFormer(**kw, quantized=True)
        points = jax.random.normal(jax.random.PRNGKey(0), (8, 128, 3), jnp.float32)
        variables = mf.init({"params": jax.random.PRNGKey(1)}, points[:1])
        return mf, mq, variables, points

    def test_same_param_tree(self, models):
        mf, mq, variables, points = models
        vq = mq.init({"params": jax.random.PRNGKey(1)}, points[:1])
        assert jax.tree.structure(vq["params"]) == jax.tree.structure(
            variables["params"]
        )

    def test_logits_close(self, models):
        mf, mq, variables, points = models
        ref = mf.apply(variables, points, train=False)
        got = mq.apply(variables, points, train=False)
        # random-weight logits: quantization noise stays small and the
        # predicted class is overwhelmingly preserved
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        assert rel < 0.05, rel
        agree = float(jnp.mean(jnp.argmax(got, -1) == jnp.argmax(ref, -1)))
        assert agree >= 0.75, agree

    def test_train_mode_rejected(self, models):
        _, mq, variables, points = models
        with pytest.raises(ValueError, match="inference-only"):
            mq.apply(
                variables, points, train=True,
                rngs={"dropout": jax.random.PRNGKey(0), "fps": jax.random.PRNGKey(1)},
                mutable=["batch_stats"],
            )


class TestPallasQuantDense:
    """Interpret-mode equivalence of the fused kernel vs the XLA formulation
    (per repo convention: every Pallas kernel has one)."""

    def test_matches_xla_path(self, rng):
        from pointvit_tpu.ops.pallas_quant import quant_dense

        x = jnp.asarray(rng.normal(size=(256, 384)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(384, 256)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(256,)), jnp.float32)
        ref = (dynamic_quant_matmul(x, w) + b).astype(jnp.bfloat16)
        got = quant_dense(x, w, b, interpret=True)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=0, atol=2e-2 * float(jnp.max(jnp.abs(ref))),
        )

    def test_3d_input_and_no_bias(self, rng):
        from pointvit_tpu.ops.pallas_quant import quant_dense

        x = jnp.asarray(rng.normal(size=(4, 128, 256)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
        ref = dynamic_quant_matmul(x, w).astype(jnp.bfloat16)
        got = quant_dense(x, w, None, interpret=True)
        assert got.shape == (4, 128, 128)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=0, atol=2e-2 * float(jnp.max(jnp.abs(ref))),
        )

    def test_untileable_falls_back(self, rng):
        from pointvit_tpu.ops.pallas_quant import quant_dense

        # M=100 not divisible by 128 -> XLA fallback, same numerics
        x = jnp.asarray(rng.normal(size=(100, 64)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(64, 96)), jnp.float32)
        ref = dynamic_quant_matmul(x, w).astype(jnp.bfloat16)
        got = quant_dense(x, w, None)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
