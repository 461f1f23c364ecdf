"""On-device (real TPU) tests — run via the /verify recipe:

    POINTVIT_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

Round-2 verdict: the CPU suite forces 8 virtual CPU devices, so every
``jax.default_backend() in ("tpu", "axon")`` selection branch resolves False
in CI and the fused Pallas kernels are only ever validated interpret-mode.
A regression that silently deselects a fused kernel on the real chip (or
selects one at an unsupported shape) would pass CI and only surface as a
throughput drop. These tests pin, on the real chip:

1. ``implementation=None`` resolves to the fused paths at the bench shapes
   (fps, kNN grouping, group encoder, APF block, attention).
2. fused == XLA outputs on-device at one APF and one Pix4Point shape.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu

BENCH_B, BENCH_N, BENCH_G, BENCH_K = 256, 1024, 196, 32  # bench.py config
P3_B, P3_N, P3_S, P3_K = 64, 2048, 512, 16  # pix4point bench config


def test_backend_is_real_tpu():
    assert jax.default_backend() in ("tpu", "axon"), jax.devices()


class TestFusedSelection:
    """The auto (implementation=None) choice must be the fused kernel at
    every bench shape on the real chip."""

    def test_fps_selects_pallas(self):
        from pointvit_tpu.ops.fps import _default_implementation

        assert _default_implementation(BENCH_B, BENCH_N) == "pallas"
        assert _default_implementation(P3_B, P3_N) == "pallas"
        # and falls back for the one-time B=1 init trace
        assert _default_implementation(1, BENCH_N) == "xla"

    def test_knn_selects_fused(self):
        from pointvit_tpu.ops.group import _use_fused_knn

        assert _use_fused_knn(BENCH_N)
        assert _use_fused_knn(P3_N)
        assert not _use_fused_knn(BENCH_N + 1)  # non-lane-aligned

    def test_attention_selects_fused(self):
        from pointvit_tpu.nn.layers import _use_fused_attention

        assert _use_fused_attention()

    def test_encoder_selects_fused_kernel(self):
        from pointvit_tpu.nn.pointnet import GroupFeatureEncoder

        enc = GroupFeatureEncoder(embed_dim=32, dtype=jnp.bfloat16)
        groups = jnp.zeros((8, BENCH_G, BENCH_K, 6))
        variables = enc.init({"params": jax.random.PRNGKey(0)}, groups[:1])
        bound = enc.bind(variables)
        assert bound._fused_ok(8, BENCH_G, train=False)
        assert not bound._fused_ok(8, BENCH_G, train=True)

    def test_p3_embed_selects_fused_kernel(self):
        from pointvit_tpu.nn.pointnet import P3Embed

        emb = P3Embed(embed_dim=32, k=4, dtype=jnp.bfloat16)
        pts = jnp.zeros((2, 64, 3))
        variables = emb.init({"params": jax.random.PRNGKey(0)}, pts, pts)
        bound = emb.bind(variables)
        assert bound._fused_stage_ok(32, 0, train=False)
        assert not bound._fused_stage_ok(32, 0, train=True)
        assert not bound._fused_stage_ok(28, 0, train=False)  # % 16 gate

    def test_apf_block_selects_fused(self):
        from pointvit_tpu.nn.vit import APFBlock, _fused_block_ok

        blk = APFBlock(num_heads=4, dtype=jnp.bfloat16)
        x = jnp.zeros((2, 8, 64))
        variables = blk.init({"params": jax.random.PRNGKey(0)}, x)
        bound = blk.bind(variables)
        assert _fused_block_ok(bound, x, True, "norm1", not blk.quantized)
        assert not _fused_block_ok(bound, x, False, "norm1", True)  # training

    def test_vit_block_selects_fused(self):
        from pointvit_tpu.nn.vit import ViTBlock, _fused_block_ok

        blk = ViTBlock(num_heads=4, dtype=jnp.bfloat16)
        x = jnp.zeros((2, 8, 64))
        variables = blk.init({"params": jax.random.PRNGKey(0)}, x)
        bound = blk.bind(variables)
        assert _fused_block_ok(bound, x, True, "norm1", blk.mlp_ratio == 4.0)
        assert not _fused_block_ok(bound, x, False, "norm1", True)  # training
        attn_only = ViTBlock(num_heads=4, implementation="attn").bind(variables)
        assert not _fused_block_ok(attn_only, x, True, "norm1", True)

    def test_serial_block_selects_fused(self):
        from pointvit_tpu.nn.vit import SerialAdapterBlock, _fused_block_ok

        blk = SerialAdapterBlock(num_heads=4, dtype=jnp.bfloat16)
        x = jnp.zeros((2, 8, 64))
        variables = blk.init({"params": jax.random.PRNGKey(0)}, x)
        bound = blk.bind(variables)
        assert _fused_block_ok(bound, x, True, "ln_1", blk.mlp_ratio == 4.0)
        assert not _fused_block_ok(bound, x, False, "ln_1", True)  # training


class TestFusedEqualsXLAOnDevice:
    """fused vs implementation='xla' at real (scaled-down-batch) shapes,
    executed on the chip (not interpret-mode)."""

    def test_apf_forward(self):
        from pointvit_tpu.models import AdaptPointFormer

        kwargs = dict(
            num_classes=15, in_channels=3, embedding_dim=192,
            npoint=BENCH_G, nsample=BENCH_K, depth=2, num_heads=3,
            dtype=jnp.bfloat16,
        )
        pts = jax.random.normal(jax.random.PRNGKey(0), (8, BENCH_N, 3), jnp.float32)
        fused = AdaptPointFormer(**kwargs)
        variables = fused.init({"params": jax.random.PRNGKey(1)}, pts[:1])
        ref = AdaptPointFormer(**kwargs, implementation="xla")

        out_fused = jax.jit(lambda v, p: fused.apply(v, p, train=False))(variables, pts)
        out_xla = jax.jit(lambda v, p: ref.apply(v, p, train=False))(variables, pts)
        np.testing.assert_allclose(
            np.asarray(out_fused, np.float32),
            np.asarray(out_xla, np.float32),
            atol=0.25, rtol=0.05,  # bf16 accumulation-order differences over 2 blocks
        )

    def test_vit_block_fused_matches_xla_at_pix4point_geometry(self):
        """Fused whole-block kernel (head-chunked two-pass at S=513) vs the
        forced-XLA block, on the chip — interpret-mode tests can't catch
        XLA-TPU-only numeric rewrites (CLAUDE.md bf16-round-trip trap)."""
        from pointvit_tpu.nn.vit import ViTBlock

        S, E, H = 513, 384, 6
        x = jax.random.normal(jax.random.PRNGKey(0), (8, S, E), jnp.bfloat16)
        pos = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (8, S, E), jnp.bfloat16)
        blk = ViTBlock(H, dtype=jnp.bfloat16)
        variables = blk.init({"params": jax.random.PRNGKey(2)}, x)
        ref = ViTBlock(H, dtype=jnp.bfloat16, implementation="xla")

        out_fused = jax.jit(
            lambda v, t, p: blk.apply(v, t, pos=p, deterministic=True)
        )(variables, x, pos)
        out_xla = jax.jit(
            lambda v, t, p: ref.apply(v, t, pos=p, deterministic=True)
        )(variables, x, pos)
        np.testing.assert_allclose(
            np.asarray(out_fused, np.float32),
            np.asarray(out_xla, np.float32),
            atol=0.15, rtol=0.05,  # bf16 accumulation-order differences
        )

    def test_serial_block_fused_matches_xla_at_renderer_geometry(self):
        """Fused serial-adapter block vs forced-XLA at the renderer ViT-B
        shape (S=197, E=768, H=12), executed on the chip."""
        from pointvit_tpu.nn.vit import SerialAdapterBlock

        S, E, H = 197, 768, 12
        x = jax.random.normal(jax.random.PRNGKey(0), (8, S, E), jnp.bfloat16)
        blk = SerialAdapterBlock(H, dtype=jnp.bfloat16)
        variables = blk.init({"params": jax.random.PRNGKey(2)}, x)
        p = jax.tree.map(lambda a: a, variables["params"])
        for name in ("adapter1", "adapter2"):  # zero-init up_proj → non-trivial
            p[name]["up_proj"]["kernel"] = 0.05 * jax.random.normal(
                jax.random.PRNGKey(3), p[name]["up_proj"]["kernel"].shape
            )
        variables = {"params": p}
        ref = SerialAdapterBlock(H, dtype=jnp.bfloat16, implementation="xla")

        out_fused = jax.jit(lambda v, t: blk.apply(v, t, deterministic=True))(
            variables, x
        )
        out_xla = jax.jit(lambda v, t: ref.apply(v, t, deterministic=True))(
            variables, x
        )
        np.testing.assert_allclose(
            np.asarray(out_fused, np.float32),
            np.asarray(out_xla, np.float32),
            atol=0.15, rtol=0.05,  # bf16 accumulation-order differences
        )

    def test_p3_group_fused_matches_xla(self):
        from pointvit_tpu.ops.knn import knn_gather, knn_indices
        from pointvit_tpu.ops.pallas_knn import knn_group_pallas

        pts = jax.random.normal(jax.random.PRNGKey(2), (8, P3_N, 3), jnp.float32)
        feats = jax.random.normal(jax.random.PRNGKey(3), (8, P3_N, 8), jnp.float32)
        from pointvit_tpu.ops.fps import farthest_point_sample, fps_gather

        centers = fps_gather(pts, farthest_point_sample(pts, P3_S))
        idx_p, fused = knn_group_pallas(pts, centers, feats, P3_K)
        idx_x = knn_indices(centers, pts, P3_K)
        # neighbour sets: exact away from near-ties (the packed key steals
        # 11 mantissa-tail bits at N=2048 — ≤2^-12 relative perturbation)
        same = np.sort(np.asarray(idx_p), -1) == np.sort(np.asarray(idx_x), -1)
        assert same.mean() > 0.995, same.mean()
        # gathered payload at the kernel's own indices: split-bf16
        # reconstruction, ~2^-16 relative (this catches the r3 lo-plane
        # regression where XLA folded the split away → plain-bf16 2^-9)
        exact_at_idx = knn_gather(feats, idx_p)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(exact_at_idx), atol=2e-4, rtol=2e-4,
        )

    def test_p3_embed_fused_matches_xla(self):
        """Fused P3Embed stage kernel (BN folds + conv1-pair collapse +
        concat split) vs the forced-XLA conv stack, on the chip — the
        folds are bit-sensitive rewrites interpret tests can't fully pin
        (CLAUDE.md bf16-round-trip trap class)."""
        from pointvit_tpu.nn.pointnet import P3Embed

        emb = P3Embed(embed_dim=384, k=16, dtype=jnp.bfloat16)
        pts = jax.random.normal(jax.random.PRNGKey(0), (8, 1024, 3), jnp.float32)
        variables = emb.init(jax.random.PRNGKey(1), pts, pts, train=False)
        ref = P3Embed(embed_dim=384, k=16, dtype=jnp.bfloat16, implementation="xla")

        c_f, f_fused = jax.jit(
            lambda v, p: emb.apply(v, p, p, train=False)
        )(variables, pts)
        c_x, f_xla = jax.jit(
            lambda v, p: ref.apply(v, p, p, train=False)
        )(variables, pts)
        np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_x))
        np.testing.assert_allclose(
            np.asarray(f_fused, np.float32),
            np.asarray(f_xla, np.float32),
            atol=0.15, rtol=0.05,  # bf16 accumulation-order differences
        )


class TestAttentionBackwardOnDevice:
    def test_fused_bwd_matches_einsum_vjp(self):
        """The flash-style Pallas backward (real Mosaic compile, not
        interpret) must match the einsum recompute VJP it replaces, at the
        APF training shape and the Pix4Point (head-chunked) shape."""
        from pointvit_tpu.ops.pallas_attention import (
            _bwd_pallas_ok,
            _mha_qkv_bwd_pallas,
            _reference_mha_qkv,
        )

        for B, S, H, D in [(8, 197, 12, 64), (2, 513, 6, 64)]:
            assert _bwd_pallas_ok(S, H, D)
            qkv = jax.random.normal(
                jax.random.PRNGKey(0), (B, S, 3 * H * D), jnp.bfloat16
            )
            g = jax.random.normal(jax.random.PRNGKey(1), (B, S, H * D), jnp.bfloat16)
            got = _mha_qkv_bwd_pallas(qkv, g, H)
            _, vjp = jax.vjp(lambda t: _reference_mha_qkv(t, H), qkv)
            (want,) = vjp(g)
            np.testing.assert_allclose(
                np.asarray(got, np.float32),
                np.asarray(want, np.float32),
                rtol=0.08, atol=0.06,  # bf16 matmul accumulation-order
            )

    def test_knn_gather_payload_precision_on_device(self):
        """Split-bf16 payload must beat plain bf16 by ~2^7 — pins the r3
        lo-plane fix (XLA fold) against regression on the real chip."""
        from pointvit_tpu.ops.knn import knn_gather
        from pointvit_tpu.ops.pallas_knn import knn_group_pallas

        B, N, S, K, C = 2, 1024, 128, 16, 8
        pts = jax.random.normal(jax.random.PRNGKey(2), (B, N, 3), jnp.float32)
        feats = jax.random.normal(jax.random.PRNGKey(3), (B, N, C), jnp.float32)
        idx, fused = knn_group_pallas(pts, pts[:, :S], feats, K)
        exact = knn_gather(feats, idx)
        err = float(jnp.max(jnp.abs(fused - exact)))
        assert err < 2e-4, f"payload error {err} — lo plane lost again?"


class TestBenchShapeSmoke:
    def test_tokenizer_at_bench_shape(self):
        from pointvit_tpu.ops import apf_group

        pts = jax.random.normal(jax.random.PRNGKey(4), (32, BENCH_N, 3), jnp.float32)
        nb, ctr = apf_group(pts, pts, BENCH_G, BENCH_K)
        assert nb.shape == (32, BENCH_G, BENCH_K, 6)
        assert np.isfinite(float(jnp.sum(nb)))

    def test_tokenizer_at_v2_preset_shape(self):
        # v2 preset (parity-instrument ACCEPTED, bench-default candidate):
        # nsample 16 — pin the fused path also serves K=16 at APF shapes.
        from pointvit_tpu.ops import apf_group

        pts = jax.random.normal(jax.random.PRNGKey(5), (32, BENCH_N, 3), jnp.float32)
        nb, ctr = apf_group(pts, pts, BENCH_G, 16)
        assert nb.shape == (32, BENCH_G, 16, 6)
        assert np.isfinite(float(jnp.sum(nb)))


class TestExportOnDevice:
    def test_export_bakes_fused_paths_and_round_trips(self):
        """jax.export on the TPU host: the fused Pallas paths (auto dispatch
        keys on the exporting backend) must serialize (tpu_custom_call is an
        export-stable custom call) and the reloaded artifact must match the
        live model on the chip."""
        from pointvit_tpu.export import export_forward, load_forward
        from pointvit_tpu.models import AdaptPointFormer

        model = AdaptPointFormer(
            num_classes=15, in_channels=3, embedding_dim=192,
            npoint=BENCH_G, nsample=BENCH_K, depth=2, num_heads=3,
            dtype=jnp.bfloat16,
        )
        pts = jax.random.normal(jax.random.PRNGKey(9), (8, BENCH_N, 3), jnp.float32)
        variables = model.init({"params": jax.random.PRNGKey(10)}, pts[:1])
        fn = load_forward(export_forward(model, variables, pts))
        ref = jax.jit(lambda v, p: model.apply(v, p, train=False))(variables, pts)
        np.testing.assert_allclose(
            np.asarray(fn(pts), np.float32),
            np.asarray(ref, np.float32),
            atol=0.25, rtol=0.05,
        )


class TestMoEOnDevice:
    def test_moe_pix4point_forward_and_grad(self):
        """The MoE trunk (dense single-device dispatch, parallel/expert.py)
        compiles and runs on the real chip — fwd logits and a train-mode
        gradient through the router/experts/aux-loss are finite. CPU CI
        exercises this only on the virtual mesh; this pins the Mosaic/XLA
        lowering on hardware (first run r4: fwd 8.0 s compile, grad 50.7 s)."""
        from pointvit_tpu.models.pix4point import Pix4Point

        model = Pix4Point(
            num_classes=15, embed_dim=384, depth=4, num_heads=6,
            k_neighbors=16, moe_experts=4, moe_every=2, moe_top_k=2,
            dtype=jnp.bfloat16,
        )
        pts = jax.random.normal(jax.random.PRNGKey(0), (16, P3_N // 2, 3),
                                jnp.float32)
        variables = model.init({"params": jax.random.PRNGKey(1)}, pts[:1])
        logits = jax.jit(lambda v, p: model.apply(v, p, train=False))(
            variables, pts)
        assert logits.shape == (16, 15)
        assert bool(jnp.isfinite(logits).all())

        def loss_fn(params):
            out, mut = model.apply(
                {**variables, "params": params}, pts, train=True,
                rngs={"dropout": jax.random.PRNGKey(2),
                      "fps": jax.random.PRNGKey(3)},
                mutable=["batch_stats", "moe_aux"],
            )
            aux = mut.get("moe_aux", {})
            bal = sum(jax.tree.leaves(aux)) if aux else 0.0
            return jnp.mean((out - 1.0) ** 2) + 0.01 * bal

        g = jax.jit(jax.grad(loss_fn))(variables["params"])
        gn = float(jax.tree.reduce(lambda a, l: a + jnp.sum(jnp.abs(l)), g, 0.0))
        assert np.isfinite(gn) and gn > 0.0


class TestGradAccumOnDevice:
    def test_scan_accum_matches_full_batch(self, tmp_path):
        """Trainer(grad_accum=4) reproduces the full-batch trajectory on the
        real chip for a deterministic (rng-free) model — pins the in-step
        lax.scan accumulation lowering on hardware. TPU reassociates matmul
        accumulation, so the tolerance is looser than the CPU highest-
        precision test (measured r4: worst relative divergence 4e-5)."""
        import flax.linen as nn
        import optax

        from pointvit_tpu.train import Trainer

        class MLP(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                x = x.reshape((x.shape[0], -1))
                x = nn.tanh(nn.Dense(128)(x))
                return nn.Dense(15)(x)

        rng = np.random.default_rng(0)
        data = [(rng.normal(size=(64, 3)).astype(np.float32), i % 15)
                for i in range(128)]

        trees = {}
        for ga in (1, 4):
            t = Trainer(
                MLP(), train_dataset=data, test_dataset=data[:16],
                optimizer=optax.adam(1e-3), batch_size=64, epochs=1,
                output_dir=str(tmp_path / f"ga{ga}"), save_best=False,
                save_config_snapshot=False, prefetch=0, grad_accum=ga,
            )
            t.train()
            trees[ga] = jax.device_get(jax.tree.leaves(t.state.params))
        for a, b in zip(trees[1], trees[4]):
            np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-5)
