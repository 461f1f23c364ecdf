"""Model-family tests: shapes, modes, trainable masks, gradient flow.

Tiny configurations keep CPU compile times manageable; structural properties
(channel math, token counts, mask coverage) match the production configs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointvit_tpu.models import (
    AdaptPointFormer,
    Pix4Point,
    PointCloudRendererClassifier,
    ViewTransformationNetwork,
    apf_trainable_mask,
    pix4point_trainable_mask,
    renderer_trainable_mask,
)


def _count(mask_tree):
    leaves = jax.tree.leaves(mask_tree)
    return sum(bool(l) for l in leaves), len(leaves)


@pytest.fixture(scope="module")
def keys():
    k = jax.random.PRNGKey(0)
    return {"params": k, "dropout": jax.random.fold_in(k, 1), "fps": jax.random.fold_in(k, 2)}


class TestAPF:
    @pytest.fixture(scope="class")
    def setup(self):
        model = AdaptPointFormer(
            num_classes=15, embedding_dim=64, npoint=16, nsample=8,
            in_channels=4, depth=2, num_heads=4,
        )
        pts = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 4))
        variables = model.init({"params": jax.random.PRNGKey(1)}, pts)
        return model, pts, variables

    def test_eval_forward(self, setup):
        model, pts, variables = setup
        logits = model.apply(variables, pts)
        assert logits.shape == (2, 15)
        assert np.isfinite(np.asarray(logits)).all()

    def test_train_forward_updates_batch_stats(self, setup, keys):
        model, pts, variables = setup
        logits, mutated = model.apply(
            variables, pts, train=True,
            rngs={"dropout": keys["dropout"], "fps": keys["fps"]},
            mutable=["batch_stats"],
        )
        assert logits.shape == (2, 15)
        old = jax.tree.leaves(variables["batch_stats"])
        new = jax.tree.leaves(mutated["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
        )

    def test_wrong_channels_raises(self, setup):
        model, _, variables = setup
        with pytest.raises(ValueError):
            model.apply(variables, jnp.zeros((2, 128, 3)))

    def test_trainable_mask_default_vs_quirks(self, setup):
        _, _, variables = setup
        params = variables["params"]
        default = apf_trainable_mask(params)
        quirks = apf_trainable_mask(params, reference_quirks=True)
        n_default, total = _count(default)
        n_quirks, _ = _count(quirks)
        # Default additionally trains adapters → strictly more trainable leaves.
        assert n_default > n_quirks > 0
        # Attention/MLP trunk weights frozen in both.
        assert not default["blocks_0"]["attention"]["qkv"]["kernel"]
        assert not quirks["blocks_0"]["attention"]["qkv"]["kernel"]
        # Adapters: trainable by default, frozen under quirks (reference bug).
        assert default["blocks_0"]["adapter"]["down_proj"]["kernel"]
        assert not quirks["blocks_0"]["adapter"]["down_proj"]["kernel"]
        # Head + point encoder + final norm always trainable.
        for tree in (default, quirks):
            assert tree["head"]["out"]["kernel"]
            assert tree["point_encoder"]["first_0"]["kernel"]
            assert tree["encoder_norm"]["scale"]

    def test_grad_flow_masked(self, setup, keys):
        model, pts, variables = setup

        def loss_fn(params):
            logits = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                pts, train=True,
                rngs={"dropout": keys["dropout"], "fps": keys["fps"]},
                mutable=["batch_stats"],
            )[0]
            return jnp.mean(logits**2)

        grads = jax.grad(loss_fn)(variables["params"])
        gnorm = jnp.sqrt(
            sum(jnp.sum(g**2) for g in jax.tree.leaves(grads))
        )
        assert np.isfinite(float(gnorm)) and float(gnorm) > 0


class TestPix4Point:
    @pytest.fixture(scope="class")
    def setup(self):
        model = Pix4Point(num_classes=15, embed_dim=32, depth=2, num_heads=4, k_neighbors=4)
        pts = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 3))
        variables = model.init({"params": jax.random.PRNGKey(1)}, pts)
        return model, pts, variables

    def test_eval_forward(self, setup):
        model, pts, variables = setup
        logits = model.apply(variables, pts)
        assert logits.shape == (2, 15)
        assert np.isfinite(np.asarray(logits)).all()

    def test_token_count_is_quarter(self):
        # P3Embed's single stage reduces N → N/4 (pix4point.py:174), and the
        # global feature is concat(max, cls) → width 2·E.
        from pointvit_tpu.models import PointViT

        model = PointViT(embed_dim=32, depth=1, num_heads=4, k_neighbors=4)
        pts = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 3))
        feat, _ = model.init_with_output({"params": jax.random.PRNGKey(2)}, pts)
        assert feat.shape == (1, 64)  # 2 × embed_dim

    def test_from_pretrained_name(self):
        m = Pix4Point.from_pretrained_name(
            "vit_small_patch16_384.augreg_in21k_ft_in1k", num_classes=15
        )
        assert m.embed_dim == 384 and m.depth == 12 and m.num_heads == 6
        with pytest.raises(ValueError):
            Pix4Point.from_pretrained_name("not_a_model")

    def test_frozen_mask(self, setup):
        _, _, variables = setup
        params = variables["params"]
        mask = pix4point_trainable_mask(params, frozen=True)
        # trunk blocks + final norm frozen
        assert not mask["model"]["blocks_0"]["attn"]["qkv"]["kernel"]
        assert not mask["model"]["norm"]["scale"]
        # cls token/pos train even in frozen mode: the reference's
        # 'vit' in name freeze never matches the un-prefixed direct
        # registrations (reference pix4point.py:226-232)
        assert mask["model"]["cls_token"]
        assert mask["model"]["cls_pos"]
        # tokenizer / proj / pos-embed / head trainable
        assert mask["model"]["patch_embed"]["s0_conv1_0"]["kernel"]
        assert mask["model"]["proj"]["kernel"]
        assert mask["model"]["pos_embed"]["fc1"]["kernel"]
        assert mask["cls_head"]["out"]["kernel"]
        # unfrozen → everything trains
        all_mask = pix4point_trainable_mask(params, frozen=False)
        n, total = _count(all_mask)
        assert n == total

    def test_train_mode(self, setup, keys):
        model, pts, variables = setup
        logits, _ = model.apply(
            variables, pts, train=True,
            rngs={"dropout": keys["dropout"], "fps": keys["fps"]},
            mutable=["batch_stats"],
        )
        assert np.isfinite(np.asarray(logits)).all()


class TestRenderer:
    @pytest.fixture(scope="class", params=[False, True], ids=["fixed", "diff"])
    def setup(self, request):
        # Register a tiny ViT preset — the real vit_b_16 (depth 12) is too
        # slow to compile on the CPU test backend.
        from pointvit_tpu.models import renderer as rmod

        rmod.TORCHVISION_VIT_PRESETS["vit_test"] = dict(
            patch_size=8, embed_dim=32, depth=2, num_heads=4
        )
        model = PointCloudRendererClassifier(
            num_classes=15, vit_name="vit_test", adapter_dim=8, num_views=2,
            img_size=32, diff_renderer=request.param, view_transform_hidden=16,
        )
        pts = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 3)) * 0.4
        variables = model.init({"params": jax.random.PRNGKey(1)}, pts)
        return model, pts, variables

    def test_forward(self, setup):
        model, pts, variables = setup
        logits = model.apply(variables, pts)
        assert logits.shape == (2, 15)
        assert np.isfinite(np.asarray(logits)).all()

    def test_render_views_shape(self, setup):
        model, pts, variables = setup
        views = model.apply(variables, pts, method=model.render_views)
        assert views.shape == (2, 2, 32, 32)

    def test_trainable_mask(self, setup):
        model, _, variables = setup
        mask = renderer_trainable_mask(variables["params"])
        vit = mask["vit"]
        assert not vit["conv_proj"]["kernel"]
        assert not vit["encoder_layer_0"]["self_attention"]["qkv"]["kernel"]
        assert vit["encoder_layer_0"]["adapter1"]["down_proj"]["kernel"]
        assert mask["classifier"]["out"]["kernel"]
        assert mask["view_aggregation"]

    def test_predict_views_diff_only(self, setup):
        model, pts, variables = setup
        if model.diff_renderer:
            az, el = model.apply(variables, pts, method=model.predict_views)
            assert az.shape == (2, 2)
            assert np.all(np.abs(np.asarray(az)) <= 180 + 1e-3)
            assert np.all(np.abs(np.asarray(el)) <= 60 + 1e-3)
        else:
            with pytest.raises(ValueError):
                model.apply(variables, pts, method=model.predict_views)


def test_vtn_default_bias_reproduces_fixed_ring():
    # Zero-init weights → angles = tanh(default-ring bias)·range.
    model = ViewTransformationNetwork(num_views=3, hidden_dim=8)
    pts = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(1)}, pts)
    az, el = model.apply(variables, pts)
    expected_az = np.tanh(np.deg2rad([0, 120, 240])) * np.pi
    expected_el = np.tanh(np.deg2rad([0, 30, -30])) * np.pi / 3
    np.testing.assert_allclose(np.asarray(az)[0], expected_az, atol=1e-4)
    np.testing.assert_allclose(np.asarray(el)[0], expected_el, atol=1e-4)


class TestServingPreset:
    def test_slim_encoder_forward_and_shapes(self):
        from pointvit_tpu.models import apf_serving_preset

        preset = apf_serving_preset(dtype=jnp.float32)
        assert preset["encoder_second_width"] == 768
        model = AdaptPointFormer(
            num_classes=15, embedding_dim=64, npoint=16, nsample=8,
            in_channels=4, depth=2, num_heads=4, encoder_second_width=64,
        )
        pts = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 4))
        variables = model.init({"params": jax.random.PRNGKey(1)}, pts)
        enc = variables["params"]["point_encoder"]
        assert enc["second_0_local"]["kernel"].shape == (64, 64)
        assert enc["second_1"]["kernel"].shape == (64, 64)
        logits = model.apply(variables, pts)
        assert logits.shape == (2, 15)
        assert np.isfinite(np.asarray(logits)).all()

    def test_default_is_reference_exact(self):
        model = AdaptPointFormer(
            num_classes=15, embedding_dim=64, npoint=16, nsample=8,
            in_channels=4, depth=2, num_heads=4,
        )
        pts = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 4))
        variables = model.init({"params": jax.random.PRNGKey(1)}, pts)
        enc = variables["params"]["point_encoder"]
        assert enc["second_0_local"]["kernel"].shape == (64, 128)


class TestEncoderRemat:
    def test_remat_grads_match_plain(self):
        from pointvit_tpu.nn.pointnet import GroupFeatureEncoder

        g = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 4, 6))
        plain = GroupFeatureEncoder(embed_dim=32)
        remat = GroupFeatureEncoder(embed_dim=32, remat=True)
        v = plain.init(jax.random.PRNGKey(1), g, train=True)

        def loss(mod, p):
            out, _ = mod.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                g, train=True, mutable=["batch_stats"],
            )
            return jnp.sum(out ** 2)

        with jax.default_matmul_precision("highest"):
            out_p = plain.apply(v, g, train=False)
            out_r = remat.apply(v, g, train=False)
            g_p = jax.grad(lambda p: loss(plain, p))(v["params"])
            g_r = jax.grad(lambda p: loss(remat, p))(v["params"])
        np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_p), rtol=1e-6, atol=1e-6)
        for a, b in zip(jax.tree.leaves(g_r), jax.tree.leaves(g_p)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    def test_model_level_flag(self):
        model = AdaptPointFormer(
            num_classes=15, embedding_dim=64, npoint=16, nsample=8,
            in_channels=4, depth=2, num_heads=4, remat_encoder=True,
        )
        pts = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 4))
        variables = model.init({"params": jax.random.PRNGKey(1)}, pts)
        logits, _ = model.apply(
            variables, pts, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2), "fps": jax.random.PRNGKey(3)},
        )
        assert logits.shape == (2, 15)
