"""MoE model layer: MoEMlp / MoEViTBlock over the expert-parallel core.

Pins that the flax surface (nn/moe.py) matches its own dense math under a
mesh, that a full training step over a (data × expert) mesh runs and
learns, and that the sown aux loss is collectable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from pointvit_tpu.nn.moe import MoEMlp, MoEViTBlock, collect_moe_aux_loss

pytestmark = pytest.mark.usefixtures("highest_precision")


@pytest.fixture
def highest_precision():
    with jax.default_matmul_precision("highest"):
        yield


B, S, M, E = 8, 6, 16, 4
NODROP = float(E)


def _mesh(shape, names):
    n = int(np.prod(shape))
    return Mesh(np.asarray(jax.devices()[:n]).reshape(shape), names)


def test_moe_mlp_mesh_matches_dense():
    x = jax.random.normal(jax.random.PRNGKey(0), (B, S, M))
    dense = MoEMlp(E, 32, capacity_factor=NODROP)
    variables = dense.init(jax.random.PRNGKey(1), x)
    ref = dense.apply(variables, x)
    ep = MoEMlp(E, 32, capacity_factor=NODROP, mesh=_mesh((4,), ("expert",)))
    out = ep.apply(variables, x)  # same params, same routing, EP placement
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_moe_vit_block_train_step_on_mesh():
    mesh = _mesh((2, 4), ("data", "expert"))
    block = MoEViTBlock(
        num_heads=4,
        num_experts=E,
        mesh=mesh,
        data_axis="data",
        implementation="xla",
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (B, S, M))
    pos = jax.random.normal(jax.random.PRNGKey(1), (B, S, M)) * 0.02
    target = jax.random.normal(jax.random.PRNGKey(2), (B, S, M))
    variables = block.init(jax.random.PRNGKey(3), x)
    params = variables["params"]
    tx = optax.adamw(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out, inter = block.apply(
                {"params": p}, x, pos=pos, mutable=["intermediates"]
            )
            aux = collect_moe_aux_loss(inter)
            return jnp.mean((out - target) ** 2) + 0.01 * aux, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    losses = []
    for _ in range(5):
        params, opt_state, loss, aux = step(params, opt_state)
        losses.append(float(loss))
        assert np.isfinite(losses[-1])
        assert float(aux) > 0
    assert losses[-1] < losses[0]  # the EP step actually learns


def test_moe_vit_block_matches_dense_block():
    # Same params: the block under an expert mesh == the block on one device.
    x = jax.random.normal(jax.random.PRNGKey(4), (B, S, M))
    kwargs = dict(
        num_heads=4, num_experts=E, capacity_factor=NODROP, implementation="xla"
    )
    dense = MoEViTBlock(**kwargs)
    variables = dense.init(jax.random.PRNGKey(5), x)
    ref = dense.apply(variables, x)
    ep = MoEViTBlock(**kwargs, mesh=_mesh((4,), ("expert",)))
    out = ep.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_collect_moe_aux_loss_empty_is_zero():
    assert float(collect_moe_aux_loss({})) == 0.0


def test_pix4point_trainer_applies_moe_aux(tmp_path):
    # The generic trainer must fold the sown router aux losses into the
    # training loss (train_config "moe_aux_weight") — two trainers differing
    # only in that weight see different losses on the identical batch/state.
    from pointvit_tpu.data.synthetic import write_scanobjectnn_h5
    from pointvit_tpu.train import Pix4PointTrainer

    root = str(tmp_path / "sonn")
    write_scanobjectnn_h5(root, num_train=16, num_test=8, num_points=64, num_classes=15)
    model_config = {
        "model_name": "Pix4Point", "num_classes": 15,
        "pretrained_model": "vit_small_patch16_384", "pretrained": False,
        "frozen": False, "k_neighbors": 4, "embed_dim": 32,
        "depth": 2, "num_heads": 4, "bf16": False,
        "moe_experts": 2, "moe_every": 2,  # block 1 is MoE
    }
    dataset_config = {
        "root_dir": root, "variant": "main_split", "augmentation": "base",
        "num_points": 64, "normalize": True, "sampling_method": "all",
        "use_custom_augmentation": True,
    }
    train_config = {
        "batch_size": 8, "learning_rate": 5e-4, "weight_decay": 5e-2,
        "save_interval": 10, "epochs": 1, "t_max": 1, "warmup_epochs": 1,
        "min_lr": 1e-6, "grad_norm_clip": 10,
    }

    def step_loss(aux_weight, out):
        trainer = Pix4PointTrainer(
            model_config, dataset_config,
            {**train_config, "moe_aux_weight": aux_weight}, output_dir=out,
        )
        assert trainer.model.moe_experts == 2  # factory passthrough
        state = trainer._init_state(0)
        pts = jax.random.normal(jax.random.PRNGKey(7), (8, 64, 3))
        labels = jnp.arange(8, dtype=jnp.int32) % 15
        _, loss, _, _ = trainer._train_step(
            state, pts, labels, jax.random.PRNGKey(8)
        )
        return float(loss)

    l0 = step_loss(0.0, str(tmp_path / "o0"))
    l1 = step_loss(100.0, str(tmp_path / "o1"))
    assert np.isfinite(l0) and np.isfinite(l1)
    # aux ≈ 1 at init (near-uniform router): weight 100 dominates the CE.
    assert l1 > l0 + 1.0


def test_moe_pix4point_trains_on_mesh():
    # The full model family with an MoE trunk: one fwd+bwd train step over a
    # (data × expert) mesh, aux losses sown by every MoE block and collected.
    from pointvit_tpu.models import Pix4Point

    mesh = _mesh((2, 4), ("data", "expert"))
    model = Pix4Point(
        num_classes=5,
        embed_dim=32,
        depth=4,
        num_heads=4,
        k_neighbors=8,
        implementation="xla",
        moe_experts=4,
        moe_every=2,
        moe_mesh=mesh,
        moe_data_axis="data",
    )
    pts = jax.random.normal(jax.random.PRNGKey(0), (8, 64, 3))
    labels = jnp.arange(8) % 5
    variables = model.init({"params": jax.random.PRNGKey(1)}, pts[:1])
    # blocks 1 and 3 are MoE (moe_every=2), blocks 0 and 2 dense
    blocks = variables["params"]["model"]
    assert "gate" in blocks["blocks_1"]["mlp"]
    assert "fc1" in blocks["blocks_0"]["mlp"]
    batch_stats = variables["batch_stats"]

    @jax.jit
    def loss_fn(p):
        logits, updated = model.apply(
            {"params": p, "batch_stats": batch_stats},
            pts, train=True, mutable=["intermediates", "batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        aux = collect_moe_aux_loss(updated["intermediates"])
        ce = -jnp.mean(
            jax.nn.log_softmax(logits)[jnp.arange(8), labels]
        )
        return ce + 0.01 * aux, aux

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(loss)) and float(aux) > 0
    gate_grad = grads["model"]["blocks_1"]["mlp"]["gate"]
    assert float(jnp.max(jnp.abs(gate_grad))) > 0
