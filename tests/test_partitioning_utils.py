"""Tensor-parallel partitioning rules + L0 utils tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from avsl_tpu.core.mesh import make_mesh
from avsl_tpu.core.partitioning import (
    describe_shardings,
    shard_state,
    spec_for,
    state_shardings,
)
from avsl_tpu.utils import (
    check_writable,
    disk_usage_report,
    ensure_dir,
    estimate_model_memory,
    get_memory_stats,
    memory_aware_batch_size,
)


def test_spec_rules(eight_devices):
    mesh = make_mesh(8, model_parallel=2)
    assert spec_for("decoder/block_0/mlp/fc1/kernel", (64, 128), mesh) == P(None, "model")
    assert spec_for("decoder/block_0/mlp/fc2/kernel", (128, 64), mesh) == P("model", None)
    assert spec_for("encoder/block_1/self_attn/q_proj/kernel", (64, 64), mesh) == P(None, "model")
    assert spec_for("encoder/block_1/self_attn/out_proj/kernel", (64, 64), mesh) == P("model", None)
    assert spec_for("decoder/token_embedding/embedding", (256, 64), mesh) == P("model", None)
    # no rule -> replicated
    assert spec_for("encoder/conv1/kernel", (3, 80, 64), mesh) == P()
    # non-divisible dim -> fallback to replicated
    assert spec_for("x/mlp/fc1/kernel", (64, 65), mesh) == P()
    # model axis of size 1 -> everything replicated
    mesh1 = make_mesh(8, model_parallel=1)
    assert spec_for("x/mlp/fc1/kernel", (64, 128), mesh1) == P()


def test_tp_matches_dp_loss(eight_devices):
    """The flagship numerical check: a tensor-parallel train step computes
    the same loss as the replicated one."""
    from avsl_tpu.core.config import WhisperConfig
    from avsl_tpu.models import Whisper
    from avsl_tpu.train.loop import TrainState, make_train_step
    from avsl_tpu.train.objectives import flamingo_loss_fn
    import optax

    cfg = WhisperConfig.tiny_test(dtype="float32")
    model = Whisper(cfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(8, 80, 64)), jnp.float32)
    dec = jnp.asarray(rng.integers(0, 200, (8, 6)))
    labels = jnp.concatenate([dec[:, 1:], jnp.full((8, 1), 3)], axis=1)
    batch = {"input_ids": mel, "dec_input_ids": dec, "labels": labels}
    variables = model.init(jax.random.PRNGKey(0), mel, dec)
    tx = optax.adam(1e-3)
    loss_fn = flamingo_loss_fn(model, train=False)

    mesh_dp = make_mesh(8, model_parallel=1)
    step_dp = make_train_step(loss_fn, tx, mesh=mesh_dp, donate=False)
    _, m_dp = step_dp(TrainState.create(variables["params"], tx), batch)

    mesh_tp = make_mesh(8, model_parallel=2)
    step_tp = make_train_step(
        loss_fn, tx, mesh=mesh_tp, donate=False, partitioned_state=True
    )
    state_tp = shard_state(TrainState.create(variables["params"], tx), mesh_tp)
    assert len(describe_shardings(state_tp.params, mesh_tp)) > 0
    _, m_tp = step_tp(state_tp, batch)

    assert float(m_tp["loss"]) == pytest.approx(float(m_dp["loss"]), rel=1e-5)


def test_state_shardings_cover_optimizer_mirrors(eight_devices):
    import optax

    from avsl_tpu.train.loop import TrainState

    mesh = make_mesh(8, model_parallel=2)
    params = {"block": {"mlp": {"fc1": {"kernel": jnp.zeros((32, 64))}}}}
    state = TrainState.create(params, optax.adam(1e-3))
    sh = state_shardings(state, mesh)
    # adam mu mirror gets the same column-parallel spec
    mu_spec = sh.opt_state[0].mu["block"]["mlp"]["fc1"]["kernel"].spec
    assert mu_spec == P(None, "model")
    assert sh.step.spec == P()


def test_paths_utils(tmp_path):
    d = ensure_dir(str(tmp_path / "a" / "b"))
    assert os.path.isdir(d)
    assert check_writable(d)
    assert not check_writable("/proc/definitely_not_writable_dir_xyz")
    rep = disk_usage_report(str(tmp_path))
    assert rep["total_gb"] > 0 and 0 <= rep["used_pct"] <= 100


def test_memory_utils():
    stats = get_memory_stats()
    assert isinstance(stats, dict)
    est = estimate_model_memory({"w": jnp.zeros((1000, 1000))})
    assert est["n_params"] == 1_000_000
    assert est["total_gb_est"] > est["params_gb"]
    # no limit info on CPU backend -> returns requested
    assert memory_aware_batch_size(16, per_item_gb=0.001) >= 1


def test_sequence_parallel_encoder_matches_replicated(eight_devices):
    """Sequence-parallel activation sharding (batch on data, time on
    model between encoder blocks) must be numerically identical to the
    replicated run — XLA inserts the attention all-gathers; SP only
    changes layout."""
    import optax

    from avsl_tpu.core.config import WhisperConfig
    from avsl_tpu.core.mesh import activation_sharding_scope
    from avsl_tpu.models import Whisper
    from avsl_tpu.train.loop import TrainState, make_train_step
    from avsl_tpu.train.objectives import flamingo_loss_fn

    cfg = WhisperConfig.tiny_test(dtype="float32")
    model = Whisper(cfg)
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.normal(size=(8, 80, 64)), jnp.float32)  # T_enc=32 = 4*model(2)*...
    dec = jnp.asarray(rng.integers(0, 200, (8, 6)))
    variables = model.init(jax.random.PRNGKey(0), mel, dec)

    want, _ = jax.jit(
        lambda v, m: model.apply(v, m, method=model.encode)
    )(variables, mel)

    mesh = make_mesh(8, model_parallel=2)
    with activation_sharding_scope(mesh):
        enc_sp = jax.jit(lambda v, m: model.apply(v, m, method=model.encode))
        got, _ = enc_sp(variables, mel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    # and through a full train step: loss unchanged
    labels = jnp.concatenate([dec[:, 1:], jnp.full((8, 1), 3)], axis=1)
    batch = {"input_ids": mel, "dec_input_ids": dec, "labels": labels}
    tx = optax.adam(1e-3)
    loss_fn = flamingo_loss_fn(model, train=False)
    step_plain = make_train_step(loss_fn, tx, mesh=mesh, donate=False)
    _, m_plain = step_plain(TrainState.create(variables["params"], tx), batch)
    with activation_sharding_scope(mesh):
        step_sp = make_train_step(loss_fn, tx, mesh=mesh, donate=False)
        _, m_sp = step_sp(TrainState.create(variables["params"], tx), batch)
    assert float(m_sp["loss"]) == pytest.approx(float(m_plain["loss"]), rel=1e-5)


def test_shard_batch_tolerates_scalars_and_partial_batches():
    """Batches may carry scalar fields (epoch markers) and a final
    partial batch whose dim 0 does not divide the data axis — both must
    replicate instead of raising in the prefetch hot path."""
    import numpy as np

    from avsl_tpu.core.mesh import make_mesh, shard_batch

    mesh = make_mesh(8, model_parallel=2)  # data axis = 4
    batch = {
        "x": np.ones((8, 3), np.float32),   # divisible: data-sharded
        "tail": np.ones((5, 3), np.float32),  # 5 % 4 != 0: replicated
        "epoch": np.float32(2.0),             # scalar: replicated
    }
    out = shard_batch(mesh, batch)
    assert out["x"].shape == (8, 3)
    assert out["tail"].shape == (5, 3)
    assert float(out["epoch"]) == 2.0
    assert not out["x"].sharding.is_fully_replicated
    assert out["tail"].sharding.is_fully_replicated
    assert out["epoch"].sharding.is_fully_replicated
