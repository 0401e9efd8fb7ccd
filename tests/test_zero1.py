"""ZeRO stage-1 optimizer-state sharding (core/partitioning.py zero1=).

The reference replicates the full fp32 Adam state on every GPU (Lightning
DDP — SURVEY.md §2.8); zero1=True shards the mu/nu mirrors over the data
mesh axis while params stay replicated. XLA partitions the elementwise
Adam update from the sharding annotations alone and all-gathers the
param-sized update once per step — no hand-written collectives.

Correctness anchors:
* opt-state leaves (and ONLY those) pick up the data axis; params and
  sub-threshold leaves replicate;
* a zero1 train step produces the SAME params as the replicated step;
* per-device opt-state shards are 1/dp of the full leaf (the memory win);
* composes with tensor parallelism (TP axes kept, data axis added on a
  free dim).
"""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from avsl_tpu.core.mesh import make_mesh
from avsl_tpu.core.partitioning import (
    DEFAULT_RULES,
    _add_data_axis,
    shard_state,
    state_shardings,
)
from avsl_tpu.train.loop import TrainState, make_train_step


class _Net(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Dense(256, name="fc_a")(x)
        x = nn.gelu(x)
        return nn.Dense(8, name="head")(x)


def _setup(seed=0):
    model = _Net()
    x = jnp.asarray(np.random.default_rng(seed).normal(size=(16, 512)), jnp.float32)
    y = jnp.asarray(np.random.default_rng(seed + 1).normal(size=(16, 8)), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), x)["params"]
    tx = optax.adamw(1e-2)

    def loss_fn(p, stats, batch, rng):
        pred = model.apply({"params": p}, batch["x"])
        return jnp.mean((pred - batch["y"]) ** 2), ({}, stats)

    return model, params, tx, loss_fn, {"x": x, "y": y}


def test_add_data_axis_spec_composition():
    mesh = make_mesh(8, model_parallel=2)
    # free dim 0 divisible by dp=4
    assert _add_data_axis(P(None, "model"), (512, 64), mesh) == P("data", "model")
    # dim 0 taken by TP -> falls to dim 1
    assert _add_data_axis(P("model", None), (64, 512), mesh) == P("model", "data")
    # nothing divisible -> unchanged
    assert _add_data_axis(P(), (7, 9), mesh) == P()


def test_zero1_shards_only_opt_state(eight_devices, monkeypatch):
    import avsl_tpu.core.partitioning as part

    monkeypatch.setattr(part, "ZERO1_MIN_ELEMS", 1024)
    mesh = make_mesh(8, model_parallel=1, devices=eight_devices)
    _, params, tx, _, _ = _setup()
    state = TrainState.create(params, tx)
    sh = state_shardings(state, mesh, zero1=True)

    def spec_of(tree, *path):
        node = tree
        for k in path:
            node = getattr(node, k) if isinstance(k, str) and hasattr(node, k) else node[k]
        return node.spec

    # params replicated
    assert spec_of(sh.params, "fc_a", "kernel") == P()
    # adam mu/nu for the big kernel: data-sharded on dim 0 (512 % 8 == 0)
    mu = sh.opt_state[0].mu["fc_a"]["kernel"].spec
    nu = sh.opt_state[0].nu["fc_a"]["kernel"].spec
    assert mu == P("data", None) and nu == P("data", None), (mu, nu)
    # small bias (256 elems < patched threshold? 256 < 1024) replicates
    assert sh.opt_state[0].mu["fc_a"]["bias"].spec == P()

    # the memory win is real: per-device shard is 1/8 of the leaf
    st = shard_state(state, mesh, zero1=True)
    leaf = st.opt_state[0].mu["fc_a"]["kernel"]
    assert leaf.sharding.spec == P("data", None)
    assert leaf.addressable_shards[0].data.shape == (512 // 8, 256)


def test_zero1_step_matches_replicated(eight_devices, monkeypatch):
    import avsl_tpu.core.partitioning as part

    monkeypatch.setattr(part, "ZERO1_MIN_ELEMS", 1024)
    mesh = make_mesh(8, model_parallel=1, devices=eight_devices)
    _, params, tx, loss_fn, batch = _setup()

    # replicated baseline
    step_rep = make_train_step(loss_fn, tx, mesh=mesh, donate=False)
    st_rep = TrainState.create(params, tx)
    for _ in range(3):
        st_rep, m_rep = step_rep(st_rep, batch)

    # zero1: sharded opt-state in, layout pinned by the constraint fn
    constraint = lambda st: state_shardings(st, mesh, zero1=True)  # noqa: E731
    step_z1 = make_train_step(
        loss_fn, tx, mesh=mesh, donate=False,
        partitioned_state=True, state_constraint_fn=constraint,
    )
    st_z1 = shard_state(TrainState.create(params, tx), mesh, zero1=True)
    for _ in range(3):
        st_z1, m_z1 = step_z1(st_z1, batch)

    assert float(m_z1["loss"]) == pytest.approx(float(m_rep["loss"]), rel=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(st_rep.params),
        jax.tree_util.tree_leaves(st_z1.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # steady state kept the zero1 layout (no silent re-replication);
    # XLA may normalize away the trailing None
    out_spec = st_z1.opt_state[0].mu["fc_a"]["kernel"].sharding.spec
    assert tuple(out_spec)[:1] == ("data",), out_spec
    # params stayed replicated
    assert st_z1.params["fc_a"]["kernel"].sharding.spec in (P(), P(None, None))


def test_zero1_composes_with_tensor_parallel(eight_devices, monkeypatch):
    """TP rule axes survive; the data axis lands on a free dim of the
    optimizer mirrors of a TP-sharded kernel."""
    import avsl_tpu.core.partitioning as part

    monkeypatch.setattr(part, "ZERO1_MIN_ELEMS", 1024)
    mesh = make_mesh(8, model_parallel=2, devices=eight_devices)
    # a param whose path matches the Megatron column rule
    params = {"layer_0": {"mlp": {"fc1": {"kernel": jnp.zeros((256, 512))}}}}
    tx = optax.adamw(1e-2)
    state = TrainState.create(params, tx)
    sh = state_shardings(state, mesh, zero1=True)
    assert sh.params["layer_0"]["mlp"]["fc1"]["kernel"].spec == P(None, "model")
    mu = sh.opt_state[0].mu["layer_0"]["mlp"]["fc1"]["kernel"].spec
    assert mu == P("data", "model"), mu
