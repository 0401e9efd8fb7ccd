"""FSDP / ZeRO stage-3 parameter sharding (core/partitioning.py fsdp=).

The reference replicates the full model + Adam state on every GPU
(Lightning DDP — SURVEY.md §2.8); zero1 sharded only the mirrors. With
``fsdp=True`` the *parameters themselves* are stored sharded over the
``data`` mesh axis: XLA's SPMD partitioner all-gathers each weight at its
use site in forward/backward and — because the output state is pinned to
the same layout — reduce-scatters the gradients, i.e. the full FSDP
collective schedule from sharding annotations alone, no hand-written
gather/scatter.

Correctness anchors:
* params AND opt-state leaves above the size threshold pick up the data
  axis; sub-threshold leaves replicate;
* an fsdp train step produces the SAME params as the replicated step;
* per-device param shards are 1/dp of the full leaf (the memory win);
* composes with tensor parallelism (TP axes kept, data axis on a free
  dim);
* the TrainerRunner accepts ``fsdp=True`` end-to-end (step + eval).
"""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from avsl_tpu.core.mesh import make_mesh
from avsl_tpu.core.partitioning import shard_state, state_shardings
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


def test_fsdp_shards_params_and_opt_state(eight_devices, monkeypatch):
    import avsl_tpu.core.partitioning as part

    monkeypatch.setattr(part, "ZERO1_MIN_ELEMS", 1024)
    mesh = make_mesh(8, model_parallel=1, devices=eight_devices)
    _, params, tx, _, _ = _setup()
    state = TrainState.create(params, tx)
    sh = state_shardings(state, mesh, fsdp=True)

    # the big kernel: PARAM data-sharded on dim 0 (512 % 8 == 0) — the
    # distinction from zero1, where params stay replicated
    assert sh.params["fc_a"]["kernel"].spec == P("data", None)
    # its adam mirrors too
    assert sh.opt_state[0].mu["fc_a"]["kernel"].spec == P("data", None)
    assert sh.opt_state[0].nu["fc_a"]["kernel"].spec == P("data", None)
    # small bias (256 elems < patched 1024 threshold) replicates
    assert sh.params["fc_a"]["bias"].spec == P()
    assert sh.opt_state[0].mu["fc_a"]["bias"].spec == P()

    # the memory win is real: per-device param shard is 1/8 of the leaf
    st = shard_state(state, mesh, fsdp=True)
    leaf = st.params["fc_a"]["kernel"]
    assert leaf.sharding.spec == P("data", None)
    assert leaf.addressable_shards[0].data.shape == (512 // 8, 256)


def test_fsdp_step_matches_replicated(eight_devices, monkeypatch):
    import avsl_tpu.core.partitioning as part

    monkeypatch.setattr(part, "ZERO1_MIN_ELEMS", 1024)
    mesh = make_mesh(8, model_parallel=1, devices=eight_devices)
    _, params, tx, loss_fn, batch = _setup()

    # replicated baseline
    step_rep = make_train_step(loss_fn, tx, mesh=mesh, donate=False)
    st_rep = TrainState.create(params, tx)
    for _ in range(3):
        st_rep, m_rep = step_rep(st_rep, batch)

    # fsdp: param-sharded state in, layout pinned by the constraint fn
    constraint = lambda st: state_shardings(st, mesh, fsdp=True)  # noqa: E731
    step_f = make_train_step(
        loss_fn, tx, mesh=mesh, donate=False,
        partitioned_state=True, state_constraint_fn=constraint,
    )
    st_f = shard_state(TrainState.create(params, tx), mesh, fsdp=True)
    for _ in range(3):
        st_f, m_f = step_f(st_f, batch)

    assert float(m_f["loss"]) == pytest.approx(float(m_rep["loss"]), rel=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(st_rep.params),
        jax.tree_util.tree_leaves(st_f.params),
    ):
        # after 3 optimizer steps reduce-scatter vs all-reduce summation
        # order drifts a few ulp; 5e-4 still catches any real layout bug
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)
    # steady state kept the fsdp layout (no silent re-replication)
    out_spec = st_f.params["fc_a"]["kernel"].sharding.spec
    assert tuple(out_spec)[:1] == ("data",), out_spec


def test_fsdp_composes_with_tensor_parallel(eight_devices, monkeypatch):
    """TP rule axes survive; the data axis lands on a free dim of BOTH the
    TP-sharded kernel and its optimizer mirrors."""
    import avsl_tpu.core.partitioning as part

    monkeypatch.setattr(part, "ZERO1_MIN_ELEMS", 1024)
    mesh = make_mesh(8, model_parallel=2, devices=eight_devices)
    params = {"layer_0": {"mlp": {"fc1": {"kernel": jnp.zeros((256, 512))}}}}
    tx = optax.adamw(1e-2)
    state = TrainState.create(params, tx)
    sh = state_shardings(state, mesh, fsdp=True)
    assert sh.params["layer_0"]["mlp"]["fc1"]["kernel"].spec == P("data", "model")
    mu = sh.opt_state[0].mu["layer_0"]["mlp"]["fc1"]["kernel"].spec
    assert mu == P("data", "model"), mu


def test_runner_fsdp_end_to_end(eight_devices, monkeypatch, tmp_path):
    """TrainerRunner(fsdp=True): the step runs, params stay data-sharded,
    and losses track the replicated runner on the same synthetic batches."""
    import avsl_tpu.core.partitioning as part

    monkeypatch.setattr(part, "ZERO1_MIN_ELEMS", 1024)
    from avsl_tpu.train.runner import TrainerRunner

    mesh = make_mesh(8, model_parallel=1, devices=eight_devices)
    _, params, tx, loss_fn, batch = _setup()

    class _Cfg:
        gradient_accumulation_steps = 1
        validate_every = 10 ** 9
        num_train_steps = 2

    def eval_logits(p, b):
        return jnp.zeros((1, 1, 4))

    def make(fsdp):
        return TrainerRunner(
            loss_fn, eval_logits, tx, TrainState.create(params, tx),
            tokenizer=None, cfg=_Cfg(), mesh=mesh,
            log_dir=str(tmp_path / f"log{fsdp}"),
            ckpt_dir=str(tmp_path / f"ckpt{fsdp}"),
            fsdp=fsdp,
        )

    r_rep, r_f = make(False), make(True)
    assert r_f.fsdp and r_f.partitioned
    for _ in range(2):
        r_rep.state, m_rep = r_rep.train_step(r_rep.state, batch)
        r_f.state, m_f = r_f.train_step(r_f.state, batch)
    assert float(m_f["loss"]) == pytest.approx(float(m_rep["loss"]), rel=1e-5)
    spec = r_f.state.params["fc_a"]["kernel"].sharding.spec
    assert tuple(spec)[:1] == ("data",), spec
