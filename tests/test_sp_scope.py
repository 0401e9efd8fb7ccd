"""Sequence parallelism is part of the step function (VERDICT r3 item 8).

The round-2/3 hazard: the activation-sharding scope was trace-time
global state and NOT part of the jit cache key — a step first traced
outside the scope silently cached a constraint-free program.
make_train_step/make_eval_step now enter the scope INSIDE the traced
body, so the compiled program carries the sequence-parallel constraints
no matter where the first call happens.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from avsl_tpu.core.config import AVHuBERTConfig
from avsl_tpu.core.mesh import make_mesh
from avsl_tpu.models.avhubert import AVHuBERTForSpeech2Text
from avsl_tpu.train import TrainState, make_train_step
from avsl_tpu.train.loop import make_eval_step
from avsl_tpu.train.objectives import avhubert_seq2seq_loss_fn


def _setup():
    cfg = AVHuBERTConfig.tiny_test(dtype="float32", vocab_size=64)
    model = AVHuBERTForSpeech2Text(cfg)
    rng = np.random.default_rng(0)
    b = 8
    audio = jnp.asarray(rng.normal(size=(b, 16, 104)), jnp.float32)
    video = jnp.asarray(rng.normal(size=(b, 16, 24, 24, 1)), jnp.float32)
    dec = jnp.asarray(rng.integers(4, 60, (b, 6)), jnp.int32)
    labels = jnp.concatenate(
        [dec[:, 1:], jnp.full((b, 1), cfg.eos_token_id)], axis=-1
    )
    batch = {"audio": audio, "video": video, "dec_input_ids": dec,
             "labels": labels}
    variables = model.init(
        jax.random.PRNGKey(0), audio=audio, video=video,
        decoder_input_ids=dec,
    )
    loss_fn = avhubert_seq2seq_loss_fn(model, train=False)
    return variables, loss_fn, batch


def _n_sharding_ops(lowered) -> int:
    # Shardy lowers with_sharding_constraint to sdy.sharding_constraint
    txt = lowered.as_text()
    return txt.count("sharding_constraint") + txt.count("@Sharding")


def test_train_step_carries_sp_without_caller_scope():
    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual multi-device mesh")
    variables, loss_fn, batch = _setup()
    mesh = make_mesh(len(jax.devices()), model_parallel=2)
    tx = optax.sgd(1e-3)
    state = TrainState.create(
        variables["params"], tx, batch_stats=variables.get("batch_stats")
    )

    def lower(sequence_parallel):
        step = make_train_step(
            loss_fn, tx, mesh=mesh, donate=False, partitioned_state=True,
            sequence_parallel=sequence_parallel,
        )
        return step.lower(state, batch)

    # NO caller scope anywhere in this test — the step itself must emit
    # the activation sharding constraints
    n_auto = _n_sharding_ops(lower(None))  # auto: model axis 2 -> on
    n_off = _n_sharding_ops(lower(False))
    assert n_auto > n_off, (
        f"auto SP emitted no extra sharding constraints "
        f"({n_auto} vs {n_off})"
    )

    # and the step still runs to a finite loss
    step = make_train_step(
        loss_fn, tx, mesh=mesh, donate=False, partitioned_state=True
    )
    _, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_sp_on_off_losses_match():
    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual multi-device mesh")
    variables, loss_fn, batch = _setup()
    mesh = make_mesh(len(jax.devices()), model_parallel=2)
    tx = optax.sgd(1e-3)
    state = TrainState.create(
        variables["params"], tx, batch_stats=variables.get("batch_stats")
    )
    losses = {}
    for sp in (True, False):
        step = make_train_step(
            loss_fn, tx, mesh=mesh, donate=False, partitioned_state=True,
            sequence_parallel=sp,
        )
        _, m = step(state, batch)
        losses[sp] = float(m["loss"])
    assert losses[True] == pytest.approx(losses[False], rel=2e-4)


def test_eval_step_carries_sp():
    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual multi-device mesh")
    variables, loss_fn, batch = _setup()
    mesh = make_mesh(len(jax.devices()), model_parallel=2)
    tx = optax.sgd(1e-3)
    state = TrainState.create(
        variables["params"], tx, batch_stats=variables.get("batch_stats")
    )
    ev = make_eval_step(loss_fn, mesh=mesh, partitioned_state=True)
    m = ev(state, batch)
    assert np.isfinite(float(m["loss"]))
