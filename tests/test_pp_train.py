"""Pipeline-parallel TRAINING (train/pp.py): optimizer-stepped pp.

Locks three claims beyond the schedule-correctness tests in
test_pipeline.py:

* the flagship Whisper encoder forward with a pipelined block stack is
  numerically identical to ``WhisperEncoder.apply`` (so the mirrored conv
  stem in ``whisper_encoder_pp_forward`` cannot drift from the module);
* a FULL train step (value_and_grad + adam update) through
  ``pipeline_apply`` with stage-sharded params/opt-state produces exactly
  the same updated parameters as the unpipelined step — pp is a usable
  training path, not a forward-only demo;
* ``shard_pp_state`` actually lands the blocks (and their adam mirrors)
  stage-sharded on the mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from avsl_tpu.core.config import WhisperConfig
from avsl_tpu.core.pipeline import STAGE_AXIS, make_pp_mesh, stack_block_params
from avsl_tpu.models.layers import TransformerBlock
from avsl_tpu.models.whisper import WhisperEncoder
from avsl_tpu.train.loop import TrainState, make_train_step
from avsl_tpu.train.pp import (
    shard_pp_state,
    split_whisper_encoder_params,
    whisper_encoder_pp_forward,
)

L, D, H, FF, T, V = 4, 16, 2, 32, 6, 11


def test_encoder_pp_matches_module(eight_devices):
    cfg = WhisperConfig(
        name="test", n_mels=8, n_audio_ctx=32, n_audio_state=D,
        n_audio_head=H, n_audio_layer=L, dtype="float32",
    )
    enc = WhisperEncoder(cfg)
    mel = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, cfg.n_mels, 2 * T)), jnp.float32
    )
    params = enc.init(jax.random.PRNGKey(0), mel)["params"]
    want = enc.apply({"params": params}, mel)

    stacked, stem = split_whisper_encoder_params(params, L)
    assert set(stem) == {"conv1", "conv2", "ln_post"}
    mesh = make_pp_mesh(2, stages=2, devices=eight_devices)
    got = whisper_encoder_pp_forward(
        cfg, stem, stacked, mel, mesh=mesh, n_microbatches=2
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def _sandwich(key):
    """Tiny trainable sandwich: embed -> L blocks -> mean-pool head."""
    ke, kb, kh = jax.random.split(key, 3)
    import flax.linen as nn

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(L):
                x, _ = TransformerBlock(
                    d_model=D, n_heads=H, d_ff=FF,
                    dtype=jnp.float32, param_dtype=jnp.float32,
                    name=f"block_{i}",
                )(x)
            return x

    stack = Stack()
    block_params = stack.init(kb, jnp.zeros((1, T, D), jnp.float32))["params"]
    stacked, _ = stack_block_params(block_params, L)
    params = {
        "embed": jax.random.normal(ke, (V, D), jnp.float32) * 0.1,
        "blocks": stacked,
        "head": jax.random.normal(kh, (D, V), jnp.float32) * 0.1,
    }
    return params, stack, block_params


_block = TransformerBlock(
    d_model=D, n_heads=H, d_ff=FF, dtype=jnp.float32, param_dtype=jnp.float32
)


def _block_fn(lp, h, _extras):
    out, _ = _block.apply({"params": lp}, h)
    return out


def _logits_seq(params, stack, block_params, tokens):
    h = params["embed"][tokens]
    h = stack.apply({"params": block_params}, h)
    return jnp.mean(h, axis=1) @ params["head"]


def _make_batch(rng):
    tokens = rng.integers(0, V, size=(8, T))
    labels = rng.integers(0, V, size=(8,))
    return {"tokens": jnp.asarray(tokens), "labels": jnp.asarray(labels)}


def _ce(logits, labels):
    return jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    )


def test_pp_train_step_matches_unpipelined(eight_devices):
    from avsl_tpu.core.pipeline import pipeline_apply

    params, stack, block_params = _sandwich(jax.random.PRNGKey(0))
    mesh = make_pp_mesh(4, stages=2, devices=eight_devices)
    tx = optax.adam(1e-2)

    def pp_loss(p, _stats, batch, _rng):
        h = p["embed"][batch["tokens"]]
        h = pipeline_apply(_block_fn, p["blocks"], h, mesh=mesh, n_microbatches=2)
        logits = jnp.mean(h, axis=1) @ p["head"]
        return _ce(logits, batch["labels"]), ({}, None)

    def seq_loss(p, _stats, batch, _rng):
        from avsl_tpu.core.pipeline import unstack_block_params

        bp = unstack_block_params(p["blocks"], L)
        logits = _logits_seq(p, stack, bp, batch["tokens"])
        return _ce(logits, batch["labels"]), ({}, None)

    batch = _make_batch(np.random.default_rng(1))

    # donate=False: both states alias the same `params` buffers, and the
    # parity comparison needs both of them alive after the steps
    pp_state = shard_pp_state(TrainState.create(params, tx), mesh)
    pp_step = make_train_step(
        pp_loss, tx, mesh=mesh, partitioned_state=True, donate=False
    )
    pp_state2, pp_metrics = pp_step(pp_state, batch)

    seq_state = TrainState.create(params, tx)
    seq_step = make_train_step(seq_loss, tx, donate=False)
    seq_state2, seq_metrics = seq_step(seq_state, batch)

    np.testing.assert_allclose(
        float(pp_metrics["loss"]), float(seq_metrics["loss"]), rtol=1e-5
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        pp_state2.params,
        seq_state2.params,
    )


def test_shard_pp_state_places_blocks_on_stage(eight_devices):
    params, _, _ = _sandwich(jax.random.PRNGKey(2))
    mesh = make_pp_mesh(4, stages=2, devices=eight_devices)
    state = shard_pp_state(TrainState.create(params, optax.adam(1e-2)), mesh)

    def spec_of(x):
        return x.sharding.spec if hasattr(x.sharding, "spec") else None

    # params: blocks stage-sharded on the layer axis, others replicated
    for leaf in jax.tree_util.tree_leaves(state.params["blocks"]):
        assert spec_of(leaf)[0] == STAGE_AXIS
    assert state.params["embed"].sharding.is_fully_replicated
    # adam mirrors (mu/nu) follow the same placement
    mu = state.opt_state[0].mu
    for leaf in jax.tree_util.tree_leaves(mu["blocks"]):
        assert spec_of(leaf)[0] == STAGE_AXIS
    assert mu["embed"].sharding.is_fully_replicated


def test_pp_training_learns(eight_devices):
    """5 adam steps through the pipelined stack reduce the loss."""
    from avsl_tpu.core.pipeline import pipeline_apply

    params, _, _ = _sandwich(jax.random.PRNGKey(3))
    mesh = make_pp_mesh(4, stages=2, devices=eight_devices)
    tx = optax.adam(3e-2)

    def pp_loss(p, _stats, batch, _rng):
        h = p["embed"][batch["tokens"]]
        h = pipeline_apply(_block_fn, p["blocks"], h, mesh=mesh, n_microbatches=2)
        logits = jnp.mean(h, axis=1) @ p["head"]
        return _ce(logits, batch["labels"]), ({}, None)

    step = make_train_step(pp_loss, tx, mesh=mesh, partitioned_state=True)
    state = shard_pp_state(TrainState.create(params, tx), mesh)
    batch = _make_batch(np.random.default_rng(4))
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses
