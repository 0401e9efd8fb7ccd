"""Hoisted frozen-tower training step (train/objectives.
flamingo_tower_precompute + make_train_step(precompute_fn=...)).

Under the encoder-freezing regimes the Whisper encoder and the AV-HuBERT
video tower are forward-only (reference whisper_flamingo_ft_ami.py:
506-517); hoisting their forward out of the grad-accumulation scan and
batching it over all micro-steps must be a pure program transformation:

* model identity: ``project_and_decode(t, *encode_towers(...))`` ==
  ``__call__`` logits exactly;
* one deterministic step via the hoisted path == the in-scan path
  (same loss, same updated params) with and without accumulation;
* train-mode hoisting (SpecAugment + AV-mode mixing drawn in the
  precompute) runs and the audio-only draw really zeroes the decoder's
  video stream.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import flax.linen as nn

from avsl_tpu.core.config import AVHuBERTConfig, WhisperConfig
from avsl_tpu.models import Whisper
from avsl_tpu.models.avhubert import AVHuBERTModel
from avsl_tpu.train import TrainState, make_train_step
from avsl_tpu.train.objectives import (
    flamingo_loss_fn,
    flamingo_tower_precompute,
)
from avsl_tpu.train.optim import whisper_flamingo_projection_optimizer


class Cfg:
    learning_rate = 1e-3
    warmup_steps = 2
    weight_decay = 0.01
    adam_epsilon = 1e-8
    add_gated_x_attn = 1
    video_projection_train_only = False
    freeze_video_model = True


@pytest.fixture(scope="module")
def setup():
    av_cfg = AVHuBERTConfig.tiny_test(
        dtype="float32", use_audio=False, modality_fuse="add", layerdrop=0.0
    )

    class VideoEncoder(nn.Module):
        @nn.compact
        def __call__(self, video, mask=None, deterministic=True,
                     use_running_average=None):
            return AVHuBERTModel(av_cfg, name="av_hubert")(
                video=video, padding_mask=mask, deterministic=deterministic,
                use_running_average=use_running_average,
            )

    w_cfg = WhisperConfig.tiny_test(
        add_gated_x_attn=1, video_state=av_cfg.hidden_size, dtype="float32"
    )
    model = Whisper(w_cfg, video_model=VideoEncoder())
    rng = np.random.default_rng(0)
    b = 4
    mel = jnp.asarray(rng.normal(size=(b, w_cfg.n_mels, 64)), jnp.float32)
    video = jnp.asarray(rng.normal(size=(b, 8, 24, 24, 1)), jnp.float32)
    dec = jnp.asarray(rng.integers(0, 200, (b, 5)), jnp.int32)
    labels = jnp.concatenate([dec[:, 1:], jnp.full((b, 1), 3)], axis=1)
    variables = model.init(jax.random.PRNGKey(0), mel, dec, video=video)
    batch = {"input_ids": mel, "dec_input_ids": dec, "labels": labels,
             "video": video}
    return w_cfg, model, variables, batch


def test_split_matches_joint_forward(setup):
    w_cfg, model, variables, batch = setup
    joint = model.apply(
        variables, batch["input_ids"], batch["dec_input_ids"],
        video=batch["video"], deterministic=True,
        freeze_video_bn_stats=True,
    )
    feats, v = model.apply(
        variables, batch["input_ids"], video=batch["video"],
        deterministic=True, freeze_video_bn_stats=True,
        method="encode_towers",
    )
    split = model.apply(
        variables, batch["dec_input_ids"], feats, video_feats=v,
        deterministic=True, method="project_and_decode",
    )
    np.testing.assert_allclose(
        np.asarray(split), np.asarray(joint), atol=1e-6
    )


def _steps(model, variables, train: bool, accum: int, split: bool = False):
    tx, _ = whisper_flamingo_projection_optimizer(
        variables["params"], Cfg(), 100
    )
    loss = flamingo_loss_fn(model, train=train, freeze_video_bn_stats=True)
    plain = make_train_step(
        loss, tx, grad_accum_steps=accum, donate=False
    )
    pre_fn = flamingo_tower_precompute(
        model, train=train, freeze_video_bn_stats=True
    )
    if split:
        _step, _pre = make_train_step(
            loss, tx, grad_accum_steps=accum, donate=False,
            precompute_fn=pre_fn, split_precompute=True,
        )
        hoisted = lambda s, b: _step(s, b, _pre(s, b))  # noqa: E731
    else:
        hoisted = make_train_step(
            loss, tx, grad_accum_steps=accum, donate=False,
            precompute_fn=pre_fn,
        )
    state = TrainState.create(
        variables["params"], tx, batch_stats=variables.get("batch_stats")
    )
    return plain, hoisted, state


@pytest.mark.parametrize("accum,split", [(1, False), (2, False), (2, True)])
def test_hoisted_step_matches_inscan_deterministic(setup, accum, split):
    w_cfg, model, variables, batch = setup
    plain, hoisted, state = _steps(
        model, variables, train=False, accum=accum, split=split
    )
    if accum > 1:
        batch = {
            k: v.reshape(accum, v.shape[0] // accum, *v.shape[1:])
            for k, v in batch.items()
        }
    sA, mA = plain(state, batch)
    sB, mB = hoisted(state, batch)
    assert float(mB["loss"]) == pytest.approx(float(mA["loss"]), rel=1e-5)
    for pa, pb in zip(
        jax.tree_util.tree_leaves(sA.params),
        jax.tree_util.tree_leaves(sB.params),
    ):
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), atol=2e-6
        )


def test_hoisted_train_mode_runs_and_updates_trainable_only(setup):
    w_cfg, model, variables, batch = setup
    tx, _ = whisper_flamingo_projection_optimizer(
        variables["params"], Cfg(), 100
    )
    loss = flamingo_loss_fn(
        model, train=True, freeze_video_bn_stats=True,
        spec_augment="ls-basic", prob_av=0.6, prob_a=0.3,
    )
    step = make_train_step(
        loss, tx, grad_accum_steps=2, donate=False,
        precompute_fn=flamingo_tower_precompute(
            model, train=True, freeze_video_bn_stats=True,
            spec_augment="ls-basic", prob_av=0.6, prob_a=0.3,
        ),
    )
    state = TrainState.create(
        variables["params"], tx, batch_stats=variables.get("batch_stats")
    )
    stacked = {
        k: v.reshape(2, v.shape[0] // 2, *v.shape[1:])
        for k, v in batch.items()
    }
    for _ in range(3):
        state, metrics = step(state, stacked)
        assert np.isfinite(float(metrics["loss"]))
    # towers frozen, x-attn gate moved
    e0 = variables["params"]["encoder"]["conv1"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(e0), np.asarray(state.params["encoder"]["conv1"]["kernel"])
    )
    g0 = variables["params"]["decoder"]["block_0"]["x_attn_gate"]
    g2 = state.params["decoder"]["block_0"]["x_attn_gate"]
    assert np.abs(np.asarray(g2) - np.asarray(g0)).max() > 0


def test_precompute_audio_only_draw_zeroes_video_scale(setup):
    """prob_a=1: every draw is audio-only -> video_scale must be all 0
    and the hoisted loss must equal the loss with a zeroed video stream."""
    w_cfg, model, variables, batch = setup
    pre = flamingo_tower_precompute(
        model, train=True, freeze_video_bn_stats=True,
        prob_av=0.0, prob_a=1.0,
    )
    stacked = {
        k: v.reshape(2, v.shape[0] // 2, *v.shape[1:])
        for k, v in batch.items()
    }
    ctx = pre(variables["params"], variables.get("batch_stats"), stacked,
              jax.random.PRNGKey(1))
    assert ctx["video_scale"].shape == (2,)
    np.testing.assert_array_equal(np.asarray(ctx["video_scale"]), 0.0)
    assert ctx["enc_features"].shape[:2] == (2, 2)
    assert ctx["video_feats"].shape[:2] == (2, 2)
