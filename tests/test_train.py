"""Training-layer tests: SPMD train step on the 8-device CPU mesh,
optimizer freeze regimes, grad accumulation, checkpoint roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avsl_tpu.core.config import WhisperConfig
from avsl_tpu.core.mesh import make_mesh
from avsl_tpu.models import Whisper
from avsl_tpu.train import TrainState, make_train_step
from avsl_tpu.train.objectives import flamingo_loss_fn
from avsl_tpu.train.optim import (
    FROZEN,
    TRAIN,
    label_params,
    linear_warmup_decay,
    select_optimizer,
    whisper_flamingo_projection_optimizer,
)


class Cfg:
    learning_rate = 1e-3
    warmup_steps = 2
    weight_decay = 0.01
    adam_epsilon = 1e-8
    add_gated_x_attn = 1
    video_projection_train_only = False
    freeze_video_model = True


@pytest.fixture(scope="module")
def flamingo_setup():
    cfg = WhisperConfig.tiny_test(dtype="float32", add_gated_x_attn=1)
    model = Whisper(cfg)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(8, 80, 64)), jnp.float32)
    video = jnp.asarray(rng.normal(size=(8, 6, cfg.video_state)), jnp.float32)
    dec_in = jnp.asarray(rng.integers(0, 250, (8, 6)))
    labels = jnp.concatenate([dec_in[:, 1:], jnp.full((8, 1), 3)], axis=1)
    variables = model.init(jax.random.PRNGKey(0), mel, dec_in, video=video)
    batch = {"input_ids": mel, "dec_input_ids": dec_in, "labels": labels, "video": video}
    return cfg, model, variables, batch


def test_schedule():
    s = linear_warmup_decay(1.0, 10, 110)
    assert float(s(0)) == 0.0
    assert float(s(10)) == pytest.approx(1.0)
    assert float(s(60)) == pytest.approx(0.5)
    assert float(s(110)) == pytest.approx(0.0)


def test_flamingo_regime_labels(flamingo_setup):
    _, _, variables, _ = flamingo_setup
    _, labels = whisper_flamingo_projection_optimizer(
        variables["params"], Cfg(), 100
    )
    flat = jax.tree_util.tree_leaves_with_path(labels)
    trained = ["/".join(str(getattr(p, "key", p)) for p in path)
               for path, l in flat if l == TRAIN]
    frozen = ["/".join(str(getattr(p, "key", p)) for p in path)
              for path, l in flat if l == FROZEN]
    assert any("x_attn" in k for k in trained)
    assert any("video_projection" in k for k in trained)
    assert all("x_attn" in k or "x_mlp" in k or "video_projection" in k for k in trained)
    assert any("encoder" in k for k in frozen)


def test_train_step_on_mesh_updates_only_trainable(flamingo_setup, eight_devices):
    cfg, model, variables, batch = flamingo_setup
    mesh = make_mesh(8, model_parallel=1)
    tx, labels = select_optimizer(variables["params"], Cfg(), 100)
    loss_fn = flamingo_loss_fn(model, train=True)
    step = make_train_step(loss_fn, tx, mesh=mesh, donate=False)
    state = TrainState.create(variables["params"], tx)

    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    state2, metrics = step(state2, batch)  # warmup lr is 0 at step 0
    state2, metrics = step(state2, batch)
    # gate params moved, encoder params frozen
    p0 = variables["params"]["decoder"]["block_0"]
    p2 = state2.params["decoder"]["block_0"]
    assert np.abs(np.asarray(p2["x_attn_gate"]) - np.asarray(p0["x_attn_gate"])).max() > 0
    e0 = variables["params"]["encoder"]["conv1"]["kernel"]
    e2 = state2.params["encoder"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(e2))

    # loss decreases over a few steps
    losses = [float(metrics["loss"])]
    for _ in range(5):
        state2, metrics = step(state2, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_prob_av_mode_mixing(flamingo_setup):
    """prob_av/prob_a draw one AV-mode per step (external fork contract,
    whisper_flamingo_ft_ami.py:337-348): prob_av=1 keeps both streams,
    prob_a=1 zeroes the projected video features (audio-only — the loss
    must be invariant to video content), and prob_av=prob_a=0 zeroes the
    mel (video-only)."""
    cfg, model, variables, batch = flamingo_setup
    rng = jax.random.PRNGKey(7)
    # nudge the x-attn gates: at init tanh(0)=0 makes video a no-op, which
    # would hide the audio-only branch
    nudged = jax.tree_util.tree_map(lambda x: x, variables)  # fresh dicts, same leaves
    for blk, sub in nudged["params"]["decoder"].items():
        if blk.startswith("block_") and "x_attn_gate" in sub:
            sub["x_attn_gate"] = jnp.ones_like(sub["x_attn_gate"])

    def loss_with(batch, **kw):
        fn = flamingo_loss_fn(model, train=True, **kw)
        loss, _ = fn(nudged, None, batch, rng)
        return float(loss)

    base = loss_with(batch)  # default prob_av=1 -> no mixing branch at all
    assert loss_with(batch, prob_av=1.0, prob_a=0.0) == pytest.approx(base, rel=1e-6)

    # audio-only: the decoder must be blind to video — the loss is
    # invariant under replacing the video content entirely (x_v is scaled
    # to zero post-projection, so only content-independent bias constants
    # remain in the gated branch)
    video_swapped = dict(batch, video=batch["video"][::-1] * 3.0 + 1.0)
    audio_only = loss_with(batch, prob_av=0.0, prob_a=1.0)
    assert audio_only == pytest.approx(
        loss_with(video_swapped, prob_av=0.0, prob_a=1.0), rel=1e-6
    )
    assert audio_only != pytest.approx(base, rel=1e-6)

    mel_zeroed = dict(batch, input_ids=jnp.zeros_like(batch["input_ids"]))
    video_only = loss_with(batch, prob_av=0.0, prob_a=0.0)
    assert video_only == pytest.approx(loss_with(mel_zeroed), rel=1e-6)


def test_mode_mixing_stable_with_bn_trunk():
    """Regression: mixed prob_av/prob_a training through a BatchNorm video
    trunk must not NaN. Zeroing the raw pixels on audio-only draws made
    every trunk BN batch zero-variance; BN's backward scales by
    ~1/sqrt(eps) per layer (measured grad-norm ~4e4, NaN by step 3 under
    Adam). The fix scales the *projected features* to zero instead, which
    also leaves the trunk with exactly zero gradient on those draws."""
    import flax.linen as nn
    import optax

    from avsl_tpu.core.config import AVHuBERTConfig
    from avsl_tpu.models.avhubert import AVHuBERTModel

    av_cfg = AVHuBERTConfig.tiny_test(
        dtype="float32", use_audio=False, modality_fuse="add"
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
    mel = jnp.asarray(rng.normal(size=(2, w_cfg.n_mels, 64)), jnp.float32)
    video = jnp.asarray(rng.normal(size=(2, 8, 24, 24, 1)), jnp.float32)
    dec = jnp.asarray(rng.integers(0, 200, (2, 5)), jnp.int32)
    labels = jnp.concatenate([dec[:, 1:], jnp.full((2, 1), 3)], axis=1)
    batch = {"input_ids": mel, "dec_input_ids": dec, "labels": labels,
             "video": video}
    variables = model.init(jax.random.PRNGKey(0), mel, dec, video=video)

    # the exact construction that NaN'd at step 3 pre-fix
    tx = optax.adam(1e-3)
    loss_fn = flamingo_loss_fn(model, train=True, prob_av=0.5, prob_a=0.3)
    step = make_train_step(loss_fn, tx, donate=False)
    state = TrainState.create(
        variables["params"], tx, batch_stats=variables.get("batch_stats")
    )
    for i in range(6):
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"])), f"NaN loss at step {i}"

    # audio-only draws: the video trunk gets exactly zero gradient and the
    # global grad magnitude stays sane (pre-fix: ~4e4 through the BNs)
    always_a = flamingo_loss_fn(model, train=True, prob_av=0.0, prob_a=1.0)
    grads = jax.grad(
        lambda p: always_a(p, variables.get("batch_stats"), batch,
                           jax.random.PRNGKey(1))[0]
    )(variables["params"])
    trunk = np.concatenate([
        np.asarray(g).ravel()
        for g in jax.tree_util.tree_leaves(grads["video_model"])
    ])
    np.testing.assert_array_equal(trunk, 0.0)
    gmax = max(float(jnp.max(jnp.abs(g)))
               for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gmax) and gmax < 100.0


def test_grad_accum_matches_big_batch(flamingo_setup):
    cfg, model, variables, batch = flamingo_setup
    tx, _ = select_optimizer(variables["params"], Cfg(), 100)
    loss_fn = flamingo_loss_fn(model, train=False)  # deterministic for equality

    step1 = make_train_step(loss_fn, tx, grad_accum_steps=1, donate=False)
    step2 = make_train_step(loss_fn, tx, grad_accum_steps=2, donate=False)

    s0 = TrainState.create(variables["params"], tx)
    sA, mA = step1(s0, batch)
    micro = {k: v.reshape(2, 4, *v.shape[1:]) for k, v in batch.items()}
    sB, mB = step2(TrainState.create(variables["params"], tx), micro)
    assert float(mB["loss"]) == pytest.approx(float(mA["loss"]), rel=1e-5)
    ga = np.asarray(sA.params["decoder"]["block_0"]["x_attn_gate"])
    gb = np.asarray(sB.params["decoder"]["block_0"]["x_attn_gate"])
    np.testing.assert_allclose(ga, gb, atol=1e-6)


def test_checkpoint_roundtrip(tmp_path, flamingo_setup):
    from avsl_tpu.train import restore_checkpoint, save_checkpoint, latest_step

    cfg, model, variables, batch = flamingo_setup
    tx, _ = select_optimizer(variables["params"], Cfg(), 100)
    state = TrainState.create(variables["params"], tx)
    save_checkpoint(str(tmp_path / "ckpt"), state, step=5)
    assert latest_step(str(tmp_path / "ckpt")) == 5
    restored = restore_checkpoint(str(tmp_path / "ckpt"), state)
    np.testing.assert_array_equal(
        np.asarray(restored.params["decoder"]["block_0"]["x_attn_gate"]),
        np.asarray(state.params["decoder"]["block_0"]["x_attn_gate"]),
    )


def test_restore_sharded_reshards_onto_new_topology(tmp_path, eight_devices):
    """restore_sharded reads a checkpoint straight into the mesh layout.

    The writer's topology must not matter: save from a plain (replicated)
    state, restore onto dp=4 x tp=2, then onto dp=2 x tp=4 — values
    identical each time, and the TP-ruled leaves (q_proj/out_proj kernels
    and their adam mirrors) actually land sharded over "model"."""
    import optax
    from avsl_tpu.train import TrainState, restore_sharded, save_checkpoint
    from jax.sharding import PartitionSpec as P

    params = {
        "enc": {
            "q_proj": {"kernel": jnp.arange(32.0).reshape(4, 8)},
            "out_proj": {"kernel": jnp.arange(32.0).reshape(8, 4) * 2.0},
            "ln": {"scale": jnp.ones((4,))},
        }
    }
    state = TrainState.create(params, optax.adam(1e-3))
    save_checkpoint(str(tmp_path / "ck"), state, step=3)

    for mp in (2, 4):
        mesh = make_mesh(8, model_parallel=mp)
        restored = restore_sharded(str(tmp_path / "ck"), state, mesh)
        np.testing.assert_array_equal(
            np.asarray(restored.params["enc"]["q_proj"]["kernel"]),
            np.asarray(params["enc"]["q_proj"]["kernel"]),
        )
        qk = restored.params["enc"]["q_proj"]["kernel"]
        assert qk.sharding.spec == P(None, "model"), (mp, qk.sharding.spec)
        ok = restored.params["enc"]["out_proj"]["kernel"]
        assert ok.sharding.spec == P("model", None), (mp, ok.sharding.spec)
        # adam mu mirrors the param path -> same rule hit
        mu_qk = restored.opt_state[0].mu["enc"]["q_proj"]["kernel"]
        assert mu_qk.sharding.spec == P(None, "model")
        # each shard is a real slice, not a replicated copy
        assert qk.addressable_shards[0].data.shape == (4, 8 // mp)


def test_partial_load_triage(flamingo_setup):
    from avsl_tpu.train import partial_load

    cfg, model, variables, _ = flamingo_setup
    params = variables["params"]
    gate = np.ones((1,), np.float32) * 0.5
    loaded = {
        "decoder/block_0/x_attn_gate": gate,
        "decoder/block_0/x_attn_gate_WRONG": gate,
        "encoder/conv1/kernel": np.zeros((1, 1)),  # wrong shape
    }
    new_params, report = partial_load(params, loaded)
    assert "decoder/block_0/x_attn_gate" in report["loaded"]
    assert "decoder/block_0/x_attn_gate_WRONG" in report["unexpected"]
    assert "encoder/conv1/kernel" in report["shape_mismatch"]
    assert len(report["missing"]) > 0
    assert float(np.asarray(new_params["decoder"]["block_0"]["x_attn_gate"])[0]) == 0.5


def test_flamingo_loss_provides_modality_rng():
    """An AV trunk with modality_dropout > 0 calls make_rng('modality')
    during training — the flamingo loss must supply that stream (and a
    dropout key that is NOT later re-split for other draws)."""
    import jax
    import jax.numpy as jnp

    from avsl_tpu.core.config import AVHuBERTConfig
    from avsl_tpu.models.factory import build_whisper_flamingo
    from avsl_tpu.train.objectives import flamingo_loss_fn

    av_cfg = AVHuBERTConfig.tiny_test(modality_dropout=0.5, dtype="float32")
    model, cfg = build_whisper_flamingo(
        "test", vocab_size=64, av_hubert_cfg=av_cfg, dtype="float32"
    )
    B, T = 2, 50
    mel = jnp.zeros((B, cfg.n_mels, T))
    video = jnp.zeros((B, 12, 88, 88, 1))
    toks = jnp.asarray([[1, 2, 3]] * B)
    variables = model.init(jax.random.PRNGKey(0), mel, toks, video=video)
    loss_fn = flamingo_loss_fn(model, train=True)
    batch = {
        "input_ids": mel,
        "dec_input_ids": toks,
        "labels": jnp.asarray([[2, 3, 4]] * B),
        "video": video,
    }
    loss, _ = loss_fn(
        variables["params"], variables.get("batch_stats"), batch,
        jax.random.PRNGKey(1),
    )
    assert np.isfinite(float(loss))
