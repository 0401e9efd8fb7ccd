"""Model-stack tests on tiny configs (CPU, fast compiles).

Key correctness properties:
* incremental KV-cached decoding reproduces full teacher-forced logits
* zero-initialized Flamingo gates make video a no-op at init
* audio-only / video-only / AV batches share one static-shape program
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsl_tpu.core.config import AVHuBERTConfig, WhisperConfig
from avsl_tpu.models.avhubert import (
    AVHuBERTForCTC,
    AVHuBERTForSpeech2Text,
    AVHuBERTModel,
    cross_entropy_loss,
    ctc_loss,
    span_mask,
)
from avsl_tpu.models.resnet3d import ResNet3DFrontend
from avsl_tpu.models.whisper import Whisper

# fp32 for numerical comparisons on CPU
WCFG = WhisperConfig.tiny_test(dtype="float32")
ACFG = AVHuBERTConfig.tiny_test(dtype="float32")


@pytest.fixture(scope="module")
def whisper_setup():
    model = Whisper(WCFG)
    rng = jax.random.PRNGKey(0)
    mel = jnp.asarray(np.random.default_rng(0).normal(size=(2, 80, 64)), jnp.float32)
    tokens = jnp.asarray(np.random.default_rng(1).integers(0, 255, (2, 8)))
    params = model.init(rng, mel, tokens)
    return model, params, mel, tokens


def test_whisper_forward_shapes(whisper_setup):
    model, params, mel, tokens = whisper_setup
    logits = model.apply(params, mel, tokens)
    assert logits.shape == (2, 8, WCFG.n_vocab)
    assert np.isfinite(np.asarray(logits)).all()


def test_whisper_encoder_downsamples_by_two(whisper_setup):
    model, params, mel, _ = whisper_setup
    feats, _ = model.apply(params, mel, method=model.encode)
    assert feats.shape == (2, 32, WCFG.n_audio_state)


def test_whisper_incremental_decode_matches_full(whisper_setup):
    model, params, mel, tokens = whisper_setup
    full = model.apply(params, mel, tokens)

    feats, _ = model.apply(params, mel, method=model.encode)
    cache = model.apply(params, feats, None, 16, method=model.init_decode_cache)
    step_logits = []
    for i in range(tokens.shape[1]):
        logits, cache = model.apply(
            params, tokens[:, i : i + 1], feats, None, cache, method=model.decode
        )
        step_logits.append(logits[:, 0])
    inc = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full), atol=2e-4, rtol=2e-4)


def test_flamingo_gates_start_as_identity():
    cfg = WhisperConfig.tiny_test(dtype="float32", add_gated_x_attn=1)
    model = Whisper(cfg)
    mel = jnp.zeros((1, 80, 64), jnp.float32)
    tokens = jnp.asarray([[1, 2, 3]])
    video_feats = jnp.asarray(
        np.random.default_rng(3).normal(size=(1, 10, cfg.video_state)), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), mel, tokens, video=video_feats)
    with_video = model.apply(params, mel, tokens, video=video_feats)
    without_video = model.apply(params, mel, tokens)
    # tanh(0) = 0 gates: video must not change logits at init
    np.testing.assert_allclose(
        np.asarray(with_video), np.asarray(without_video), atol=1e-6
    )
    # after nudging the gate, video must matter
    import flax

    p = flax.core.unfreeze(params) if hasattr(flax.core, "unfreeze") else dict(params)
    p["params"]["decoder"]["block_0"]["x_attn_gate"] = jnp.ones((1,))
    diff = np.abs(
        np.asarray(model.apply(p, mel, tokens, video=video_feats))
        - np.asarray(without_video)
    ).max()
    assert diff > 1e-4


def test_resnet3d_shapes():
    frontend = ResNet3DFrontend(
        frontend_channels=8, backbone_channels=64, dtype=jnp.float32
    )
    video = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 5, 48, 48, 1)), jnp.float32
    )
    params = frontend.init(jax.random.PRNGKey(0), video)
    out = frontend.apply(params, video)
    assert out.shape == (2, 5, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_stem_time_channel_conv_matches_conv3d():
    """The TPU-fast stem (temporal taps stacked on channels, 2-D conv;
    19.6x faster than XLA's C_in=1 Conv3D on v5e) must be numerically
    identical to the direct Conv3D it replaces, including at odd
    spatial sizes and batch > 1, and must keep the Conv3D param layout
    [5,7,7,1,C] for checkpoint conversion (convert.py RESNET map)."""
    from jax import lax

    from avsl_tpu.models.resnet3d import TimeChannelStemConv

    m = TimeChannelStemConv(12, dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 7, 26, 22, 1)), jnp.float32
    )
    v = m.init(jax.random.PRNGKey(1), x)
    assert v["params"]["kernel"].shape == (5, 7, 7, 1, 12)
    out = m.apply(v, x)
    ref = lax.conv_general_dilated(
        x,
        v["params"]["kernel"].astype(jnp.float32),
        (1, 2, 2),
        ((2, 2), (3, 3), (3, 3)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.fixture(scope="module")
def av_batch():
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(2, 12, 104)), jnp.float32)
    video = jnp.asarray(rng.normal(size=(2, 12, 32, 32, 1)), jnp.float32)
    padding = jnp.ones((2, 12), bool)
    return audio, video, padding


def test_avhubert_fusion_modes(av_batch):
    audio, video, padding = av_batch
    for fuse in ("concat", "add", "weighted_sum"):
        cfg = AVHuBERTConfig.tiny_test(dtype="float32", modality_fuse=fuse)
        model = AVHuBERTModel(cfg)
        params = model.init(
            jax.random.PRNGKey(0), audio=audio, video=video, padding_mask=padding
        )
        out = model.apply(params, audio=audio, video=video, padding_mask=padding)
        assert out.shape == (2, 12, cfg.hidden_size), fuse
        assert np.isfinite(np.asarray(out)).all(), fuse


def test_avhubert_missing_modality_presence_flags(av_batch):
    audio, video, padding = av_batch
    model = AVHuBERTModel(ACFG)
    params = model.init(
        jax.random.PRNGKey(0), audio=audio, video=video, padding_mask=padding
    )
    # audio-only == zeroing video through presence flags, same program
    out_av = model.apply(
        params, audio=audio, video=video,
        audio_present=jnp.ones(2), video_present=jnp.zeros(2),
    )
    out_a = model.apply(
        params, audio=audio, video=jnp.zeros_like(video),
        audio_present=jnp.ones(2), video_present=jnp.zeros(2),
    )
    np.testing.assert_allclose(np.asarray(out_av), np.asarray(out_a), atol=1e-5)


def test_avhubert_modality_dropout_runs(av_batch):
    audio, video, padding = av_batch
    cfg = AVHuBERTConfig.tiny_test(
        dtype="float32", modality_dropout=0.5, audio_dropout=0.5,
        hidden_dropout=0.0, dropout_input=0.0, activation_dropout=0.0,
    )
    model = AVHuBERTModel(cfg)
    params = model.init(jax.random.PRNGKey(0), audio=audio, video=video)
    out, updates = model.apply(
        params, audio=audio, video=video, deterministic=False,
        rngs={"modality": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2),
              "mask": jax.random.PRNGKey(3)},
        mutable=["batch_stats"],
    )
    assert np.isfinite(np.asarray(out)).all()
    assert "batch_stats" in updates


def test_avhubert_seq2seq_loss_and_cache(av_batch):
    audio, video, padding = av_batch
    model = AVHuBERTForSpeech2Text(ACFG)
    labels = jnp.asarray([[5, 6, 7, 2, -100, -100], [8, 9, 2, -100, -100, -100]])
    params = model.init(
        jax.random.PRNGKey(0), audio=audio, video=video, labels=labels
    )
    out = model.apply(params, audio=audio, video=video, labels=labels)
    assert out["logits"].shape == (2, 6, ACFG.vocab_size)
    assert np.isfinite(float(out["loss"]))

    # incremental decode == full decode
    enc = model.apply(params, audio=audio, video=video, method=model.encode)
    dec_in = model.apply(params, labels, method=model.shift_right)
    full, _ = model.apply(params, dec_in, enc, method=model.decode)
    cache = model.apply(params, enc, 8, method=model.init_decode_cache)
    steps = []
    for i in range(dec_in.shape[1]):
        logits, cache = model.apply(
            params, dec_in[:, i : i + 1], enc, None, cache, method=model.decode
        )
        steps.append(logits[:, 0])
    inc = jnp.stack(steps, axis=1)
    # full decode masks PAD keys, incremental attends to the causal prefix
    # only; compare on positions before any padding
    np.testing.assert_allclose(
        np.asarray(inc[:, :3]), np.asarray(full[:, :3]), atol=2e-4, rtol=2e-4
    )


def test_ctc_head_and_loss(av_batch):
    audio, video, padding = av_batch
    model = AVHuBERTForCTC(ACFG)
    params = model.init(jax.random.PRNGKey(0), audio=audio, video=video)
    logits = model.apply(params, audio=audio, video=video)
    assert logits.shape == (2, 12, ACFG.vocab_size)
    labels = jnp.asarray([[5, 6, 7, 0], [8, 9, 0, 0]])
    label_pad = jnp.asarray([[0, 0, 0, 1], [0, 0, 1, 1]], jnp.float32)
    logit_pad = jnp.zeros((2, 12), jnp.float32)
    loss = ctc_loss(logits, logit_pad, labels, label_pad, blank_id=ACFG.pad_token_id)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_span_mask_properties():
    key = jax.random.PRNGKey(0)
    padding = jnp.concatenate([jnp.ones((4, 50), bool), jnp.zeros((4, 14), bool)], 1)
    mask = span_mask(key, 4, 64, mask_prob=0.8, mask_length=10, padding_mask=padding)
    m = np.asarray(mask)
    assert m.shape == (4, 64)
    assert m.any()
    assert not m[:, 50:].any()  # never masks padding


def _numpy_compute_mask_indices(rng, bsz, T, mask_prob, mask_length, sz=None):
    """Clean-room numpy re-derivation of the reference's default
    compute_mask_indices path (utils/model_utils.py:4-114,
    no_overlap=False, static lengths): per item, round(prob*sz/L) span
    starts drawn uniformly WITHOUT replacement from [0, sz-L), each span
    masking L steps, indices clipped to < sz."""
    sz = T if sz is None else sz
    num = max(1, int((mask_prob + 1e-5) * sz / float(mask_length) + 0.5))
    mask = np.zeros((bsz, T), bool)
    for i in range(bsz):
        starts = rng.choice(max(sz - mask_length, 1), size=min(num, max(sz - mask_length, 1)), replace=False)
        for s in starts:
            mask[i, s:min(s + mask_length, sz)] = True
    return mask


def test_span_mask_statistical_parity_with_reference():
    """VERDICT round-2 item 9: the jit span_mask must match the reference
    sampler's distribution, not just 'produce some mask'. Compares mask
    rate and span-length statistics over many draws (no padding: the
    distributions are identical by construction — uniform
    without-replacement starts; tolerance covers sampling noise)."""
    B, T, P, L = 16, 200, 0.65, 10
    rng = np.random.default_rng(0)
    ref = np.concatenate(
        [_numpy_compute_mask_indices(rng, B, T, P, L) for _ in range(30)]
    )
    ours = np.concatenate([
        np.asarray(span_mask(jax.random.PRNGKey(i), B, T, P, L))
        for i in range(30)
    ])
    assert abs(ours.mean() - ref.mean()) < 0.02, (ours.mean(), ref.mean())

    def run_lengths(m):
        out = []
        for row in m:
            d = np.diff(np.concatenate([[0], row.astype(int), [0]]))
            starts = np.nonzero(d == 1)[0]
            ends = np.nonzero(d == -1)[0]
            out.extend(ends - starts)
        return np.array(out)

    rl_ref, rl_ours = run_lengths(ref), run_lengths(ours)
    # overlapping spans merge, so observed run lengths are multiples-ish
    # of L with the same merge statistics under both samplers
    assert abs(rl_ours.mean() - rl_ref.mean()) < 1.5, (rl_ours.mean(), rl_ref.mean())
    assert rl_ours.min() >= 1 and rl_ref.min() >= 1


def test_span_mask_padded_rate_close_to_reference():
    """Documented deviation check: with padding, span COUNT uses padded T
    (static shapes) while the reference recomputes it from the unpadded
    length; starts stay within the unpadded range in both. For bucketed
    padding (~20%), unpadded-region mask rates must agree within 5%."""
    B, T, SZ, P, L = 16, 200, 160, 0.65, 10
    rng = np.random.default_rng(1)
    ref = np.concatenate(
        [_numpy_compute_mask_indices(rng, B, T, P, L, sz=SZ) for _ in range(30)]
    )
    padding = np.zeros((B, T), bool)
    padding[:, :SZ] = True
    ours = np.concatenate([
        np.asarray(span_mask(jax.random.PRNGKey(i), B, T, P, L,
                             padding_mask=jnp.asarray(padding)))
        for i in range(30)
    ])
    assert not ours[:, SZ:].any()
    rate_ref = ref[:, :SZ].mean()
    rate_ours = ours[:, :SZ].mean()
    assert abs(rate_ours - rate_ref) < 0.05, (rate_ours, rate_ref)


def test_mask_feature_prob_channel_masking(av_batch):
    """mask_feature_prob must actually change the forward pass (the
    reference zeroes random channel spans during pretrain-style masking,
    av_hubert_model.py:586-828). Two configs differing only in the knob
    share an init tree (channel masking adds no params), so any output
    difference is the masking itself."""
    audio, video, padding = av_batch
    cfg_on = AVHuBERTConfig.tiny_test(
        dtype="float32", mask_prob_audio=0.0, mask_feature_prob=0.5,
        mask_feature_length=4,
    )
    cfg_off = AVHuBERTConfig.tiny_test(
        dtype="float32", mask_prob_audio=0.0, mask_feature_prob=0.0,
    )
    m_on, m_off = AVHuBERTModel(cfg_on), AVHuBERTModel(cfg_off)
    params = m_off.init(
        jax.random.PRNGKey(0), audio=audio, video=video, padding_mask=padding
    )
    rngs = {"dropout": jax.random.PRNGKey(1), "modality": jax.random.PRNGKey(2),
            "mask": jax.random.PRNGKey(3)}
    kw = dict(audio=audio, video=video, padding_mask=padding,
              apply_time_mask=True, deterministic=False,
              use_running_average=True)
    out_on = m_on.apply(params, rngs=rngs, **kw)
    out_off = m_off.apply(params, rngs=rngs, **kw)
    assert np.abs(np.asarray(out_on) - np.asarray(out_off)).max() > 1e-5
    # with the knob off the call is reproducible under the same rngs
    out_off2 = m_off.apply(params, rngs=rngs, **kw)
    np.testing.assert_allclose(np.asarray(out_off), np.asarray(out_off2))


def test_cross_entropy_label_smoothing():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 10)), jnp.float32)
    labels = jnp.asarray([[1, 2, -100, -100], [3, -100, -100, -100]])
    plain = cross_entropy_loss(logits, labels, 0.0)
    smooth = cross_entropy_loss(logits, labels, 0.1)
    assert np.isfinite(float(plain)) and np.isfinite(float(smooth))
    assert abs(float(plain) - float(smooth)) > 1e-6


def test_encode_track_norm_sows_feature_norms():
    """Reference contract: encoder(..., track_norm=) records feature norms
    (whisper_flamingo_ft_ami.py:527,569). Functional equivalent: sow to
    the 'intermediates' collection."""
    cfg = WhisperConfig.tiny_test(dtype="float32", add_gated_x_attn=1)
    model = Whisper(cfg)
    mel = jnp.zeros((1, 80, 64), jnp.float32)
    tokens = jnp.asarray([[1, 2, 3]])
    video_feats = jnp.asarray(
        np.random.default_rng(3).normal(size=(1, 10, cfg.video_state)), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), mel, tokens, video=video_feats)
    (_, x_v), aux = model.apply(
        params, mel, video=video_feats, track_norm=True,
        method=model.encode, mutable=["intermediates"],
    )
    inter = aux["intermediates"]
    a = float(inter["audio_feature_norm"][0])
    v = float(inter["video_feature_norm"][0])
    assert np.isfinite(a) and a >= 0
    assert np.isfinite(v) and v > 0


def test_factory_model_builds_twice():
    """Reference regression: loading the AV model twice must not fail
    (test_av_hubert_fix.py:162-180 guards a fairseq duplicate-registration
    bug; the functional flax factory must be construct-twice safe and
    produce identical init trees)."""
    from avsl_tpu.models.factory import build_whisper_flamingo

    m1, c1 = build_whisper_flamingo(model_name="test", dtype="float32")
    m2, c2 = build_whisper_flamingo(model_name="test", dtype="float32")
    mel = jnp.zeros((1, c1.n_mels, 64), jnp.float32)
    toks = jnp.asarray([[1, 2, 3]])
    video = jnp.zeros((1, 4, 88, 88, 1), jnp.float32)
    v1 = m1.init(jax.random.PRNGKey(0), mel, toks, video=video)
    v2 = m2.init(jax.random.PRNGKey(0), mel, toks, video=video)
    leaves1 = jax.tree_util.tree_leaves(v1)
    leaves2 = jax.tree_util.tree_leaves(v2)
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
