"""Draft distillation (train/distill.py, cli.distill).

The point of distillation is a draft whose greedy choices track the
target's — measured offline as masked argmax agreement and online as the
speculative acceptance rate. Anchors:

* the label program masks exactly the generated positions up to the
  first EOT;
* a few hundred overfitting steps on a tiny fixed corpus drive agreement
  near 1 and RAISE the speculative acceptance rate vs the random draft,
  while the decoded tokens stay exactly greedy (the draft can never
  change outputs, only speed);
* the CLI round-trips: cli.distill --smoke writes a checkpoint that
  cli.transcribe --draft_ckpt restores (optimizer-agnostic), with
  transcripts identical to the draft-free run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from avsl_tpu.decode import greedy_decode, speculative_greedy_decode
from avsl_tpu.models.factory import build_whisper_flamingo
from avsl_tpu.train.distill import make_distill_step, make_label_fn
from avsl_tpu.train.loop import TrainState


def _models():
    target, t_cfg = build_whisper_flamingo(
        "test", vocab_size=64, add_gated_x_attn=False, dtype="float32"
    )
    draft, d_cfg = build_whisper_flamingo(
        "test", vocab_size=64, add_gated_x_attn=False, dtype="float32"
    )
    b, s = 4, 16000
    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal((b, s))).astype(np.float32)
    mel_shape = (b, t_cfg.n_mels, s // 160)
    t_vars = target.init(
        jax.random.PRNGKey(0), np.zeros(mel_shape, np.float32),
        np.zeros((b, 4), np.int32),
    )
    d_vars = draft.init(
        jax.random.PRNGKey(5), np.zeros(mel_shape, np.float32),
        np.zeros((b, 4), np.int32),
    )
    prompt = np.tile(np.asarray([[1, 2, 3]], np.int32), (b, 1))
    return target, t_vars, draft, d_vars, audio, prompt


def test_label_fn_masks_generated_positions():
    target, t_vars, *_ , audio, prompt = _models()
    eot = 63
    label_fn = make_label_fn(target, t_vars, 6, eot)
    tokens, t_logprob, valid = label_fn(audio, prompt)
    b, p = prompt.shape
    assert tokens.shape == (b, p + 6)
    assert t_logprob.shape == (b, p + 5, 64)
    v = np.asarray(valid)
    # prompt-internal positions (predicting prompt tokens) never train
    assert not v[:, : p - 1].any()
    # the first generated position always trains
    assert v[:, p - 1].all()
    # nothing after the first EOT prediction trains
    pred = np.asarray(tokens)[:, 1:]
    for i in range(b):
        eots = np.where(pred[i] == eot)[0]
        if len(eots):
            assert not v[i, eots[0] + 1 :].any()


def test_distill_raises_acceptance_tokens_stay_greedy():
    target, t_vars, draft, d_vars, audio, prompt = _models()
    eot = 63
    max_new, k = 8, 3
    label_fn = make_label_fn(target, t_vars, max_new, eot)
    tokens, t_logprob, valid = label_fn(audio, prompt)

    tx = optax.adamw(3e-3, weight_decay=0.0)
    state = TrainState.create(
        d_vars["params"], tx, batch_stats=d_vars.get("batch_stats")
    )
    step_fn = make_distill_step(draft, tx, hard_weight=0.5)

    _, m0 = step_fn(state, audio, tokens, t_logprob, valid)  # pre-update metrics
    agree0 = float(m0["agree"])
    metrics = m0
    for _ in range(300):
        state, metrics = step_fn(state, audio, tokens, t_logprob, valid)
        if float(metrics["agree"]) > 0.95:
            break
    agree1 = float(metrics["agree"])
    assert agree1 > max(0.8, agree0 + 0.2), (agree0, agree1)
    assert float(metrics["loss"]) < float(m0["loss"])

    # ---- online: acceptance with the distilled draft beats the random
    # draft, and tokens are exactly greedy either way
    d_trained = {"params": state.params}
    if state.batch_stats is not None:
        d_trained["batch_stats"] = state.batch_stats

    mel = None  # the spec harness builds encoder features itself

    def spec_run(dv):
        from avsl_tpu.kernels import log_mel_spectrogram

        t_mel = log_mel_spectrogram(jnp.asarray(audio), n_mels=target.cfg.n_mels)
        feats, _ = target.apply(t_vars, t_mel, None, method=target.encode)
        d_mel = log_mel_spectrogram(jnp.asarray(audio), n_mels=draft.cfg.n_mels)
        dfeats, _ = draft.apply(dv, d_mel, None, method=draft.encode)
        need = prompt.shape[1] + max_new + k
        tc = target.apply(t_vars, feats, None, need, method=target.init_decode_cache)
        dc = draft.apply(dv, dfeats, None, need, method=draft.init_decode_cache)

        def st(t, c):
            return target.apply(t_vars, t, None, None, c, method=target.decode)

        def sd(t, c):
            return draft.apply(dv, t, None, None, c, method=draft.decode)

        ref = greedy_decode(st, tc, jnp.asarray(prompt), max_new, eot)
        res = speculative_greedy_decode(
            st, sd, tc, dc, jnp.asarray(prompt), max_new, eot, k=k
        )
        np.testing.assert_array_equal(np.asarray(res.tokens), np.asarray(ref))
        return float(res.accept_rate)

    acc_random = spec_run(d_vars)
    acc_distilled = spec_run(d_trained)
    assert acc_distilled > acc_random + 0.3, (acc_random, acc_distilled)
    assert acc_distilled > 0.6


def test_cli_distill_to_transcribe_roundtrip(tmp_path, monkeypatch):
    import os

    import scipy.io.wavfile as wavfile

    from avsl_tpu.cli import distill, transcribe

    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    for i in range(3):
        sr = 16000
        x = (0.2 * np.sin(2 * np.pi * (180 + 90 * i) * np.arange(sr) / sr)
             ).astype(np.float32)
        wavfile.write(str(seg_dir / f"seg{i}.wav"), sr, (x * 32767).astype(np.int16))

    monkeypatch.chdir(tmp_path)
    out_dir = str(tmp_path / "draft_ckpt")
    summary = distill.main(
        ["--input", str(seg_dir), "--smoke", "--output", out_dir,
         "--steps", "3", "--batch_size", "2", "--max_new_tokens", "4",
         "--log_every", "1"]
    )
    assert os.path.exists(os.path.join(out_dir, "distill_summary.json"))
    assert summary["final"]["loss"] >= 0.0

    base = transcribe.main(
        ["--input", str(seg_dir), "--smoke", "--batch_size", "2",
         "--max_new_tokens", "4",
         "--output", str(tmp_path / "base.json")]
    )
    spec = transcribe.main(
        ["--input", str(seg_dir), "--smoke", "--batch_size", "2",
         "--max_new_tokens", "4", "--draft_model", "test",
         "--draft_ckpt", out_dir, "--spec_k", "2",
         "--output", str(tmp_path / "spec.json")]
    )
    assert [r["text"] for r in spec] == [r["text"] for r in base]

    # a draft checkpoint served under the WRONG --draft_model is rejected
    # upfront (tree/shape check), not minutes later inside the compile
    with pytest.raises(SystemExit, match="does not match"):
        transcribe.main(
            ["--input", str(seg_dir), "--smoke", "--batch_size", "2",
             "--max_new_tokens", "4", "--draft_model", "tiny",
             "--draft_ckpt", out_dir]
        )
