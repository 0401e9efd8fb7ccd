"""Language identification (decode/language.py): one decode step from
<|sot|>, posterior over the tokenizer's language-token set."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avsl_tpu.data.tokenizer import get_tokenizer
from avsl_tpu.decode import detect_language
from avsl_tpu.models.factory import build_whisper_flamingo


def test_detect_language_posterior():
    tokenizer = get_tokenizer(None, "en")
    model, cfg = build_whisper_flamingo(
        "test", vocab_size=tokenizer.vocab_size, dtype="float32",
        add_gated_x_attn=False,
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_mels, 100), jnp.float32),
        jnp.asarray([[1]], jnp.int32),
    )
    rng = np.random.default_rng(0)
    audio = jnp.asarray(0.1 * rng.standard_normal((2, 16000)), jnp.float32)
    out = detect_language(model, variables, tokenizer, audio)
    assert len(out) == 2
    for best, table in out:
        assert best in table
        assert table[best] == max(table.values())
        assert sum(table.values()) == pytest.approx(1.0, abs=1e-4)
        # the posterior is restricted to actual language tokens
        assert all(f"<|{l}|>" in tokenizer.special_tokens for l in table)
    # deterministic
    out2 = detect_language(model, variables, tokenizer, audio)
    assert [b for b, _ in out2] == [b for b, _ in out]


def test_transcribe_cli_detect_language(tmp_path, monkeypatch):
    import os

    import scipy.io.wavfile as wavfile

    from avsl_tpu.cli import transcribe

    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    for i in range(3):
        sr = 16000
        x = (0.2 * np.sin(2 * np.pi * (200 + 50 * i) * np.arange(sr) / sr)
             ).astype(np.float32)
        wavfile.write(str(seg_dir / f"s{i}.wav"), sr, (x * 32767).astype(np.int16))

    monkeypatch.chdir(tmp_path)
    out = transcribe.main(
        ["--input", str(seg_dir), "--smoke", "--batch_size", "2",
         "--max_new_tokens", "4", "--detect_language",
         "--output", str(tmp_path / "o.json")]
    )
    assert len(out) == 3
    for r in out:
        assert "language" in r and 0.0 <= r["language_prob"] <= 1.0
