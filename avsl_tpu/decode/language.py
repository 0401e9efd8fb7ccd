"""Whisper language identification: one decode step from ``<|sot|>``.

The reference pins the language in its YAML (``lang: en``,
config/ami_whisper_flamingo_large.yaml) and cannot auto-detect; upstream
Whisper's ``detect_language`` does this with a single forward — the
distribution over the language tokens right after ``<|sot|>`` IS the
language posterior. TPU-shaped: one jittable program over the whole
batch, returning the full [B, n_langs] posterior so callers can threshold
or mix instead of trusting a hard argmax.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp


def detect_language_logits(
    model, variables, mel: jnp.ndarray, sot_id: int,
    lang_token_ids: jnp.ndarray,
) -> jnp.ndarray:
    """Jit-friendly core: encode ``mel`` [B, n_mels, T], decode ONE step
    from ``<|sot|>`` (the token before the language slot), and gather the
    logits of ``lang_token_ids`` [L]. Returns [B, L] float32."""
    feats, _ = model.apply(variables, mel, None, method=model.encode)
    cache = model.apply(
        variables, feats, None, 4, method=model.init_decode_cache
    )
    sot = jnp.full((mel.shape[0], 1), sot_id, jnp.int32)
    logits, _ = model.apply(
        variables, sot, None, None, cache, method=model.decode
    )
    return logits[:, -1].astype(jnp.float32)[:, lang_token_ids]


def detect_language(
    model, variables, tokenizer, audio: jnp.ndarray
) -> List[Tuple[str, Dict[str, float]]]:
    """Detect the spoken language of each clip in ``audio`` [B, S]
    (16 kHz float PCM). Returns per-clip ``(best_lang, {lang: prob})``
    with probabilities normalized over the tokenizer's language set."""
    from avsl_tpu.data.tokenizer import WHISPER_ALL_LANGS, WHISPER_LANGS
    from avsl_tpu.kernels import log_mel_spectrogram

    langs = [
        l for l in (*WHISPER_ALL_LANGS, *WHISPER_LANGS)
        if f"<|{l}|>" in tokenizer.special_tokens
    ]
    langs = list(dict.fromkeys(langs))  # ordered dedup
    if not langs:
        raise ValueError("tokenizer has no language tokens")
    ids = jnp.asarray(
        [tokenizer.special_tokens[f"<|{l}|>"] for l in langs], jnp.int32
    )
    sot_id = int(tokenizer.sot)

    @jax.jit
    def run(a):
        mel = log_mel_spectrogram(a, n_mels=model.cfg.n_mels)
        return jax.nn.softmax(
            detect_language_logits(model, variables, mel, sot_id, ids),
            axis=-1,
        )

    probs = jax.device_get(run(audio))
    out = []
    for row in probs:
        table = {l: float(p) for l, p in zip(langs, row)}
        out.append((max(table, key=table.get), table))
    return out
