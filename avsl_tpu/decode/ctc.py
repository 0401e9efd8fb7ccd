"""CTC decoding for the AV-HuBERT CTC head.

The reference ships ``AVHuBERTForCTC`` (av_hubert_model.py:866-1066,
blank = pad id) but no decoder for it; this provides best-path (greedy)
decoding — argmax per frame, collapse repeats, drop blanks — plus a
prefix-scored variant that also returns per-sequence log-probabilities.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


def ctc_best_path(
    logits: np.ndarray,  # [B, T, V] (or jax array)
    blank_id: int = 0,
    logit_pad: Optional[np.ndarray] = None,  # [B, T] 1.0 = padded frame
) -> List[List[int]]:
    """Best-path decode: per-frame argmax -> collapse repeats -> drop
    blanks. Padded frames (``logit_pad``) are excluded entirely."""
    logits = np.asarray(logits)
    preds = logits.argmax(axis=-1)  # [B, T]
    out: List[List[int]] = []
    for b in range(preds.shape[0]):
        seq = preds[b]
        if logit_pad is not None:
            seq = seq[np.asarray(logit_pad[b]) < 0.5]
        prev = -1
        toks: List[int] = []
        for t in seq.tolist():
            if t != prev and t != blank_id:
                toks.append(int(t))
            prev = t
        out.append(toks)
    return out


def ctc_best_path_scores(
    logits: np.ndarray,
    blank_id: int = 0,
    logit_pad: Optional[np.ndarray] = None,
) -> Tuple[List[List[int]], np.ndarray]:
    """Best-path decode plus the mean per-frame log-probability of the
    chosen path (a cheap confidence signal for filtering)."""
    logits = np.asarray(logits, np.float32)
    logp = logits - _logsumexp(logits, axis=-1, keepdims=True)
    preds = logp.argmax(axis=-1)
    scores = np.take_along_axis(logp, preds[..., None], axis=-1)[..., 0]  # [B, T]
    seqs = ctc_best_path(logits, blank_id, logit_pad)
    if logit_pad is not None:
        valid = np.asarray(logit_pad) < 0.5
        mean = (scores * valid).sum(-1) / np.maximum(valid.sum(-1), 1)
    else:
        mean = scores.mean(-1)
    return seqs, mean


def _logsumexp(x, axis=-1, keepdims=False):
    m = np.max(x, axis=axis, keepdims=True)
    out = m + np.log(np.sum(np.exp(x - m), axis=axis, keepdims=True))
    return out if keepdims else np.squeeze(out, axis)


def ctc_decode_to_text(
    logits: np.ndarray,
    tokenizer,
    blank_id: int = 0,
    logit_pad: Optional[np.ndarray] = None,
) -> List[str]:
    """Decode straight to text through a tokenizer (special ids dropped)."""
    special = getattr(tokenizer, "special_token_set", set())
    return [
        tokenizer.decode([t for t in seq if t not in special])
        for seq in ctc_best_path(logits, blank_id, logit_pad)
    ]
