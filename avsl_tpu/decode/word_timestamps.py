"""Whisper word-level timestamps from cross-attention alignment (DTW).

The CTC aligner (decode/ctc.py) covers the AV-HuBERT stack; this is the
flagship Whisper(-Flamingo) counterpart, the method OpenAI's
word_timestamps=True uses: teacher-force the transcript, capture the
decoder's cross-attention weights over the audio frames, and trace the
minimum-cost monotone path through the token x frame matrix with dynamic
time warping. The reference has no alignment capability of any kind.

TPU shape of the capture: the decoder's cross-attention normally runs
the fused (flash-style) kernel which never materializes weights. The
attention layer sows them into a DEDICATED flax ``alignment``
collection, mutable only in the alignment forward — production forwards
(and the training losses, whose ``intermediates`` collection is mutable
for MoE aux stats) keep the fused path and zero overhead; the alignment
pass (one teacher-forced forward, mutable=["alignment"]) pays the
materialized [B,H,Q,K] einsum once.

Frame rate: Whisper's encoder emits one frame per 20 ms (two 10 ms mel
hops per conv-stride-2 step), so ``frame_rate_hz=50`` by default.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np


def dtw_path(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Minimum-cost monotone path through ``cost`` [Q, K] from (0, 0) to
    (Q-1, K-1); steps are (1,0), (0,1), (1,1). Returns (rows, cols) of
    the path, each non-decreasing. Plain O(QK) host DP."""
    q, k = cost.shape
    acc = np.full((q + 1, k + 1), np.inf)
    acc[0, 0] = 0.0
    step = np.zeros((q, k), np.int8)  # 0: diag, 1: up(row-1), 2: left(col-1)
    for i in range(q):
        prev_row = acc[i]
        cur_row = acc[i + 1]
        for j in range(k):
            cands = (prev_row[j], prev_row[j + 1], cur_row[j])
            s = int(np.argmin(cands))
            step[i, j] = s
            cur_row[j + 1] = cands[s] + cost[i, j]
    rows, cols = [], []
    i, j = q - 1, k - 1
    while i >= 0 and j >= 0:
        rows.append(i)
        cols.append(j)
        s = step[i, j]
        if s == 0:
            i, j = i - 1, j - 1
        elif s == 1:
            i -= 1
        else:
            j -= 1
    return np.asarray(rows[::-1]), np.asarray(cols[::-1])


def _median_filter(x: np.ndarray, width: int) -> np.ndarray:
    """Median filter along the last axis (odd width; edge-padded)."""
    if width <= 1:
        return x
    pad = width // 2
    xp = np.concatenate(
        [np.repeat(x[..., :1], pad, -1), x, np.repeat(x[..., -1:], pad, -1)],
        axis=-1,
    )
    windows = np.stack([xp[..., i: i + x.shape[-1]] for i in range(width)], 0)
    return np.median(windows, axis=0)


def attention_token_spans(
    weights: np.ndarray,  # [H, Q, K] cross-attention over audio frames
    n_frames: int,
    median_width: int = 7,
) -> List[Tuple[int, int]]:
    """Head-averaged, per-head-normalized attention -> DTW -> per-token
    frame spans (end exclusive). ``n_frames`` crops encoder padding."""
    w = np.asarray(weights, np.float64)[..., :n_frames]
    # per-head standardization over the frame axis (Whisper's recipe):
    # heads with diffuse attention contribute less after normalization
    mu = w.mean(-1, keepdims=True)
    sd = w.std(-1, keepdims=True) + 1e-9
    w = ((w - mu) / sd).mean(0)  # [Q, K]
    w = _median_filter(w, median_width)
    rows, cols = dtw_path(-w)
    spans: List[Optional[List[int]]] = [None] * w.shape[0]
    for r, c in zip(rows.tolist(), cols.tolist()):
        if spans[r] is None:
            spans[r] = [c, c + 1]
        else:
            spans[r][1] = c + 1
    return [tuple(s) for s in spans]  # every row is visited by DTW


def collect_cross_attention(intermediates: Dict[str, Any]) -> np.ndarray:
    """Stack every decoder block's sown ``cross_attn/attn_weights``
    ([B,H,Q,K] each) into [L*H, B, Q, K] -> caller picks batch item.
    Flamingo's video x_attn weights are deliberately excluded — words
    align to AUDIO frames."""
    mats = []

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + [k])
        else:
            if "cross_attn" in path and path[-1] == "attn_weights":
                # sow stores a tuple; the LAST entry is this pass's
                # capture — earlier entries are stale (model.init makes
                # every collection mutable, so an init-time capture can
                # ride inside `variables` and get appended to) or remat
                # re-trace duplicates
                leaf = node[-1] if isinstance(node, (tuple, list)) else node
                mats.append(np.asarray(leaf, np.float32))

    walk(intermediates, [])
    if not mats:
        raise ValueError(
            "no cross_attn/attn_weights sown — run apply with "
            'mutable=["alignment"]'
        )
    stacked = np.stack(mats)  # [L, B, H, Q, K]
    L, B, H, Q, K = stacked.shape
    return stacked.transpose(1, 0, 2, 3, 4).reshape(B, L * H, Q, K)


def whisper_word_timestamps(
    model,
    variables,
    mel,
    tokens,
    tokenizer,
    n_frames: Optional[Sequence[int]] = None,
    video=None,
    frame_rate_hz: float = 50.0,
    median_width: int = 7,
) -> List[List[dict]]:
    """Teacher-forced alignment pass -> per-item word timestamps.

    ``mel`` [B, n_mels, T], ``tokens`` [B, L] the FULL decoded sequence
    (SOT prompt + text + EOT). ``n_frames``: true encoder frames per item
    (defaults to all). Returns ``words[b] = [{"word", "start_s",
    "end_s"}]`` via the same BPE word grouping as the CTC aligner."""
    import jax.numpy as jnp

    from avsl_tpu.decode.ctc import word_alignments

    kwargs = {} if video is None else {"video": video}
    _, inter = model.apply(
        variables, jnp.asarray(mel), jnp.asarray(tokens),
        mutable=["alignment"], **kwargs,
    )
    per_item = collect_cross_attention(inter["alignment"])
    tokens = np.asarray(tokens)
    B, _, Q, K = per_item.shape
    out: List[List[dict]] = []
    special = tokenizer.special_token_set
    eot = int(tokenizer.eot)
    for b in range(B):
        nf = K if n_frames is None else int(n_frames[b])
        toks = [int(t) for t in tokens[b]]
        # crop at the first EOT (inclusive: it absorbs trailing frames as
        # the DTW terminal) — padded EOT rows beyond it would otherwise
        # steal the last word's end frames, since the monotone path must
        # finish on the LAST row at the last frame
        q_end = (toks.index(eot) + 1) if eot in toks else len(toks)
        spans = attention_token_spans(
            per_item[b][:, :q_end, :], nf, median_width
        )
        out.append(word_alignments(
            toks[:q_end], spans, tokenizer,
            frame_rate_hz=frame_rate_hz, special_ids=special,
        ))
    return out
