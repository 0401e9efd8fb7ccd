"""Weight-only int8 quantization for serving (TPU-native design).

The reference serves fp16 torch weights (Lightning ``precision=16``,
/root/reference/avsl/whisper_flamingo_ft_ami.py:979) and has no
quantization story at all. On TPU the autoregressive decode loop is
HBM-bandwidth-bound — each step streams every decoder weight once per
token — so halving the resident weight bytes (bf16 -> int8) is worth up
to 2x on the decode hot path, and it halves the host->device checkpoint
upload (the measured bottleneck of the tunneled dev backend, see
docs/ENGINEERING_NOTES.md).

Design: **symmetric per-channel int8, dequantized inside the jit**.

* :func:`quantize_tree` replaces eligible float kernels in a param tree
  with :class:`QTensor` leaves (``int8 q`` + broadcastable fp32
  ``scale``); everything else (biases, norms, gates, small leaves) stays
  fp32 — they are a rounding error of the byte budget and quantizing
  them buys nothing.
* :func:`dequantize_tree` maps ``q * scale`` back to the compute dtype.
  Call it INSIDE the jitted program: the weights then live in HBM as
  int8 (that is what the program's input buffers are) and XLA fuses the
  convert+scale into the consumers, so per-step bf16 temps are transient
  tiles, never a resident copy.
* Scales are per-output-channel (the last axis of flax kernels). For
  embedding tables the scale is per ROW instead — a row is both the
  lookup unit and, under weight tying (logits = h @ E^T), the output
  channel of the logit matmul, so per-row is the right granularity for
  both uses.

No calibration pass is needed: weight-only symmetric quantization is
data-free (activations stay bf16).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


class QTensor(flax.struct.PyTreeNode):
    """An int8-quantized tensor: ``dequant = q * scale``.

    ``q`` is int8 with the original shape; ``scale`` is fp32 and
    broadcastable against ``q`` (per-channel, keepdims layout).
    """

    q: jnp.ndarray
    scale: jnp.ndarray

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.q.shape

    @property
    def dtype(self):  # the *logical* dtype callers should see
        return jnp.float32

    def dequantize(self, dtype=jnp.bfloat16) -> jnp.ndarray:
        return (self.q.astype(jnp.float32) * self.scale).astype(dtype)


def _is_qtensor(x: Any) -> bool:
    return isinstance(x, QTensor)


def quantize_array(w: jnp.ndarray, channel_axis: int = -1) -> QTensor:
    """Symmetric per-channel int8: scale = max|w| / 127 over all axes
    except ``channel_axis`` (embedding rows pass ``channel_axis=0``)."""
    w = jnp.asarray(w, jnp.float32)
    axes = tuple(a for a in range(w.ndim) if a != channel_axis % w.ndim)
    amax = jnp.max(jnp.abs(w), axis=axes, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QTensor(q=q, scale=scale)


def quantize_rows(x: jnp.ndarray) -> QTensor:
    """Symmetric int8 with per-ROW scales: absmax over the LAST axis only
    (scale shape ``x.shape[:-1] + (1,)``). The granularity for K/V cache
    entries, where each [b, t, h] row is an independent key/value vector
    and a single outlier row must not degrade every other row's
    resolution (per-tensor scaling does exactly that)."""
    x = jnp.asarray(x, jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return QTensor(q=q, scale=scale)


def quantize_kv_cache(caches: Any) -> Any:
    """int8-compress the STATIC entries of a decode cache built by
    ``init_decode_cache``: the precomputed cross-attention (and Flamingo
    ``xv``) K/V, which the decode loop re-reads in full on every token —
    at the large envelope they are GBs of HBM traffic per step, read-only
    after encode. The incremental ``self`` buffers stay in the compute
    dtype: they are written token-by-token (quantizing would add scale
    bookkeeping per step) and are bounded by the text context, a fraction
    of the audio/video K/V. Attention dequantizes on read
    (models/layers.py) and XLA fuses the convert+scale into the matmul,
    so the int8 buffers ARE the resident form between steps.

    Works on one model's cache list (Whisper or AV-HuBERT seq2seq alike:
    any dict entry holding {"k", "v"} without an "index" is static)."""

    def _one(entry):
        out = {}
        for name, sub in entry.items():
            if (
                isinstance(sub, dict)
                and "index" not in sub
                and "k" in sub
                and "v" in sub
                and not isinstance(sub["k"], QTensor)
            ):
                out[name] = {
                    "k": quantize_rows(sub["k"]),
                    "v": quantize_rows(sub["v"]),
                }
            else:
                out[name] = sub
        return out

    return [_one(e) for e in caches]


def default_predicate(path: str, leaf: Any) -> bool:
    """Quantize float leaves with >= 2 dims and >= 4096 elements, except
    gates (load-bearing scalars) and batch/norm statistics."""
    if not hasattr(leaf, "shape") or not hasattr(leaf, "dtype"):
        return False
    if not jnp.issubdtype(jnp.dtype(leaf.dtype), jnp.floating):
        return False
    if np.ndim(leaf) < 2 or np.size(leaf) < 4096:
        return False
    lowered = path.lower()
    if "gate" in lowered or "batch_stats" in lowered:
        return False
    return True


from avsl_tpu.core.tree import path_str as _path_str  # noqa: E402


def quantize_tree(
    tree: Any,
    predicate: Callable[[str, Any], bool] = default_predicate,
) -> Any:
    """Replace eligible leaves with :class:`QTensor`; structure otherwise
    unchanged, so the tree stays a drop-in for code that only *carries*
    it (the dequantized form is what models consume)."""

    def leaf(path, x):
        if _is_qtensor(x):  # idempotent: never quantize scales of a QTensor
            return x
        p = _path_str(path)
        if not predicate(p, x):
            return x
        axis = 0 if p.endswith("embedding") or p.endswith("label_embs") else -1
        return quantize_array(x, channel_axis=axis)

    return jax.tree_util.tree_map_with_path(leaf, tree, is_leaf=_is_qtensor)


def dequantize_tree(tree: Any, dtype=jnp.bfloat16) -> Any:
    """Materialize the float tree. Call inside jit: the int8 buffers are
    the program inputs (HBM-resident form) and the convert+scale fuses
    into consumers. Non-QTensor leaves pass through untouched (their
    dtype is NOT changed — norms/gates stay fp32 by design)."""
    return jax.tree_util.tree_map(
        lambda x: x.dequantize(dtype) if _is_qtensor(x) else x,
        tree,
        is_leaf=_is_qtensor,
    )


def tree_bytes(tree: Any) -> int:
    """Total leaf bytes (QTensor counts q + scale)."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        total += np.size(leaf) * np.dtype(leaf.dtype).itemsize
    return int(total)


def quantization_report(tree: Any, qtree: Any) -> dict:
    before, after = tree_bytes(tree), tree_bytes(qtree)
    n_q = sum(
        1
        for leaf in jax.tree_util.tree_leaves(
            qtree, is_leaf=_is_qtensor
        )
        if _is_qtensor(leaf)
    )
    return {
        "bytes_fp32": before,
        "bytes_quantized": after,
        "compression": before / max(after, 1),
        "n_quantized_leaves": n_q,
    }
