"""LoRA: low-rank adaptation for parameter-efficient fine-tuning.

The reference controls fine-tuning cost with three all-or-nothing freeze
regimes (avsl/whisper_flamingo_ft_ami.py:642-651 selects full /
video-projection-only / gated-x-attn-only optimizers). LoRA (Hu et al.,
arXiv 2106.09685) is the TPU-native fourth regime this module adds: the
frozen base weights stay untouched while each targeted kernel ``W`` gets
a trainable low-rank delta ``(alpha/r) * A @ B``; only ``A``/``B`` carry
optimizer state.

Why this shape on TPU:

* **The trainable state is tiny.** At large-v2 dims a rank-8 adapter
  over the attention q/v projections is ~0.15% of the base parameters —
  Adam mirrors, checkpoints, and the host->device upload of the
  *trainable* state shrink by the same factor (checkpoints go from GBs
  to MBs, which matters through rate-limited links).
* **The merge lives inside the jit.** ``merged = W + scale * A @ B`` is
  a rank-r matmul XLA fuses with the consumer; autodiff through it
  yields gradients for ``A``/``B`` only. No module surgery: any flax
  param tree works, the base model code never learns about LoRA.
* **Serving costs zero.** :func:`merge_lora` materializes plain kernels
  once; the served program is byte-identical to a full fine-tune's.

Layout: the adapter tree MIRRORS the base tree's nesting, with each
targeted kernel leaf replaced by ``{"lora_a": [in, r], "lora_b": [r, out]}``
and every untargeted branch absent. That makes the adapter tree a valid
orbax checkpoint, a valid ``TrainState.params``, and trivially mappable
back onto the base tree by path.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# LoRA-paper default: adapt the attention query/value projections.
# Matched against the "/"-joined parameter path.
DEFAULT_TARGETS: Tuple[str, ...] = (r"(q_proj|v_proj)/kernel$",)


from avsl_tpu.core.tree import path_str as _path_str  # noqa: E402


def _match(path: str, regexes) -> bool:
    return any(r.search(path) for r in regexes)


def init_lora(
    rng: jax.Array,
    params: Any,
    rank: int,
    targets: Sequence[str] = DEFAULT_TARGETS,
) -> Any:
    """Build the adapter tree for every 2-D leaf whose path matches a
    target regex. ``lora_a ~ N(0, 1/r)``, ``lora_b = 0`` — so the merged
    model equals the base model at step 0 (the paper's init, which keeps
    the first forward bit-identical to the frozen baseline)."""
    regexes = [re.compile(t) for t in targets]
    leaves = jax.tree_util.tree_leaves_with_path(params)
    matched = [
        (path, leaf)
        for path, leaf in leaves
        if np.ndim(leaf) == 2 and _match(_path_str(path), regexes)
    ]
    if not matched:
        raise ValueError(
            f"no 2-D params matched LoRA targets {list(targets)!r}"
        )
    keys = jax.random.split(rng, len(matched))
    adapters: Dict[str, Any] = {}
    for key, (path, leaf) in zip(keys, matched):
        d_in, d_out = leaf.shape
        adapters[_path_str(path)] = {
            "lora_a": (
                jax.random.normal(key, (d_in, rank), jnp.float32)
                / np.sqrt(rank)
            ),
            "lora_b": jnp.zeros((rank, d_out), jnp.float32),
        }
    # nest the flat path->adapter map back into the base tree's shape so
    # the result is a plain orbax-checkpointable dict tree
    nested: Dict[str, Any] = {}
    for flat_path, ab in adapters.items():
        node = nested
        parts = flat_path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = ab
    return nested


def _is_adapter(x: Any) -> bool:
    return isinstance(x, dict) and set(x.keys()) == {"lora_a", "lora_b"}


def iter_adapters(lora: Any):
    """Yield ``(path_str, {"lora_a", "lora_b"})`` pairs."""

    def walk(node, prefix):
        if _is_adapter(node):
            yield "/".join(prefix), node
            return
        if isinstance(node, dict):
            for k, v in node.items():
                yield from walk(v, prefix + [k])

    yield from walk(lora, [])


def merge_lora(params: Any, lora: Any, alpha: float, rank: int) -> Any:
    """``W' = W + (alpha/rank) * A @ B`` for every adapted kernel; all
    other leaves are passed through by reference (no copy). Call inside
    jit during training (autodiff yields A/B grads only) or once on the
    host to export a plain serving checkpoint."""
    scale = float(alpha) / float(rank)
    adapters = dict(iter_adapters(lora))

    def leaf(path, w):
        ab = adapters.pop(_path_str(path), None)
        if ab is None:
            return w
        delta = (ab["lora_a"] @ ab["lora_b"]) * scale
        return (w + delta.astype(w.dtype)) if w.dtype == delta.dtype else (
            w.astype(jnp.float32) + delta
        ).astype(w.dtype)

    merged = jax.tree_util.tree_map_with_path(leaf, params)
    if adapters:
        raise ValueError(
            f"adapters with no matching base param: {sorted(adapters)[:4]}"
        )
    return merged


def lora_loss_fn(
    base_loss_fn: Callable,
    base_params: Any,
    alpha: float,
    rank: int,
) -> Callable:
    """Wrap a ``loss_fn(params, batch_stats, batch, rng)`` so that
    ``params`` is the ADAPTER tree: the base tree rides along as a
    closure constant (frozen — it never appears in the grad tree, so
    Adam mirrors exist only at adapter size), and the merge happens
    inside the differentiated program."""

    def wrapped(lora, batch_stats, batch, rng):
        merged = merge_lora(base_params, lora, alpha, rank)
        return base_loss_fn(merged, batch_stats, batch, rng)

    return wrapped


def lora_param_count(lora: Any) -> int:
    return int(sum(np.size(x) for x in jax.tree_util.tree_leaves(lora)))


def lora_summary(params: Any, lora: Any) -> Dict[str, Any]:
    base = int(sum(np.size(x) for x in jax.tree_util.tree_leaves(params)))
    n = lora_param_count(lora)
    return {
        "base_params": base,
        "lora_params": n,
        "trainable_fraction": n / max(base, 1),
        "n_adapters": len(list(iter_adapters(lora))),
    }
