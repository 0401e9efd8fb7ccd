"""Parameter EMA + checkpoint averaging ("model soups").

The reference keeps only raw optimizer iterates (its Lightning
ModelCheckpoint saves top-k by val WER, whisper_flamingo_ft_ami.py's
callbacks) — no weight averaging of any kind. Two standard averaging
tools, both TPU-trivially cheap:

* :func:`ema_update` — exponential moving average of the parameter tree,
  one fused tree_map per step (XLA folds it into the update step when
  called inside the jitted train step). Evaluating/serving EMA weights
  typically beats the raw iterate late in training.
* :func:`average_checkpoint_steps` — uniform average of N saved
  checkpoints (Utans 1996 / "model soups"): a cheap post-hoc ensemble
  that needs no extra training. Exposed as
  ``python -m avsl_tpu.cli.avg_ckpt``.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp


def ema_update(ema: Any, new: Any, decay: float) -> Any:
    """``ema * decay + new * (1 - decay)`` leafwise; float leaves only
    (int leaves — e.g. step counters — pass through from ``new``)."""

    def leaf(e, n):
        if hasattr(e, "dtype") and jnp.issubdtype(e.dtype, jnp.floating):
            return (e * decay + n.astype(e.dtype) * (1.0 - decay)).astype(e.dtype)
        return n

    return jax.tree_util.tree_map(leaf, ema, new)


def tree_average(trees: Sequence[Any]) -> Any:
    """Uniform mean over a list of identically-shaped pytrees. Float
    leaves are averaged in float32 then cast back to the first tree's
    leaf dtype; non-float leaves are taken from the first tree."""
    if not trees:
        raise ValueError("nothing to average")

    def leaf(*xs):
        x0 = xs[0]
        if hasattr(x0, "dtype") and jnp.issubdtype(
            jnp.asarray(x0).dtype, jnp.floating
        ):
            acc = sum(jnp.asarray(x, jnp.float32) for x in xs)
            return (acc / len(xs)).astype(jnp.asarray(x0).dtype)
        return x0

    return jax.tree_util.tree_map(leaf, *trees)


def average_checkpoint_steps(
    directory: str,
    state_template: Any,
    steps: Optional[Sequence[int]] = None,
    last_k: Optional[int] = None,
) -> Any:
    """Load ``steps`` (or the newest ``last_k``) checkpoints from an
    orbax directory and return ``(state, used_steps)``: a state whose
    params (and batch_stats, when present) are the uniform average, and
    the sorted step list that actually contributed (callers report it
    rather than re-deriving the selection). opt_state/step come from the
    NEWEST contributor so training could even resume from the soup."""
    from avsl_tpu.train.checkpoints import all_steps, restore_checkpoint

    available = all_steps(directory)
    if not available:
        raise ValueError(f"no checkpoints under {directory!r}")
    if steps is None:
        k = last_k or len(available)
        steps = available[-k:]
    missing = sorted(set(steps) - set(available))
    if missing:
        raise ValueError(f"steps {missing} not in {available}")

    used = sorted(steps)
    states: List[Any] = [
        restore_checkpoint(directory, state_template, step=s) for s in used
    ]
    newest = states[-1]
    avg_params = tree_average([s.params for s in states])
    out = newest.replace(params=avg_params)
    if getattr(newest, "batch_stats", None) is not None:
        out = out.replace(
            batch_stats=tree_average([s.batch_stats for s in states])
        )
    return out, used
