"""SPMD train/eval steps: one jit program per mesh, DDP-as-sharding.

The reference trains with Lightning DDP (one process per GPU, NCCL
all-reduce — whisper_flamingo_ft_ami.py:928) and host-side gradient
accumulation (``accumulate_grad_batches=16``). The TPU-native equivalent
here:

* the global batch is **sharded over the mesh's `data` axis**; parameters
  are replicated. Under jit, XLA partitions the loss/grad computation and
  inserts the gradient all-reduce over ICI itself — there is no explicit
  collective in user code.
* **gradient accumulation is a `lax.scan`** over a leading micro-batch
  axis inside the same jit program (batch shaped [accum, micro, ...]),
  so accumulation costs no host round-trips.
* bf16 activations / fp32 params + optimizer state; BatchNorm stats are
  carried in the state and updated functionally.
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from avsl_tpu.core.mesh import DATA_AXIS, MODEL_AXIS, activation_sharding_scope


def _sp_scope(mesh: Optional[Mesh], sequence_parallel: Optional[bool]):
    """Activation-sharding (sequence-parallel) scope for a step trace.

    The SP intent is part of the STEP FUNCTION, not of the caller's
    context: the scope is entered inside the traced body, so every trace
    of the returned step carries the constraints — a step first traced
    from an unscoped call site can no longer silently cache a
    constraint-free program (the round-2/3 ADVICE hazard).
    ``sequence_parallel=None`` auto-enables when the mesh has a model
    axis > 1."""
    if sequence_parallel is None:
        sequence_parallel = (
            mesh is not None and mesh.shape.get(MODEL_AXIS, 1) > 1
        )
    if not sequence_parallel or mesh is None:
        return contextlib.nullcontext()
    return activation_sharding_scope(mesh)


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any = None
    rng: Optional[jax.Array] = None

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, batch_stats=None,
               rng: Optional[jax.Array] = None) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            batch_stats=batch_stats,
            rng=rng if rng is not None else jax.random.PRNGKey(0),
        )


# loss_fn(params, batch_stats, batch, rng) ->
#   (loss, (metrics dict, new_batch_stats or None))
LossFn = Callable[[Any, Any, Any, jax.Array], Tuple[jnp.ndarray, Tuple[Dict, Any]]]


_is_none = lambda x: x is None  # noqa: E731


def split_trainable(params: Any, labels: Any) -> Tuple[Any, Any]:
    """Split a param tree into (trainable, frozen) by TRAIN/FROZEN labels.

    Frozen positions become ``None`` leaves in the trainable tree and vice
    versa; :func:`merge_trainable` reassembles the full tree."""
    from avsl_tpu.train.optim import TRAIN

    trainable = jax.tree_util.tree_map(
        lambda p, l: p if l == TRAIN else None, params, labels
    )
    frozen = jax.tree_util.tree_map(
        lambda p, l: None if l == TRAIN else p, params, labels
    )
    return trainable, frozen


def merge_trainable(trainable: Any, frozen: Any) -> Any:
    """Inverse of :func:`split_trainable` (None leaves fill from the other)."""
    return jax.tree_util.tree_map(
        lambda t, f: f if t is None else t, trainable, frozen,
        is_leaf=_is_none,
    )


def make_train_step(
    loss_fn: LossFn,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    grad_accum_steps: int = 1,
    donate: bool = True,
    partitioned_state: bool = False,
    state_constraint_fn: Optional[Callable[[Any], Any]] = None,
    sequence_parallel: Optional[bool] = None,
    param_labels: Any = None,
    precompute_fn: Optional[Callable[..., Any]] = None,
    split_precompute: bool = False,
):
    """Build a jit-compiled SPMD train step.

    The returned function takes ``(state, batch)`` where each batch leaf is
    ``[global_batch, ...]`` (or ``[accum, global_micro, ...]`` when
    ``grad_accum_steps > 1``) and returns ``(state, metrics)``.

    ``sequence_parallel``: shard activations [batch->data, time->model]
    between transformer blocks while the step traces (see
    core/mesh.activation_sharding_scope). Default: auto — on whenever the
    mesh has a model axis > 1. The scope is part of the traced step body,
    so callers never need to (and should not) wrap step calls themselves.

    ``param_labels``: optional TRAIN/FROZEN tree (from
    ``train.optim.select_optimizer``). When given, the step differentiates
    **only the trainable subtree** — the reference's ``requires_grad=False``
    freeze (whisper_flamingo_ft_ami.py:506-517) as torch autograd actually
    executes it: no backward pass is built through frozen-only subgraphs
    (XLA dead-code-eliminates e.g. the whole AV-HuBERT frontend backward
    under the flamingo regime), and the grad-accumulation carry holds only
    trainable-sized gradients. Updates are identical to the label-less
    step (the optimizer's ``set_to_zero`` partition sees zeros either way).

    ``precompute_fn(params, batch_stats, batch, rng) -> ctx``: optional
    frozen-subgraph hoist. Runs ONCE per step, outside ``value_and_grad``
    and outside the grad-accumulation scan, on the FULL stacked batch
    (leading ``[accum, micro, ...]`` axes when accumulating); must return
    a dict of arrays with a leading ``[accum, ...]`` axis (or plain
    ``[...]`` when ``grad_accum_steps == 1``) that is merged into each
    micro-batch dict before ``loss_fn`` sees it. The canonical user is
    :func:`avsl_tpu.train.objectives.flamingo_tower_precompute`, which
    batches the FROZEN Whisper-encoder + AV-HuBERT tower forwards over
    all accumulation micro-steps in one program (16 separate B=1 tower
    forwards become one B=16 forward; no backward exists for them under
    the freeze regime either way, so gradients are unchanged). Only valid
    when everything the precompute computes is actually frozen — callers
    gate on the freeze regime (train/runner.py).

    ``split_precompute=True`` compiles the precompute as its OWN jitted
    program and returns ``(step, pre)`` where ``ctx = pre(state, batch)``
    feeds ``step(state, batch, ctx)``. Numerically identical to the fused
    form (both derive the same precompute rng from ``state.rng``); the
    context stays on device between the two programs. Two smaller
    programs compile far more predictably than one giant one (tunneled
    compile services showed pathological multi-10-minute compiles on the
    fused hoisted step), and per-program XLA cost analysis stays
    attributable (the grad-accum scan-body x trip-count correction must
    NOT scale the hoisted towers). Costs one extra dispatch per step.
    """
    sp_ctx = lambda: _sp_scope(mesh, sequence_parallel)  # noqa: E731

    def _grads_one(diff_params, frozen, batch_stats, micro, rng):
        def _loss(tr, stats, mb, key):
            full = merge_trainable(tr, frozen) if frozen is not None else tr
            return loss_fn(full, stats, mb, key)

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            _loss, has_aux=True
        )(diff_params, batch_stats, micro, rng)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return grads, metrics, new_stats

    def step_fn(state: TrainState, batch, ctx_in=None) -> Tuple[TrainState, Dict]:
        rng, new_rng = jax.random.split(state.rng)

        if param_labels is not None:
            diff_params, frozen = split_trainable(state.params, param_labels)
        else:
            diff_params, frozen = state.params, None

        ctx = ctx_in
        if precompute_fn is not None:
            # consume the pre-key slot in BOTH modes so the downstream rng
            # chain (and the split pre program's key derivation) agree
            rng, pre_key = jax.random.split(rng)
            if ctx is None:
                ctx = precompute_fn(state.params, state.batch_stats, batch, pre_key)

        if grad_accum_steps > 1:
            def scan_body(carry, xs):
                micro, ctx_i = xs
                if ctx_i is not None:
                    micro = {**micro, **ctx_i}
                grads_acc, stats, key = carry
                key, sub = jax.random.split(key)
                grads, metrics, new_stats = _grads_one(
                    diff_params, frozen, stats, micro, sub
                )
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                return (grads_acc, new_stats if new_stats is not None else stats, key), metrics

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, diff_params)
            (grads, new_stats, _), metrics = jax.lax.scan(
                scan_body, (zero_grads, state.batch_stats, rng), (batch, ctx)
            )
            grads = jax.tree_util.tree_map(lambda g: g / grad_accum_steps, grads)
            metrics = jax.tree_util.tree_map(jnp.mean, metrics)
        else:
            grads, metrics, new_stats = _grads_one(
                diff_params, frozen, state.batch_stats,
                {**batch, **ctx} if ctx is not None else batch, rng
            )
            # LossFn contract: new_batch_stats may be None (no update);
            # the accum scan keeps the old stats in that case — mirror it
            if new_stats is None:
                new_stats = state.batch_stats

        if param_labels is not None:
            # the optimizer interface wants a full-structure grad tree;
            # frozen positions get symbolic zeros (XLA folds `p + 0`)
            grads = jax.tree_util.tree_map(
                lambda g, p: jnp.zeros_like(p) if g is None else g,
                grads, state.params, is_leaf=_is_none,
            )

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=new_stats,
            rng=new_rng,
        )
        return new_state, metrics

    _inner_step = step_fn
    split = bool(split_precompute) and precompute_fn is not None

    def step_fn(state, batch, ctx_in=None):  # noqa: F811 — scoped wrapper
        with sp_ctx():
            return _inner_step(state, batch, ctx_in)

    def pre_fn(state, batch):
        # identical key derivation to the fused path: step consumes
        # (new_rng, pre_key) off state.rng in that order
        rng, _new = jax.random.split(state.rng)
        _rng, pre_key = jax.random.split(rng)
        with sp_ctx():
            return precompute_fn(state.params, state.batch_stats, batch, pre_key)

    def _finish(step_jitted):
        if not split:
            return step_jitted
        return step_jitted, jax.jit(pre_fn)

    if mesh is None:
        if split:
            return _finish(jax.jit(
                step_fn, donate_argnums=(0,) if donate else ()
            ))
        return jax.jit(
            lambda state, batch: step_fn(state, batch),
            donate_argnums=(0,) if donate else (),
        )

    replicated = NamedSharding(mesh, P())
    # batch leaves sharded on the data axis: dim 0 for plain batches, dim 1
    # when a grad-accum leading axis is present.
    batch_dim = 1 if grad_accum_steps > 1 else 0

    def batch_sharding(leaf):
        spec = [None] * leaf.ndim
        if leaf.ndim > batch_dim:
            spec[batch_dim] = DATA_AXIS
        return NamedSharding(mesh, P(*spec))

    def sharded_step(state, batch, ctx_in=None):
        batch = jax.lax.with_sharding_constraint(
            batch, jax.tree_util.tree_map(batch_sharding, batch)
        )
        new_state, metrics = step_fn(state, batch, ctx_in)
        if state_constraint_fn is not None:
            # pin the OUTPUT state to the rule layout: under ZeRO-1 the
            # elementwise Adam update mixes replicated params with
            # data-sharded mu/nu, and unconstrained propagation may flip
            # new_params to data-sharded — which is still correct but
            # re-gathers the params every microbatch of the NEXT step
            # instead of gathering the update once
            new_state = jax.lax.with_sharding_constraint(
                new_state, state_constraint_fn(new_state)
            )
        return new_state, metrics

    if partitioned_state:
        # tensor-parallel state: shard via core.partitioning.shard_state
        # beforehand; jit propagates the input shardings (no forced
        # replication), XLA inserts the tp collectives
        if split:
            return _finish(jax.jit(
                sharded_step, donate_argnums=(0,) if donate else ()
            ))
        return jax.jit(
            lambda state, batch: sharded_step(state, batch),
            donate_argnums=(0,) if donate else (),
        )
    if split:
        return _finish(jax.jit(
            sharded_step,
            in_shardings=(replicated, None, None),
            out_shardings=(replicated, replicated),
            donate_argnums=(0,) if donate else (),
        ))
    return jax.jit(
        lambda state, batch: sharded_step(state, batch),
        in_shardings=(replicated, None),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(
    loss_fn: LossFn,
    mesh: Optional[Mesh] = None,
    partitioned_state: bool = False,
    sequence_parallel: Optional[bool] = None,
):
    """Jit eval step: returns metrics only (no grads, deterministic rng).

    ``partitioned_state=True`` (tensor/expert-parallel states) propagates
    the state's own input shardings instead of forcing replication — a
    TP-sharded model that only fits sharded must NOT be all-gathered to
    every chip just to evaluate. ``sequence_parallel`` as in
    :func:`make_train_step` (part of the traced body)."""

    def step_fn(state: TrainState, batch) -> Dict:
        with _sp_scope(mesh, sequence_parallel):
            loss, (metrics, _) = loss_fn(
                state.params, state.batch_stats, batch, jax.random.PRNGKey(0)
            )
        metrics = dict(metrics)
        metrics["loss"] = loss
        return metrics

    if mesh is None:
        return jax.jit(step_fn)
    replicated = NamedSharding(mesh, P())

    def batch_sharding(leaf):
        spec = [None] * leaf.ndim
        if leaf.ndim > 0:
            spec[0] = DATA_AXIS
        return NamedSharding(mesh, P(*spec))

    def sharded_step(state, batch):
        batch = jax.lax.with_sharding_constraint(
            batch, jax.tree_util.tree_map(batch_sharding, batch)
        )
        return step_fn(state, batch)

    state_in = None if partitioned_state else replicated
    return jax.jit(
        sharded_step, in_shardings=(state_in, None), out_shardings=replicated
    )
