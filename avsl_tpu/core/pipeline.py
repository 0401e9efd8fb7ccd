"""GPipe-style pipeline parallelism over a ``stage`` mesh axis.

The reference has no pipeline parallelism at all (SURVEY.md §2.8: DDP
only); this module is a TPU-native addition so the framework's scaling
story covers dp x tp x sp x pp. Design, idiomatic to XLA rather than to
torch-style per-rank processes:

* The per-layer parameters of a stack of **identical** transformer blocks
  are stacked on a leading layer axis (``stack_block_params``) and sharded
  layer-wise over a ``stage`` mesh axis — each stage owns
  ``n_layers / n_stages`` contiguous layers.
* ``pipeline_apply`` runs the classic GPipe fill-drain schedule as ONE
  jit-compiled program: a ``lax.scan`` over ticks inside a ``shard_map``
  over the mesh, with microbatch activations handed to the next stage by
  ``lax.ppermute`` ring rotations (XLA lowers these to ICI neighbor
  sends — the TPU equivalent of the NCCL point-to-points a torch pipeline
  would issue).
* The whole schedule is **differentiable**: jax transposes every
  ``ppermute`` for the backward pass, so ``jax.grad`` of a loss through
  ``pipeline_apply`` yields the reverse fill-drain schedule automatically
  — no hand-written backward pipeline.
* Composes with data parallelism: build the mesh with
  ``make_pp_mesh(n, stages)`` (axes ``("data", "stage")``) and the
  microbatch batch dim shards over ``data`` while layers shard over
  ``stage``.

Scheduling note: with M microbatches and S stages the bubble fraction is
(S-1)/(M+S-1); callers pick ``n_microbatches >= 2*S`` to keep the MXU
busy. Bubble ticks process zeros (pre-norm blocks map zeros to finite
values, so no NaNs reach the discarded outputs).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from avsl_tpu.core.mesh import DATA_AXIS

STAGE_AXIS = "stage"

__all__ = [
    "STAGE_AXIS",
    "make_pp_mesh",
    "stack_block_params",
    "unstack_block_params",
    "pipeline_apply",
]


def make_pp_mesh(
    n_devices: Optional[int] = None,
    stages: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """(data, stage) mesh: ``stages`` contiguous devices per pipeline.

    Contiguity keeps the ppermute ring on nearest-neighbor ICI links.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = list(devices)[:n_devices]
    if n_devices % stages != 0:
        raise ValueError(f"n_devices={n_devices} not divisible by stages={stages}")
    grid = np.array(devices).reshape(n_devices // stages, stages)
    return Mesh(grid, (DATA_AXIS, STAGE_AXIS))


def stack_block_params(params: dict, n_layers: int, fmt: str = "block_{}"):
    """Stack per-layer param subtrees ``fmt.format(i)`` into leaves [L, ...].

    Returns ``(stacked, rest)`` where ``rest`` is ``params`` minus the layer
    subtrees (stem convs, final layernorm, ...). The stacked tree matches a
    single layer's structure with a leading layer axis — exactly what
    ``pipeline_apply`` shards over the stage axis.
    """
    names = [fmt.format(i) for i in range(n_layers)]
    missing = [n for n in names if n not in params]
    if missing:
        raise KeyError(f"layer subtrees not found in params: {missing}")
    per_layer = [params[n] for n in names]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer)
    rest = {k: v for k, v in params.items() if k not in set(names)}
    return stacked, rest


def unstack_block_params(stacked, n_layers: int, fmt: str = "block_{}") -> dict:
    """Inverse of :func:`stack_block_params` (checkpoint export)."""
    return {
        fmt.format(i): jax.tree_util.tree_map(lambda a: a[i], stacked)
        for i in range(n_layers)
    }


def _microbatch(tree, n_micro: int):
    def _r(a):
        b = a.shape[0]
        if b % n_micro != 0:
            raise ValueError(f"batch {b} not divisible by n_microbatches={n_micro}")
        return a.reshape(n_micro, b // n_micro, *a.shape[1:])

    return jax.tree_util.tree_map(_r, tree)


def pipeline_apply(
    block_fn: Callable[[Any, jnp.ndarray, Any], jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,
    *,
    mesh: Mesh,
    n_microbatches: int,
    extras: Any = None,
) -> jnp.ndarray:
    """Run ``x`` through a pipelined stack of identical blocks.

    Args:
      block_fn: ``(layer_params, h, extras_mb) -> h`` — pure single-layer
        apply (e.g. a closed-over ``TransformerBlock.apply``). ``extras_mb``
        is the microbatch slice of ``extras`` (masks etc.), or None.
      stacked_params: pytree with leading layer axis [L, ...] (from
        :func:`stack_block_params`); L must divide by the stage count.
      x: [B, ...] activations; B must divide by ``n_microbatches`` and the
        per-microbatch batch by the mesh's data-axis size.
      mesh: a mesh with a ``stage`` axis (and optionally ``data``).
      extras: optional pytree of [B, ...] per-example aux riding along with
        each microbatch (attention masks, lengths, ...).

    Returns [B, ...] outputs, replicated over ``stage`` / sharded over
    ``data`` exactly like the input. Differentiable w.r.t. params, x and
    extras.
    """
    from jax.experimental.shard_map import shard_map

    n_stages = mesh.shape[STAGE_AXIS]
    n_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if n_layers % n_stages != 0:
        raise ValueError(f"{n_layers} layers not divisible by {n_stages} stages")
    has_data = DATA_AXIS in mesh.shape and mesh.shape[DATA_AXIS] > 1

    xm = _microbatch(x, n_microbatches)
    em = _microbatch(extras, n_microbatches) if extras is not None else None

    def _bspec(leaf):
        # [M, mb, ...]: microbatch dim replicated, batch dim over data
        spec = [None] * leaf.ndim
        if has_data and leaf.ndim > 1 and leaf.shape[1] % mesh.shape[DATA_AXIS] == 0:
            spec[1] = DATA_AXIS
        return P(*spec)

    p_spec = jax.tree_util.tree_map(
        lambda leaf: P(STAGE_AXIS, *([None] * (leaf.ndim - 1))), stacked_params
    )
    x_spec = jax.tree_util.tree_map(_bspec, xm)
    e_spec = jax.tree_util.tree_map(_bspec, em) if em is not None else None
    out_spec = _bspec(jax.tree_util.tree_leaves(xm)[0])

    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def body(p_local, xm_local, em_local):
        stage = jax.lax.axis_index(STAGE_AXIS)
        m = xm_local.shape[0]

        def _pad_ticks(a):
            # bubble-drain ticks: S-1 zero microbatches after the real ones
            z = jnp.zeros((n_stages - 1, *a.shape[1:]), a.dtype)
            return jnp.concatenate([a, z], axis=0)

        xs = _pad_ticks(xm_local)
        es = (
            jax.tree_util.tree_map(_pad_ticks, em_local)
            if em_local is not None
            else None
        )

        state_h = jnp.zeros_like(xs[0])
        state_e = (
            jax.tree_util.tree_map(lambda a: jnp.zeros_like(a[0]), es)
            if es is not None
            else None
        )

        def tick(carry, inp):
            h, e = carry
            h_in, e_in = inp
            ingest = stage == 0
            h = jnp.where(ingest, h_in, h)
            if e is not None:
                e = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(ingest, a, b), e_in, e
                )

            def layer(carry_h, lp):
                return block_fn(lp, carry_h, e), None

            h, _ = jax.lax.scan(layer, h, p_local)
            out = h
            h = jax.lax.ppermute(h, STAGE_AXIS, perm)
            if e is not None:
                e = jax.tree_util.tree_map(
                    lambda a: jax.lax.ppermute(a, STAGE_AXIS, perm), e
                )
            return (h, e), out

        (_, _), ys = jax.lax.scan(tick, (state_h, state_e), (xs, es))
        # microbatch m exits the last stage at tick m + (S-1)
        outs = ys[n_stages - 1 : n_stages - 1 + m]
        # hand the last stage's outputs to every stage (masked psum — the
        # other stages contribute zeros, so this is a broadcast, not a sum)
        outs = jax.lax.psum(
            jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs)),
            STAGE_AXIS,
        )
        return outs

    mapped = shard_map(
        body,
        mesh=mesh,
        in_specs=(p_spec, x_spec, e_spec),
        out_specs=out_spec,
        check_rep=False,
    )
    out = mapped(stacked_params, xm, em)
    return out.reshape(x.shape[0], *out.shape[2:])
