"""Parameter partitioning rules: tensor-parallel shardings over the mesh.

The reference is data-parallel only (SURVEY.md §2.8); this module is the
"design the mesh so a model axis can be added later" part done now:
path-pattern rules map every parameter (and its optimizer-state mirrors)
to a PartitionSpec over the (data, model) mesh — the Megatron-style
column/row split for attention and MLP blocks:

* fc1 / q,k,v projections: column-parallel  [d, F] -> P(None, 'model')
* fc2 / out projections:   row-parallel     [F, d] -> P('model', None)
* embeddings: vocab-sharded                 [V, d] -> P('model', None)
* everything else (norms, biases of row-parallel layers, convs): replicated

XLA's SPMD partitioner inserts the all-reduces between column- and
row-parallel matmuls; with model_parallel=1 every spec collapses to
replicated and the step is pure DP. A rule only applies when the sharded
dim is divisible by the mesh axis size — otherwise the leaf silently
falls back to replication (small models stay valid on any mesh).
"""

from __future__ import annotations

import re
from typing import Any, List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from avsl_tpu.core.mesh import DATA_AXIS, MODEL_AXIS

EXPERT_AXIS = "expert"

# (path regex, spec builder) — first match wins. Specs reference dims of
# the *kernel layout used by this framework* (flax conventions).
DEFAULT_RULES: List[Tuple[str, P]] = [
    # MoE expert blocks (models/moe.py): expert dim over the "expert" axis,
    # hidden dim over "model" (ep x tp compose); the router replicates so
    # every data shard routes its own tokens. On meshes without an
    # "expert" axis the expert dim falls back to replicated per-axis.
    (r"mlp/w_in$", P(EXPERT_AXIS, None, MODEL_AXIS)),
    (r"mlp/b_in$", P(EXPERT_AXIS, MODEL_AXIS)),
    (r"mlp/w_out$", P(EXPERT_AXIS, MODEL_AXIS, None)),
    (r"mlp/b_out$", P(EXPERT_AXIS, None)),
    (r"mlp/router$", P()),
    (r"(mlp|x_mlp)/fc1/kernel$", P(None, MODEL_AXIS)),
    (r"(mlp|x_mlp)/fc1/bias$", P(MODEL_AXIS)),
    (r"(mlp|x_mlp)/fc2/kernel$", P(MODEL_AXIS, None)),
    (r"(q_proj|k_proj|v_proj)/kernel$", P(None, MODEL_AXIS)),
    (r"(q_proj|k_proj|v_proj)/bias$", P(MODEL_AXIS)),
    (r"out_proj/kernel$", P(MODEL_AXIS, None)),
    (r"token_embedding/embedding$", P(MODEL_AXIS, None)),
    (r"embed_tokens/embedding$", P(MODEL_AXIS, None)),
    # vocab-dim classifier heads (CTC): column-parallel; XLA all-gathers
    # the logits for the loss
    (r"ctc_head/kernel$", P(None, MODEL_AXIS)),
    (r"ctc_head/bias$", P(MODEL_AXIS)),
    # pretraining head (models/pretrain.py): projection column-parallel;
    # the cluster codebook shards over classes like a vocab embedding —
    # the [B,T,d]x[C,d] logit matmul then reduces per-shard and XLA
    # all-gathers the class dim for the softmax
    (r"final_proj/kernel$", P(None, MODEL_AXIS)),
    (r"final_proj/bias$", P(MODEL_AXIS)),
    (r"label_embs$", P(MODEL_AXIS, None)),
]


from avsl_tpu.core.tree import path_str as _path_str  # noqa: E402


def spec_for(path: str, shape: Tuple[int, ...], mesh: Mesh,
             rules: Sequence[Tuple[str, P]] = DEFAULT_RULES) -> P:
    """PartitionSpec for one leaf.

    Each mesh axis named in the matching rule is validated independently:
    an axis absent from the mesh (or of size 1, or whose dim does not
    divide it) is dropped from the spec — so the same rule table serves
    tp-only, ep-only, and ep x tp meshes, and small models stay valid on
    any mesh. A rule whose axes all drop (or no rule at all) replicates."""
    for pat, spec in rules:
        if re.search(pat, path):
            if len(spec) > len(shape):
                return P()
            fixed = []
            for d, axis in enumerate(spec):
                n = mesh.shape.get(axis, 1) if axis is not None else 1
                fixed.append(axis if n > 1 and shape[d] % n == 0 else None)
            return P(*fixed) if any(a is not None for a in fixed) else P()
    return P()


# leaves smaller than this stay replicated under zero1/fsdp — sharding a
# tiny bias trades nothing in memory for collective latency
ZERO1_MIN_ELEMS = 65536


def _add_data_axis(spec: P, shape: Tuple[int, ...], mesh: Mesh) -> P:
    """ZeRO-1 refinement of a TP spec: put the data axis on the first
    free dim it divides. No free divisible dim -> spec unchanged."""
    dp = mesh.shape.get(DATA_AXIS, 1)
    if dp <= 1:
        return spec
    fixed = list(spec) + [None] * (len(shape) - len(spec))
    for d, axis in enumerate(fixed):
        if axis is None and shape[d] % dp == 0:
            fixed[d] = DATA_AXIS
            return P(*fixed)
    return spec


def state_shardings(state: Any, mesh: Mesh,
                    rules: Sequence[Tuple[str, P]] = DEFAULT_RULES,
                    zero1: bool = False, fsdp: bool = False) -> Any:
    """Sharding pytree for a TrainState (params + optimizer mirrors).

    Optimizer-state leaves (adam mu/nu) carry the same trailing param path,
    so the same rules shard them identically; scalars replicate.

    ``zero1=True`` additionally shards OPTIMIZER-state leaves (and only
    those — params stay replicated over data) across the ``data`` mesh
    axis on their first free divisible dim: the ZeRO stage-1 memory split.
    Params enter the Adam update replicated, mu/nu enter data-sharded, so
    XLA partitions the elementwise update over the data axis and inserts
    ONE all-gather of the param-sized update tensor per step — the same
    communication ZeRO-1 pays — while each chip stores only 1/dp of the
    fp32 mu/nu (8 bytes/param at the reference's large envelope). The
    reference has no optimizer sharding of any kind (Lightning DDP
    replicates Adam state per GPU).

    ``fsdp=True`` shards EVERY large leaf — params, Adam mirrors, EMA —
    across the ``data`` axis the same way: the ZeRO stage-3 / fully-
    sharded-data-parallel memory split, TPU-style. No hand-written
    gather/scatter: parameters are *stored* data-sharded, XLA's SPMD
    partitioner all-gathers each weight at its use site in the forward
    and backward (re-gathering under remat) and, because the output
    state is constrained back to this layout, reduce-scatters the
    gradients instead of all-reducing them — exactly FSDP's collective
    schedule, derived entirely from sharding annotations. Per-chip
    memory is ~(params + grads + opt)/dp; composes with TP (the data
    axis lands on a free dim of TP-sharded leaves). Subsumes zero1."""

    def leaf(path, x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return NamedSharding(mesh, P())
        p = _path_str(path)
        spec = spec_for(p, x.shape, mesh, rules)
        if x.size >= ZERO1_MIN_ELEMS and (
            fsdp or (zero1 and p.startswith("opt_state"))
        ):
            spec = _add_data_axis(spec, x.shape, mesh)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf, state)


def shard_state(state: Any, mesh: Mesh,
                rules: Sequence[Tuple[str, P]] = DEFAULT_RULES,
                zero1: bool = False, fsdp: bool = False) -> Any:
    """device_put the whole train state onto the mesh per the rules."""
    shardings = state_shardings(state, mesh, rules, zero1=zero1, fsdp=fsdp)
    # one batched transfer: device_put accepts (pytree, sharding pytree)
    # natively and coalesces the host->device traffic — per-leaf puts
    # serialize hundreds of transfers through the rate-limited link
    return jax.device_put(state, shardings)


def describe_shardings(params: Any, mesh: Mesh,
                       rules: Sequence[Tuple[str, P]] = DEFAULT_RULES):
    """List (path, shape, spec) for every non-replicated param (debugging)."""
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        spec = spec_for(_path_str(path), leaf.shape, mesh, rules)
        if spec != P():
            out.append((_path_str(path), tuple(leaf.shape), spec))
    return out
