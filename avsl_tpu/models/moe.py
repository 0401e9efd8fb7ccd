"""Mixture-of-Experts FFN with expert parallelism over an ``expert`` axis.

The reference has no MoE (its AV-HuBERT/Whisper stacks are dense); this is
a TPU-native scaling addition completing the framework's parallelism set
(dp x tp x sp x pp x **ep**). The design is the GShard/Switch dense-
dispatch formulation, chosen because it is the shape XLA's SPMD
partitioner understands:

* routing (top-k gates, capacity, position-in-expert) is computed with
  static shapes — no sorting networks, no ragged buffers;
* dispatch and combine are **einsums against [tokens, experts, capacity]
  one-hot tensors**, so the all-to-all that moves tokens to their experts
  is inserted by XLA from sharding constraints (`P('expert', None, None)`
  on the [E, C, D] expert blocks), not hand-written;
* the expert MLPs run as one batched [E, C, D] x [E, D, F] einsum — a
  single large MXU matmul per projection instead of E small ones.

Load balancing uses the Switch Transformer auxiliary loss
(n_experts * sum_e f_e * P_e); it is exported via ``flax``'s ``sow``
mechanism (collection "intermediates", name "moe_aux") so any loss
function can add it with :func:`moe_aux_loss` without threading new
return values through every model signature.

Expert parallelism composes with the existing axes: build the mesh with
:func:`make_ep_mesh` (axes ``("data", "expert")``) and shard the expert
parameters with `core.partitioning` (rules match ``w_in/w_out/b_in/b_out``
to ``P('expert', ...)``); the router stays replicated so every data shard
routes its own tokens.

Padding: callers pass ``valid`` ([B, T], 1.0 = real token — the encoder
derives it from the same ``padding_mask`` the attention kernel consumes)
so pad tokens neither claim expert capacity (position-priority) nor
enter the balance-loss statistics; their FFN delta is zero and the
block's residual passes them through. Without ``valid`` every position
routes (padding-free or pre-bucketed inputs).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from avsl_tpu.core.mesh import DATA_AXIS, constrain_activation, make_mesh

EXPERT_AXIS = "expert"

__all__ = ["EXPERT_AXIS", "MoEFFN", "make_ep_mesh", "moe_aux_loss"]


def make_ep_mesh(
    n_devices: Optional[int] = None,
    experts_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """(data, expert) mesh; ``experts_parallel`` contiguous devices per
    expert group so the dispatch all-to-all rides neighbor ICI links."""
    return make_mesh(
        n_devices,
        model_parallel=experts_parallel,
        devices=devices,
        axis_names=(DATA_AXIS, EXPERT_AXIS),
    )


class MoEFFN(nn.Module):
    """Drop-in replacement for the dense ``MLP`` sublayer (same call
    signature), routing each token to its top-k experts.

    Capacity: each expert processes at most
    ``ceil(capacity_factor * top_k * n_tokens / n_experts)`` tokens;
    overflow tokens get a zero FFN delta (the block's residual connection
    passes them through unchanged — same convention as Switch/GShard).
    """

    d_model: int
    d_ff: int
    n_experts: int
    top_k: int = 2
    capacity_factor: float = 1.25
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        valid: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        B, T, D = x.shape
        E, F = self.n_experts, self.d_ff
        K = min(self.top_k, E)
        N = B * T
        C = max(1, int(np.ceil(self.capacity_factor * K * N / E)))

        xt = x.reshape(N, D)
        # [N] 1.0 for real tokens; pad tokens are excluded from capacity
        # claims and balance statistics (their combine weights end up 0,
        # so their FFN delta is exactly zero)
        v = (
            jnp.ones((N,), jnp.float32)
            if valid is None
            else valid.reshape(N).astype(jnp.float32)
        )
        router = self.param(
            "router", nn.initializers.normal(0.02), (D, E), self.param_dtype
        )
        # routing math in fp32: softmax over expert logits must not run in bf16
        logits = xt.astype(jnp.float32) @ router.astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)  # [N, E]

        # Iterative top-k (K is 1 or 2 — unrolled, static). GShard priority:
        # every token's k-th choice queues behind ALL (k-1)-th choices, so
        # `count` carries the occupancy from earlier rounds into `pos`.
        masked = probs
        count = jnp.zeros((E,), jnp.float32)
        dispatch = jnp.zeros((N, E, C), jnp.float32)
        gates = []
        top1 = None
        for _k in range(K):
            idx = jnp.argmax(masked, axis=-1)  # [N]
            if top1 is None:
                top1 = idx
            gate = jnp.take_along_axis(probs, idx[:, None], axis=1)[:, 0]
            raw_onehot = jax.nn.one_hot(idx, E, dtype=jnp.float32)  # [N, E]
            onehot = raw_onehot * v[:, None]  # pad tokens claim no slot
            pos = jnp.cumsum(onehot, axis=0) - 1.0 + count  # [N, E]
            pos_k = jnp.take_along_axis(pos, idx[:, None], axis=1)[:, 0]
            keep = (pos_k < C).astype(jnp.float32)
            slot = jax.nn.one_hot(
                jnp.clip(pos_k, 0, C - 1).astype(jnp.int32), C, dtype=jnp.float32
            )
            disp_k = onehot[:, :, None] * slot[:, None, :] * keep[:, None, None]
            dispatch = dispatch + disp_k
            gates.append((gate, disp_k))
            count = count + jnp.sum(onehot, axis=0)
            masked = masked * (1.0 - raw_onehot)

        # K>1: normalize gates over the top-k (GShard/Mixtral). K=1: use the
        # raw router prob (Switch) — a normalized top-1 gate is identically
        # 1.0, which would cut the router out of the main gradient path.
        gate_total = sum(g for g, _ in gates)
        denom = jnp.maximum(gate_total, 1e-9) if K > 1 else 1.0
        combine = sum(
            ((g / denom)[:, None, None] * d) for g, d in gates
        )  # [N, E, C]

        # dense dispatch: one einsum moves every kept token into its
        # expert's capacity slot; [E, C, D] shards over the expert axis
        # (constraint below), so XLA emits the all-to-all here.
        cdtype = jnp.dtype(self.dtype)
        expert_in = jnp.einsum(
            "nec,nd->ecd", dispatch.astype(cdtype), xt.astype(cdtype)
        )
        expert_in = constrain_activation(expert_in, EXPERT_AXIS, None, None)

        kinit = nn.initializers.lecun_normal()
        w_in = self.param("w_in", kinit, (E, D, F), self.param_dtype)
        b_in = self.param("b_in", nn.initializers.zeros, (E, F), self.param_dtype)
        w_out = self.param("w_out", kinit, (E, F, D), self.param_dtype)
        b_out = self.param("b_out", nn.initializers.zeros, (E, D), self.param_dtype)

        h = (
            jnp.einsum("ecd,edf->ecf", expert_in, w_in.astype(cdtype))
            + b_in[:, None, :].astype(cdtype)
        )
        h = nn.gelu(h)
        out = (
            jnp.einsum("ecf,efd->ecd", h, w_out.astype(cdtype))
            + b_out[:, None, :].astype(cdtype)
        )
        out = constrain_activation(out, EXPERT_AXIS, None, None)
        y = jnp.einsum("nec,ecd->nd", combine.astype(cdtype), out)

        # Switch aux loss (eq. 4): E * sum_e (top-1 token fraction_e * mean
        # router prob_e); 1.0 at perfect balance. Statistics over REAL
        # tokens only — pad positions would otherwise drag every batch
        # toward whatever expert zero-vectors route to.
        n_valid = jnp.maximum(jnp.sum(v), 1.0)
        f = (
            jnp.sum(jax.nn.one_hot(top1, E, dtype=jnp.float32) * v[:, None], axis=0)
            / n_valid
        )
        p_mean = jnp.sum(probs * v[:, None], axis=0) / n_valid
        aux = E * jnp.sum(f * p_mean)
        self.sow("intermediates", "moe_aux", aux)

        return y.reshape(B, T, D).astype(x.dtype)


def moe_aux_loss(intermediates: dict) -> jnp.ndarray:
    """Mean of every sown ``moe_aux`` in an ``intermediates`` collection
    (``model.apply(..., mutable=["intermediates"])``); 0.0 if none."""
    from collections.abc import Mapping

    leaves = []

    def _walk(node):
        if isinstance(node, Mapping):
            for k, v in node.items():
                if k == "moe_aux":
                    leaves.extend(v if isinstance(v, (tuple, list)) else [v])
                else:
                    _walk(v)

    _walk(intermediates)
    if not leaves:
        return jnp.zeros((), jnp.float32)
    return jnp.mean(jnp.stack([jnp.asarray(l) for l in leaves]))
