"""Fused (flash-style) attention Pallas kernel for TPU.

Standard XLA attention materializes the [Tq, Tk] logits in HBM; this
kernel keeps per-(batch, head, q-block) logits in VMEM only: each program
loads one query block plus the full K/V for its head, computes fp32
scores -> softmax -> context on the MXU, and writes just the output
block. For the Whisper encoder's 1500-frame sequences the whole K/V +
score block is ~1.6 MB of VMEM — far under the ~16 MB budget — so no
online-softmax K-blocking is needed at these lengths (the loop-over-K
upgrade applies the same structure when sequences outgrow VMEM).

Supports optional causal masking and per-batch key-length masking
(padded positions excluded). Backward pass is a second Pallas kernel:
it recomputes the softmax per (batch, head, q-block) in VMEM (flash
recompute — the [Tq, Tk] probability matrix never exists in HBM in
either direction) and accumulates dK/dV across the sequential q-block
grid dimension in fp32 VMEM scratch-resident output blocks.

On non-TPU backends (tests run on CPU) the public entry transparently
falls back to the reference einsum implementation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1.0e30


def _reference_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lengths: Optional[jnp.ndarray],
    causal: bool,
) -> jnp.ndarray:
    """[B,H,Tq,D] einsum attention (fp32 softmax), the semantic spec."""
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    tk = k.shape[2]
    if causal:
        tq = q.shape[2]
        q_ids = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
        k_ids = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
        logits = jnp.where((k_ids <= q_ids)[None, None], logits, NEG_INF)
    if lengths is not None:
        k_ids = jax.lax.broadcasted_iota(jnp.int32, (tk,), 0)
        valid = k_ids[None, :] < lengths[:, None]  # [B, Tk]
        logits = jnp.where(valid[:, None, None, :], logits, NEG_INF)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", weights, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def _attn_kernel(lengths_ref, q_ref, k_ref, v_ref, o_ref, *, scale, causal, block_q):
    # q_ref: [1, 1, block_q, D]; k_ref/v_ref: [1, 1, Tk, D]
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0]
    tk = k.shape[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [block_q, Tk]

    k_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, tk), 1)
    if causal:
        q_start = pl.program_id(2) * block_q
        q_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, tk), 0) + q_start
        s = jnp.where(k_ids <= q_ids, s, NEG_INF)
    if lengths_ref is not None:
        b = pl.program_id(0)
        s = jnp.where(k_ids < lengths_ref[b], s, NEG_INF)

    # fp32 softmax in VMEM
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


try:  # pallas is TPU-only at runtime; import guarded for CPU test envs
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "interpret"))
def _flash_fwd_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lengths: Optional[jnp.ndarray],
    causal: bool = False,
    block_q: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, tq, d = q.shape
    tk = k.shape[2]
    block_q = min(block_q, tq)
    # pad Tq to a block multiple (static)
    pad_q = (-tq) % block_q
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    n_q_blocks = q.shape[2] // block_q
    scale = 1.0 / np.sqrt(d)

    kernel = functools.partial(
        _attn_kernel, scale=scale, causal=causal, block_q=block_q
    )
    if lengths is None:
        kernel = functools.partial(kernel, None)
        num_scalar = 0
        args = (q, k, v)
    else:
        num_scalar = 1
        args = (lengths.astype(jnp.int32), q, k, v)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=num_scalar,
        grid=(b, h, n_q_blocks),
        in_specs=[
            # index maps receive (*grid_indices, *scalar_prefetch_refs)
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i, *_: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, tk, d), lambda b_, h_, i, *_: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, tk, d), lambda b_, h_, i, *_: (b_, h_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i, *_: (b_, h_, i, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq * tk * d,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=b * h * tq * tk,
        ),
    )(*args)
    return out[:, :, :tq] if pad_q else out


def _attn_bwd_kernel(
    lengths_ref, q_ref, k_ref, v_ref, o_ref, g_ref,
    dq_ref, dk_ref, dv_ref, *, scale, causal, block_q,
):
    """One (batch, head, q-block) step of the flash backward.

    Recomputes p = softmax(qk^T) in VMEM, then
        dv += p^T g
        ds  = p * (g v^T - rowsum(g * o)) * scale
        dq  = ds k          (written per q-block)
        dk += ds^T q        (accumulated across the sequential q-block dim)
    dk/dv output blocks are indexed by (b, h) only, so they stay VMEM-
    resident across the innermost grid dimension and accumulate in fp32.
    """
    i = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    o = o_ref[0, 0].astype(jnp.float32)
    g = g_ref[0, 0].astype(jnp.float32)
    tk = k.shape[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [block_q, Tk]
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, tk), 1)
    if causal:
        q_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, tk), 0) + i * block_q
        s = jnp.where(k_ids <= q_ids, s, NEG_INF)
    if lengths_ref is not None:
        b = pl.program_id(0)
        s = jnp.where(k_ids < lengths_ref[b], s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # [block_q, Tk] fp32

    # dv_blk = p^T g : [Tk, D]
    dv_blk = jax.lax.dot_general(
        p, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dp = g v^T : [block_q, Tk]
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    delta = jnp.sum(g * o, axis=-1, keepdims=True)  # [block_q, 1]
    ds = p * (dp - delta) * scale
    # dq = ds k : [block_q, D]
    dq_ref[0, 0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dk_blk = ds^T q : [Tk, D]
    dk_blk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == 0)
    def _init():
        dk_ref[0, 0] = dk_blk
        dv_ref[0, 0] = dv_blk

    @pl.when(i > 0)
    def _accum():
        dk_ref[0, 0] += dk_blk
        dv_ref[0, 0] += dv_blk


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "interpret"))
def _flash_bwd_pallas(
    q, k, v, out, g, lengths, causal=False, block_q=256, interpret=False
):
    b, h, tq, d = q.shape
    tk = k.shape[2]
    block_q = min(block_q, tq)
    pad_q = (-tq) % block_q
    if pad_q:
        pad = ((0, 0), (0, 0), (0, pad_q), (0, 0))
        q, out, g = jnp.pad(q, pad), jnp.pad(out, pad), jnp.pad(g, pad)
    n_q_blocks = q.shape[2] // block_q
    scale = 1.0 / np.sqrt(d)

    kernel = functools.partial(
        _attn_bwd_kernel, scale=scale, causal=causal, block_q=block_q
    )
    if lengths is None:
        kernel = functools.partial(kernel, None)
        num_scalar = 0
        args = (q, k, v, out, g)
    else:
        num_scalar = 1
        args = (lengths.astype(jnp.int32), q, k, v, out, g)

    qblock = pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, i, *_: (b_, h_, i, 0))
    kblock = pl.BlockSpec((1, 1, tk, d), lambda b_, h_, i, *_: (b_, h_, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=num_scalar,
        grid=(b, h, n_q_blocks),
        in_specs=[qblock, kblock, kblock, qblock, qblock],
        out_specs=[qblock, kblock, kblock],
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, jnp.float32),
            jax.ShapeDtypeStruct(k.shape, jnp.float32),
            jax.ShapeDtypeStruct(v.shape, jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=11 * b * h * tq * tk * d,
            bytes_accessed=3 * (q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * tq * tk,
        ),
    )(*args)
    if pad_q:
        dq = dq[:, :, :tq]
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_attention(q, k, v, lengths, causal):
    return _flash_fwd_pallas(q, k, v, lengths, causal=causal)


def _flash_fwd(q, k, v, lengths, causal):
    out = _flash_fwd_pallas(q, k, v, lengths, causal=causal)
    return out, (q, k, v, out, lengths)


def _flash_bwd(causal, residuals, g):
    q, k, v, out, lengths = residuals
    dq, dk, dv = _flash_bwd_pallas(q, k, v, out, g, lengths, causal=causal)
    return dq, dk, dv, None


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lengths: Optional[jnp.ndarray] = None,
    causal: bool = False,
) -> jnp.ndarray:
    """Public entry. Layout [B, Tq, H, D] (matching models/layers.py);
    dispatches to the Pallas kernel on TPU, einsum elsewhere."""
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    if _HAS_PALLAS and jax.default_backend() not in ("cpu", "gpu"):
        out = _flash_attention(qt, kt, vt, lengths, causal)
    else:
        out = _reference_attention(qt, kt, vt, lengths, causal)
    return out.transpose(0, 2, 1, 3)
