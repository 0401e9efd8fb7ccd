"""Shared transformer building blocks (flax.linen, functional KV cache).

Design notes (TPU-first, not a port):

* Attention math runs in the model compute dtype (bf16 by default) with
  fp32 softmax; the MXU contractions carry
  ``preferred_element_type=float32``.
* The KV cache is an explicit pytree threaded through calls (no flax
  mutable-variable decode machinery): static-shape buffers updated with
  ``dynamic_update_slice`` so batched beam search stays inside one jit.
* LayerNorm always computes in fp32 (the reference keeps fp32 layer norm
  under AMP too — avsl/modules/av_hubert_layers.py:438-440).
* LayerDrop is a 0/1 Bernoulli multiplier on the residual delta, keeping
  shapes static (fairseq drops whole layers; same expectation, jit-safe).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Cache = Dict[str, Any]


# ---------------------------------------------------------------------------
# Functional helpers
# ---------------------------------------------------------------------------


@jax.custom_vjp
def grad_multiply(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Identity forward, gradient scaled by ``scale``.

    TPU-native equivalent of the reference's ``GradMultiply`` autograd node
    (avsl/modules/av_hubert_layers.py:443-452), used for
    ``feature_grad_mult`` on frontend features.
    """
    return x


def _gm_fwd(x, scale):
    return x, scale


def _gm_bwd(scale, g):
    return (g * scale, None)


grad_multiply.defvjp(_gm_fwd, _gm_bwd)


def remat_block(cls, static_argnums, policy: str = "block"):
    """``nn.remat`` with a selectable rematerialization policy.

    ``"block"`` — checkpoint everything (max memory savings, full
    forward recompute in the backward: the round-4 default, measured
    22.5% MFU at the large-v2 reference envelope).
    ``"dots"`` — ``dots_with_no_batch_dims_saveable``: the projection /
    MLP GEMM outputs are saved and only attention internals + elementwise
    ops recompute, trading a little memory for skipping the expensive
    half of the re-forward. At micro-batch 1 the saved GEMM outputs are
    a few MB per block, so the memory cost is negligible on any chip.
    """
    policies = {
        "block": None,
        "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    }
    if policy not in policies:
        raise ValueError(f"unknown remat policy {policy!r}; known: {sorted(policies)}")
    return nn.remat(cls, static_argnums=static_argnums, policy=policies[policy])


def sinusoid_embedding(
    length: int, channels: int, max_timescale: float = 10000.0
) -> np.ndarray:
    """Whisper-style sinusoidal positions: ``[length, channels]``,
    ``[sin | cos]`` split halves with log-spaced timescales."""
    assert channels % 2 == 0
    log_timescale_increment = np.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(
        np.float32
    )


def fairseq_sinusoid_embedding(
    length: int, channels: int, padding_idx: int = 1
) -> np.ndarray:
    """fairseq-layout sinusoidal table (for AV-HuBERT decoder parity with
    avsl/modules/av_hubert_decoder.py:593-632): position ids offset by
    ``padding_idx + 1``; odd dims zero-pad the cos half."""
    half = channels // 2
    emb_scale = np.log(10000.0) / (half - 1)
    inv = np.exp(np.arange(half) * -emb_scale)
    pos = np.arange(padding_idx + 1, length + padding_idx + 1)[:, None] * inv[None, :]
    out = np.concatenate([np.sin(pos), np.cos(pos)], axis=1)
    if channels % 2 == 1:
        out = np.concatenate([out, np.zeros((length, 1))], axis=1)
    return out.astype(np.float32)


def make_causal_mask(q_len: int, k_len: int, offset: int = 0) -> jnp.ndarray:
    """Boolean [q_len, k_len] mask; True = attend. Query position i may see
    key positions <= i + offset (offset = already-cached length)."""
    q_ids = jax.lax.broadcasted_iota(jnp.int32, (q_len, k_len), 0)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (q_len, k_len), 1)
    return k_ids <= q_ids + offset


class LayerNormF32(nn.Module):
    """LayerNorm computed in fp32 regardless of activation dtype."""

    epsilon: float = 1e-5
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        out = nn.LayerNorm(
            epsilon=self.epsilon, dtype=jnp.float32, param_dtype=self.param_dtype
        )(x.astype(jnp.float32))
        return out.astype(orig_dtype)


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------


def init_self_attn_cache(
    batch: int, max_len: int, n_heads: int, head_dim: int, dtype=jnp.bfloat16
) -> Cache:
    """Static-shape self-attention KV cache for incremental decoding."""
    return {
        "k": jnp.zeros((batch, max_len, n_heads, head_dim), dtype),
        "v": jnp.zeros((batch, max_len, n_heads, head_dim), dtype),
        "index": jnp.zeros((), jnp.int32),
    }


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    return_weights: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
):
    """[B,Q,H,D]x[B,K,H,D] -> [B,Q,H,D]; fp32 softmax; mask True=attend.
    ``return_weights`` also returns the fp32 [B,H,Q,K] softmax weights
    (the alignment capture path, decode/word_timestamps.py).
    ``dropout_rng``/``dropout_rate`` drop attention WEIGHTS (fairseq
    attention_dropout semantics, inverted scaling)."""
    head_dim = q.shape[-1]
    scale = 1.0 / np.sqrt(head_dim)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    weights_f32 = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    weights = weights_f32.astype(q.dtype)
    if dropout_rng is not None and dropout_rate > 0.0:
        keep = jax.random.bernoulli(
            dropout_rng, 1.0 - dropout_rate, weights.shape
        )
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", weights, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)
    if return_weights:
        return out, weights_f32
    return out


class MultiHeadAttention(nn.Module):
    """Self- or cross-attention with optional static-shape KV cache.

    Calling conventions:
    * training / full-sequence: ``mha(x)`` or ``mha(x, kv_src=enc)``
    * incremental self-attn: ``mha(x, cache=c)`` -> appends x's K/V at
      ``c["index"]`` and attends causally over the cached prefix.
    * incremental cross-attn: pass ``cache={"k":..., "v":...}`` holding the
      precomputed encoder K/V (build once via :meth:`precompute_kv`).
    Returns ``(out, new_cache)``; ``new_cache`` is None when cache is None.
    """

    d_model: int
    n_heads: int
    use_k_bias: bool = False  # whisper's key projection has no bias
    attn_dropout: float = 0.0  # fairseq attention_dropout (weight drop)
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def setup(self):
        dense = lambda name, bias: nn.Dense(  # noqa: E731
            self.d_model,
            use_bias=bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )
        self.q_proj = dense("q_proj", True)
        self.k_proj = dense("k_proj", self.use_k_bias)
        self.v_proj = dense("v_proj", True)
        self.out_proj = dense("out_proj", True)

    def _split(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, _ = x.shape
        return x.reshape(b, t, self.n_heads, self.d_model // self.n_heads)

    def precompute_kv(self, kv_src: jnp.ndarray) -> Cache:
        return {"k": self._split(self.k_proj(kv_src)), "v": self._split(self.v_proj(kv_src))}

    def __call__(
        self,
        x: jnp.ndarray,
        kv_src: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        cache: Optional[Cache] = None,
        decode: bool = False,
        causal: bool = False,
        kv_lengths: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[Cache]]:
        q = self._split(self.q_proj(x))
        new_cache = None

        if cache is not None and "index" in cache:
            # incremental self-attention
            k_new = self._split(self.k_proj(x)).astype(cache["k"].dtype)
            v_new = self._split(self.v_proj(x)).astype(cache["v"].dtype)
            idx = cache["index"]
            qlen, max_len = x.shape[1], cache["k"].shape[1]
            if getattr(idx, "ndim", 0) == 1:
                # per-sequence write offsets (speculative decoding: ragged
                # acceptance means each sequence's committed length differs).
                # Rows past a sequence's index hold stale K/V from rejected
                # drafts — never attended (mask keys off idx) and simply
                # overwritten by the next round's scatter.
                b = x.shape[0]
                positions = idx[:, None] + jnp.arange(qlen)[None, :]  # [B,Q]
                batch_ids = jnp.arange(b)[:, None]
                k = cache["k"].at[batch_ids, positions].set(k_new, mode="drop")
                v = cache["v"].at[batch_ids, positions].set(v_new, mode="drop")
                kpos = jax.lax.broadcasted_iota(jnp.int32, (qlen, max_len), 1)
                qpos = jax.lax.broadcasted_iota(jnp.int32, (qlen, max_len), 0)
                causal = kpos[None] <= (qpos[None] + idx[:, None, None])  # [B,Q,K]
                attn_mask = causal[:, None] if mask is None else (causal[:, None] & mask)
            else:
                k = jax.lax.dynamic_update_slice(cache["k"], k_new, (0, idx, 0, 0))
                v = jax.lax.dynamic_update_slice(cache["v"], v_new, (0, idx, 0, 0))
                pos_ids = jax.lax.broadcasted_iota(jnp.int32, (qlen, max_len), 1)
                q_ids = jax.lax.broadcasted_iota(jnp.int32, (qlen, max_len), 0)
                causal = pos_ids <= (q_ids + idx)
                attn_mask = causal[None, None] if mask is None else (causal[None, None] & mask)
            new_cache = {"k": k, "v": v, "index": idx + qlen}
            out = dot_product_attention(q, k.astype(q.dtype), v.astype(q.dtype), attn_mask)
        elif cache is not None:
            # cross-attention with precomputed encoder K/V; int8-compressed
            # entries (models/quant.quantize_kv_cache) dequantize here —
            # XLA fuses the convert+scale into the attention matmuls, so
            # the resident HBM form stays int8 between decode steps
            from avsl_tpu.models.quant import QTensor

            def _kv(x):
                if isinstance(x, QTensor):
                    return x.dequantize(q.dtype)
                return x.astype(q.dtype)

            out = dot_product_attention(q, _kv(cache["k"]), _kv(cache["v"]), mask)
            new_cache = cache
        else:
            src = x if kv_src is None else kv_src
            k = self._split(self.k_proj(src))
            v = self._split(self.v_proj(src))
            # alignment capture (decode/word_timestamps.py): materialize
            # and sow cross-attention weights ONLY when the caller made
            # the dedicated "alignment" collection mutable. NOT keyed on
            # "intermediates": the training losses make that mutable for
            # MoE aux stats, and gating on it would materialize [B,H,Q,K]
            # fp32 weights for every cross-attn on every train step
            sow_weights = (
                kv_src is not None
                and self.is_mutable_collection("alignment")
                # never during init: model.init makes EVERY collection
                # mutable, and a captured tensor would pollute the
                # returned variables (checkpoint triage, HBM dead weight)
                and not self.is_initializing()
            )
            drop = (not deterministic) and self.attn_dropout > 0.0
            if drop:
                # attention_dropout needs materialized weights: unfused
                # path for training steps that enable it (the fused
                # kernel serves deterministic/production forwards)
                out = dot_product_attention(
                    q, k, v, mask,
                    dropout_rng=self.make_rng("dropout"),
                    dropout_rate=self.attn_dropout,
                )
            elif mask is None and not sow_weights:
                # hot full-sequence path: fused (flash-style) Pallas kernel
                # on TPU, einsum fallback elsewhere (kernels/attention.py)
                from avsl_tpu.kernels.attention import fused_attention

                out = fused_attention(q, k, v, lengths=kv_lengths, causal=causal)
            elif sow_weights:
                out, weights = dot_product_attention(
                    q, k, v, mask, return_weights=True
                )
                self.sow("alignment", "attn_weights", weights)
            else:
                out = dot_product_attention(q, k, v, mask)

        b, t, _, _ = out.shape
        return self.out_proj(out.reshape(b, t, self.d_model)), new_cache


class MLP(nn.Module):
    d_model: int
    d_ff: int
    activation: str = "gelu"
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dense(self.d_ff, dtype=self.dtype, param_dtype=self.param_dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False) if self.activation == "gelu" else nn.relu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.d_model, dtype=self.dtype, param_dtype=self.param_dtype, name="fc2")(x)


class TransformerBlock(nn.Module):
    """Pre-norm (or post-norm) block: self-attn [+ cross-attn] + MLP.

    ``gated_x_attn=True`` adds a Flamingo-style tanh-gated cross-attention
    sublayer on a second context stream (``xv``) *before* the regular
    sublayers, with zero-initialized gates so training starts at the
    pretrained behavior (Whisper-Flamingo; SURVEY.md §2.7 contract).
    """

    d_model: int
    n_heads: int
    d_ff: int
    has_cross_attn: bool = False
    gated_x_attn: bool = False
    causal_self_attn: bool = False  # full-sequence self-attn is causal
    pre_norm: bool = True
    dropout: float = 0.0
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    use_k_bias: bool = False
    # n_experts > 0 swaps the dense MLP for a mixture-of-experts FFN
    # (models/moe.py) under the same "mlp" param name; the router's aux
    # load-balance loss is sown into the "intermediates" collection.
    n_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def setup(self):
        mha = lambda name: MultiHeadAttention(  # noqa: E731
            self.d_model,
            self.n_heads,
            use_k_bias=self.use_k_bias,
            attn_dropout=self.attention_dropout,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )
        self.self_attn = mha("self_attn")
        self.self_attn_ln = LayerNormF32(param_dtype=self.param_dtype, name="self_attn_ln")
        if self.has_cross_attn:
            self.cross_attn = mha("cross_attn")
            self.cross_attn_ln = LayerNormF32(param_dtype=self.param_dtype, name="cross_attn_ln")
        if self.gated_x_attn:
            self.x_attn = mha("x_attn")
            self.x_attn_ln = LayerNormF32(param_dtype=self.param_dtype, name="x_attn_ln")
            self.x_attn_gate = self.param("x_attn_gate", nn.initializers.zeros, (1,), self.param_dtype)
            self.x_mlp = MLP(self.d_model, self.d_ff, dropout=self.activation_dropout,
                             dtype=self.dtype, param_dtype=self.param_dtype, name="x_mlp")
            self.x_mlp_ln = LayerNormF32(param_dtype=self.param_dtype, name="x_mlp_ln")
            self.x_mlp_gate = self.param("x_mlp_gate", nn.initializers.zeros, (1,), self.param_dtype)
        if self.n_experts > 0:
            from avsl_tpu.models.moe import MoEFFN

            self.mlp = MoEFFN(
                self.d_model, self.d_ff, self.n_experts,
                top_k=self.moe_top_k,
                capacity_factor=self.moe_capacity_factor,
                dtype=self.dtype, param_dtype=self.param_dtype, name="mlp",
            )
        else:
            self.mlp = MLP(self.d_model, self.d_ff, dropout=self.activation_dropout,
                           dtype=self.dtype, param_dtype=self.param_dtype, name="mlp")
        self.mlp_ln = LayerNormF32(param_dtype=self.param_dtype, name="mlp_ln")
        self.residual_dropout = nn.Dropout(self.dropout)

    def _residual(self, x, delta, deterministic):
        return x + self.residual_dropout(delta, deterministic=deterministic)

    def __call__(
        self,
        x: jnp.ndarray,
        enc: Optional[jnp.ndarray] = None,
        xv: Optional[jnp.ndarray] = None,
        self_mask: Optional[jnp.ndarray] = None,
        enc_mask: Optional[jnp.ndarray] = None,
        xv_mask: Optional[jnp.ndarray] = None,
        cache: Optional[Cache] = None,
        deterministic: bool = True,
        kv_lengths: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Optional[Cache]]:
        new_cache: Optional[Cache] = {} if cache is not None else None

        xv_cache = None if cache is None else cache.get("xv")
        if self.gated_x_attn and (xv is not None or xv_cache is not None):
            delta, c = self.x_attn(
                self.x_attn_ln(x), kv_src=xv, mask=xv_mask, cache=xv_cache,
                deterministic=deterministic,
            )
            x = x + jnp.tanh(self.x_attn_gate).astype(x.dtype) * delta
            delta = self.x_mlp(self.x_mlp_ln(x), deterministic=deterministic)
            x = x + jnp.tanh(self.x_mlp_gate).astype(x.dtype) * delta
            if new_cache is not None:
                new_cache["xv"] = c if c is not None else xv_cache

        # self-attention
        residual = x
        h = self.self_attn_ln(x) if self.pre_norm else x
        h, c = self.self_attn(
            h, mask=self_mask, cache=None if cache is None else cache.get("self"),
            kv_lengths=kv_lengths,
            causal=self.causal_self_attn and cache is None,
            deterministic=deterministic,
        )
        x = self._residual(residual, h, deterministic)
        if not self.pre_norm:
            x = self.self_attn_ln(x)
        if new_cache is not None:
            new_cache["self"] = c

        # cross-attention
        if self.has_cross_attn and (enc is not None or (cache or {}).get("cross")):
            residual = x
            h = self.cross_attn_ln(x) if self.pre_norm else x
            h, c = self.cross_attn(
                h, kv_src=enc, mask=enc_mask,
                cache=None if cache is None else cache.get("cross"),
                deterministic=deterministic,
            )
            x = self._residual(residual, h, deterministic)
            if not self.pre_norm:
                x = self.cross_attn_ln(x)
            if new_cache is not None:
                new_cache["cross"] = c

        # MLP
        residual = x
        h = self.mlp_ln(x) if self.pre_norm else x
        if self.n_experts > 0 and kv_lengths is not None:
            # the suffix-padding lengths that masked self-attention also
            # mask MoE routing: pad tokens must not claim expert capacity
            valid = (
                jax.lax.broadcasted_iota(jnp.int32, h.shape[:2], 1)
                < kv_lengths[:, None]
            )
            h = self.mlp(h, deterministic=deterministic, valid=valid)
        else:
            h = self.mlp(h, deterministic=deterministic)
        x = self._residual(residual, h, deterministic)
        if not self.pre_norm:
            x = self.mlp_ln(x)
        return x, new_cache
