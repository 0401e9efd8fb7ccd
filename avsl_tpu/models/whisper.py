"""Whisper encoder/decoder in flax, with Whisper-Flamingo video fusion.

From-scratch implementation of the published Whisper architecture
(conv1d x2 frontend + sinusoidal positions + pre-norm transformer encoder;
learned-position decoder with cross-attention and tied output embedding),
extended with the Whisper-Flamingo surface the reference consumes from its
external fork (SURVEY.md §2.7; call sites avsl/whisper_flamingo_ft_ami.py:
337-348, 527-528):

* ``encode(mel, video) -> (features, x_v)`` — audio encoding plus a separate
  projected video stream (``av_fusion='separate'``), where ``video_model``
  is any module mapping [B,T,H,W,1] -> [B,T',video_state] (AV-HuBERT's
  visual encoder in the flagship config).
* ``decode(tokens, features, xv=x_v)`` — decoder blocks carry tanh-gated
  cross-attention on ``x_v`` when ``cfg.add_gated_x_attn`` (gates init 0).

Decoding is incremental with an explicit static-shape KV cache pytree
(cross K/V precomputed once), so greedy and batched beam search compile to
a single XLA while-loop program.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from avsl_tpu.core.config import WhisperConfig
from avsl_tpu.models.layers import (
    remat_block,
    Cache,
    LayerNormF32,
    TransformerBlock,
    init_self_attn_cache,
    sinusoid_embedding,
)


def _dtype(cfg: WhisperConfig):
    return jnp.dtype(cfg.dtype)


def _pdtype(cfg: WhisperConfig):
    return jnp.dtype(cfg.param_dtype)


class WhisperEncoder(nn.Module):
    """Audio encoder: mel [B, n_mels, T] -> features [B, T//2, n_state]."""

    cfg: WhisperConfig

    @nn.compact
    def __call__(self, mel: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        dtype, pdtype = _dtype(cfg), _pdtype(cfg)
        x = mel.astype(dtype).transpose(0, 2, 1)  # [B, T, n_mels]
        x = nn.Conv(cfg.n_audio_state, (3,), padding=1, dtype=dtype, param_dtype=pdtype, name="conv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(cfg.n_audio_state, (3,), strides=(2,), padding=1, dtype=dtype, param_dtype=pdtype, name="conv2")(x)
        x = nn.gelu(x, approximate=False)

        t = x.shape[1]
        pos = sinusoid_embedding(cfg.n_audio_ctx, cfg.n_audio_state)[:t]
        x = x + jnp.asarray(pos, dtype)

        block = TransformerBlock
        if cfg.remat:
            # flax core_fn prepends the module scope, so `deterministic`
            # (8th call arg) sits at static index 8
            block = remat_block(
                TransformerBlock, (8,), cfg.remat_policy
            )
        # sequence parallelism: between blocks the activations shard
        # [batch -> data axis, time -> model axis]; a no-op outside
        # core.mesh.activation_sharding_scope. Attention's full-sequence
        # all-gather is inserted by XLA's SPMD partitioner.
        from avsl_tpu.core.mesh import DATA_AXIS, MODEL_AXIS, constrain_activation

        x = constrain_activation(x, DATA_AXIS, MODEL_AXIS, None)
        for i in range(cfg.n_audio_layer):
            x, _ = block(
                d_model=cfg.n_audio_state,
                n_heads=cfg.n_audio_head,
                d_ff=4 * cfg.n_audio_state,
                dropout=cfg.dropout_rate,
                dtype=dtype,
                param_dtype=pdtype,
                name=f"block_{i}",
            )(x, None, None, None, None, None, None, deterministic)
            x = constrain_activation(x, DATA_AXIS, MODEL_AXIS, None)
        return LayerNormF32(param_dtype=pdtype, name="ln_post")(x)


class WhisperTextDecoder(nn.Module):
    """Text decoder with optional gated video cross-attention per block."""

    cfg: WhisperConfig

    def setup(self):
        cfg = self.cfg
        self.token_embedding = nn.Embed(
            cfg.n_vocab, cfg.n_text_state, dtype=_dtype(cfg), param_dtype=_pdtype(cfg),
            name="token_embedding",
        )
        self.positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (cfg.n_text_ctx, cfg.n_text_state),
            _pdtype(cfg),
        )
        self.blocks = [
            TransformerBlock(
                d_model=cfg.n_text_state,
                n_heads=cfg.n_text_head,
                d_ff=4 * cfg.n_text_state,
                has_cross_attn=True,
                gated_x_attn=bool(cfg.add_gated_x_attn),
                causal_self_attn=True,  # fused causal kernel, no mask tensor
                dropout=cfg.dropout_rate,
                dtype=_dtype(cfg),
                param_dtype=_pdtype(cfg),
                name=f"block_{i}",
            )
            for i in range(cfg.n_text_layer)
        ]
        self.ln = LayerNormF32(param_dtype=_pdtype(cfg), name="ln")

    def __call__(
        self,
        tokens: jnp.ndarray,
        audio_features: Optional[jnp.ndarray] = None,
        xv: Optional[jnp.ndarray] = None,
        cache: Optional[List[Cache]] = None,
        self_mask: Optional[jnp.ndarray] = None,
        enc_mask: Optional[jnp.ndarray] = None,
        xv_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[List[Cache]]]:
        cfg = self.cfg
        offset = cache[0]["self"]["index"] if cache is not None else 0
        x = self.token_embedding(tokens)
        if cache is not None and getattr(offset, "ndim", 0) == 1:
            # per-sequence cache indices (speculative decoding): gather each
            # sequence's own positional rows
            pos_ids = offset[:, None] + jnp.arange(tokens.shape[1])[None, :]
            pos = jnp.take(
                self.positional_embedding,
                jnp.clip(pos_ids, 0, cfg.n_text_ctx - 1),
                axis=0,
            )  # [B, Q, D]
        else:
            pos = jax.lax.dynamic_slice(
                self.positional_embedding,
                (offset, 0) if cache is not None else (0, 0),
                (tokens.shape[1], cfg.n_text_state),
            )
        x = x + pos.astype(x.dtype)

        # full-sequence causality comes from the blocks' fused causal
        # attention (causal_self_attn=True); no mask tensor materialized

        new_cache: Optional[List[Cache]] = [] if cache is not None else None
        for i, block in enumerate(self.blocks):
            x, c = block(
                x,
                enc=audio_features,
                xv=xv,
                self_mask=self_mask,
                enc_mask=enc_mask,
                xv_mask=xv_mask,
                cache=None if cache is None else cache[i],
                deterministic=deterministic,
            )
            if new_cache is not None:
                new_cache.append(c)

        x = self.ln(x)
        logits = jnp.einsum(
            "btd,vd->btv",
            x,
            self.token_embedding.embedding.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        return logits, new_cache


class Whisper(nn.Module):
    """Whisper [+ Flamingo video] model.

    ``video_model`` maps raw lip clips [B,T,H,W,1] -> [B,T',video_state]
    (e.g. the AV-HuBERT visual encoder). ``video_projection`` maps
    video_state -> n_text_state; the parameter-name split mirrors the
    freeze regimes the reference selects by name
    (avsl/whisper_flamingo_ft_ami.py:506-517).
    """

    cfg: WhisperConfig
    video_model: Optional[nn.Module] = None

    def setup(self):
        self.encoder = WhisperEncoder(self.cfg, name="encoder")
        self.decoder = WhisperTextDecoder(self.cfg, name="decoder")
        if self.cfg.add_gated_x_attn:
            self.video_projection = nn.Dense(
                self.cfg.n_text_state,
                dtype=_dtype(self.cfg),
                param_dtype=_pdtype(self.cfg),
                name="video_projection",
            )

    def encode(
        self,
        mel: jnp.ndarray,
        video: Optional[jnp.ndarray] = None,
        video_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        freeze_video_bn_stats: bool = False,
        track_norm: bool = False,
        video_feature_scale: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """Reference contract: ``model.encoder(x, video, training=,
        padding_mask=, track_norm=)`` (whisper_flamingo_ft_ami.py:527,569).
        With ``track_norm=True`` the per-stream feature L2 norms are
        recorded via ``self.sow('intermediates', ...)`` — the functional
        equivalent of the reference's norm tracking — retrievable with
        ``mutable=['intermediates']`` at apply time.

        ``video_feature_scale`` (scalar, traced) multiplies the projected
        video features ``x_v``. The train-time AV-mode mixing uses 0.0 here
        for its audio-only draws: scaling the *features* keeps the decoder
        blind to video while the trunk still sees a real-statistics batch —
        zeroing the raw pixels instead makes every BatchNorm batch
        zero-variance, and BN's backward multiplies by 1/sqrt(eps) per
        layer (measured: grad-norm ~4e4 on the tiny stack, NaN within a
        few Adam steps)."""
        features, v = self.encode_towers(
            mel, video=video, video_mask=video_mask,
            deterministic=deterministic,
            freeze_video_bn_stats=freeze_video_bn_stats,
        )
        if track_norm:
            self.sow("intermediates", "audio_feature_norm",
                     jnp.linalg.norm(features.astype(jnp.float32)))
        x_v = None
        if v is not None:
            x_v = self.video_projection(v.astype(_dtype(self.cfg)))
            if video_feature_scale is not None:
                x_v = x_v * jnp.asarray(video_feature_scale, x_v.dtype)
            if track_norm:
                self.sow("intermediates", "video_feature_norm",
                         jnp.linalg.norm(x_v.astype(jnp.float32)))
        return features, x_v

    def encode_towers(
        self,
        mel: jnp.ndarray,
        video: Optional[jnp.ndarray] = None,
        video_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        freeze_video_bn_stats: bool = False,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """Run ONLY the two feature towers (Whisper audio encoder +
        video_model); the trainable ``video_projection`` is deliberately
        NOT applied. This is the frozen half of the encoder/video freeze
        regimes (reference whisper_flamingo_ft_ami.py:506-517): the
        grad-accumulation scan can hoist this forward out of the scan
        body and run it ONCE, batched over all micro-steps (see
        train/objectives.flamingo_tower_precompute), while
        :meth:`project_and_decode` keeps the trainable projection inside
        the differentiated program. Returns ``(audio_features,
        raw_video_feats_or_None)``."""
        features = self.encoder(mel, deterministic=deterministic)
        v = None
        if video is not None and self.cfg.add_gated_x_attn:
            if self.video_model is not None:
                v = self.video_model(
                    video, mask=video_mask, deterministic=deterministic,
                    use_running_average=True if freeze_video_bn_stats else None,
                )
            else:
                v = video  # already-extracted video features [B, T, video_state]
        return features, v

    def project_and_decode(
        self,
        tokens: jnp.ndarray,
        audio_features: jnp.ndarray,
        video_feats: Optional[jnp.ndarray] = None,
        video_feature_scale: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """The trainable tail of the hoisted-tower split: video_projection
        (+ AV-mode feature scaling, see :meth:`encode` on why the scale
        applies to projected features) and the teacher-forced decoder.
        ``project_and_decode(t, *encode_towers(mel, video))`` computes
        exactly ``decode(t, *encode(mel, video))``."""
        xv = None
        if video_feats is not None and self.cfg.add_gated_x_attn:
            xv = self.video_projection(video_feats.astype(_dtype(self.cfg)))
            if video_feature_scale is not None:
                xv = xv * jnp.asarray(video_feature_scale, xv.dtype)
        logits, _ = self.decoder(
            tokens, audio_features, xv=xv, deterministic=deterministic
        )
        return logits

    def decode(
        self,
        tokens: jnp.ndarray,
        audio_features: jnp.ndarray,
        xv: Optional[jnp.ndarray] = None,
        cache: Optional[List[Cache]] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[List[Cache]]]:
        return self.decoder(
            tokens, audio_features, xv=xv, cache=cache, deterministic=deterministic
        )

    # NOTE (train/serve parity for audio-only inputs): an audio-only
    # TRAINING draw (prob_a mixing, video_feature_scale=0) still runs the
    # gated x-attn / x-mlp sublayers against a zeroed video stream, while
    # decoding with NO xv cache skips them entirely. Serve audio-only
    # items with a ZEROED video tensor (the StreamingTranscriber always
    # does) so serving matches the training-time computation.
    def init_decode_cache(
        self,
        audio_features: jnp.ndarray,
        xv: Optional[jnp.ndarray] = None,
        max_len: int = 0,
    ) -> List[Cache]:
        """Build the decode cache: zeroed self-attn buffers + precomputed
        cross-attention K/V from the encoder output."""
        cfg = self.cfg
        if max_len <= 0:
            max_len = cfg.n_text_ctx
        b = audio_features.shape[0]
        head_dim = cfg.n_text_state // cfg.n_text_head
        caches: List[Cache] = []
        for block in self.decoder.blocks:
            entry: Cache = {
                "self": init_self_attn_cache(
                    b, max_len, cfg.n_text_head, head_dim, _dtype(cfg)
                ),
                "cross": block.cross_attn.precompute_kv(audio_features),
            }
            if cfg.add_gated_x_attn and xv is not None:
                entry["xv"] = block.x_attn.precompute_kv(xv)
            caches.append(entry)
        return caches

    def __call__(
        self,
        mel: jnp.ndarray,
        tokens: jnp.ndarray,
        video: Optional[jnp.ndarray] = None,
        video_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        freeze_video_bn_stats: bool = False,
        video_feature_scale: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        features, x_v = self.encode(
            mel, video, video_mask=video_mask, deterministic=deterministic,
            freeze_video_bn_stats=freeze_video_bn_stats,
            video_feature_scale=video_feature_scale,
        )
        logits, _ = self.decode(tokens, features, xv=x_v, deterministic=deterministic)
        return logits
