"""Exhaustive checkpoint key-schema parity, every published Whisper size.

tests/test_convert.py proves conversion NUMERICS at tiny scale; this
module proves the KEY SCHEMA at every published size without
materializing weights: the torch-side key/shape tables are generated
from the published OpenAI Whisper architecture (openai/whisper model.py
— ``ModelDimensions`` and the module tree: conv1/conv2, blocks.N with
biasless key projections, the ``encoder.positional_embedding`` sinusoid
BUFFER that real checkpoints carry, token_embedding-tied decoder), the
flax-side tree comes from ``jax.eval_shape`` (zero FLOPs/memory), and
the test asserts exact two-way key-set AND shape equality after
conversion. Any real checkpoint key that would be silently dropped, and
any model parameter a real checkpoint would leave random, fails loudly
— for tiny through large-v3 (VERDICT r4 item 7; reference triage
semantics: avsl/whisper_flamingo_ft_ami.py:377-446).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avsl_tpu.core.config import AVHuBERTConfig, WhisperConfig
from avsl_tpu.core.tree import path_str
from avsl_tpu.models import Whisper
from avsl_tpu.models.avhubert import AVHuBERTForSpeech2Text
from avsl_tpu.models.convert import (
    _AVHUBERT_SKIP,
    convert_avhubert_state_dict,
    convert_whisper_state_dict,
)
from avsl_tpu.models.layers import sinusoid_embedding

ALL_WHISPER_SIZES = [
    "tiny", "base", "small", "medium", "large", "large-v2", "large-v3",
    "tiny.en", "base.en", "small.en", "medium.en",
]
# eval_shape tracing of the 32-layer models takes tens of seconds; the
# fast gate keeps the sizes that cover every schema variation (vocab
# 51864/51865/51866, n_mels 80/128 via large-v3's row in the preset
# table is exercised in slow)
FAST_WHISPER_SIZES = ["tiny", "base", "tiny.en"]


def published_whisper_sd_shapes(cfg: WhisperConfig) -> dict:
    """{torch key: shape} for a published OpenAI Whisper checkpoint.

    Schema per openai/whisper model.py: AudioEncoder(conv1, conv2,
    positional_embedding BUFFER, blocks, ln_post), TextDecoder(
    token_embedding, positional_embedding PARAMETER, blocks, ln),
    ResidualAttentionBlock(attn{query,key,value,out} with biasless key,
    attn_ln, [cross_attn, cross_attn_ln], mlp.0, mlp.2, mlp_ln).
    """
    d, dt = cfg.n_audio_state, cfg.n_text_state
    sd = {
        "encoder.conv1.weight": (d, cfg.n_mels, 3),
        "encoder.conv1.bias": (d,),
        "encoder.conv2.weight": (d, d, 3),
        "encoder.conv2.bias": (d,),
        "encoder.positional_embedding": (cfg.n_audio_ctx, d),
        "encoder.ln_post.weight": (d,),
        "encoder.ln_post.bias": (d,),
        "decoder.token_embedding.weight": (cfg.n_vocab, dt),
        "decoder.positional_embedding": (cfg.n_text_ctx, dt),
        "decoder.ln.weight": (dt,),
        "decoder.ln.bias": (dt,),
    }

    def block(prefix: str, dim: int, cross: bool):
        attns = ["attn", "cross_attn"] if cross else ["attn"]
        for a in attns:
            for proj in ("query", "key", "value", "out"):
                sd[f"{prefix}{a}.{proj}.weight"] = (dim, dim)
                if proj != "key":  # key projection has no bias
                    sd[f"{prefix}{a}.{proj}.bias"] = (dim,)
            sd[f"{prefix}{a}_ln.weight"] = (dim,)
            sd[f"{prefix}{a}_ln.bias"] = (dim,)
        sd[f"{prefix}mlp.0.weight"] = (4 * dim, dim)
        sd[f"{prefix}mlp.0.bias"] = (4 * dim,)
        sd[f"{prefix}mlp.2.weight"] = (dim, 4 * dim)
        sd[f"{prefix}mlp.2.bias"] = (dim,)
        sd[f"{prefix}mlp_ln.weight"] = (dim,)
        sd[f"{prefix}mlp_ln.bias"] = (dim,)

    for i in range(cfg.n_audio_layer):
        block(f"encoder.blocks.{i}.", d, cross=False)
    for i in range(cfg.n_text_layer):
        block(f"decoder.blocks.{i}.", dt, cross=True)
    return sd


def _shape_only_state(shapes: dict) -> dict:
    """Zero-memory arrays for shape-level conversion; the encoder
    positional buffer must hold REAL sinusoid values (the converter
    verifies it against the recomputed table)."""
    out = {}
    for k, shape in shapes.items():
        if k == "encoder.positional_embedding":
            out[k] = sinusoid_embedding(shape[0], shape[1])
        else:
            out[k] = np.broadcast_to(np.float32(0), shape)
    return out


def _flat_shapes(tree) -> dict:
    return {
        path_str(path): leaf.shape
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def _check_whisper_schema(size: str):
    cfg = WhisperConfig.from_name(size, dtype="float32")
    model = Whisper(cfg)
    variables = jax.eval_shape(
        model.init,
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, cfg.n_mels, 64), jnp.float32),
        jax.ShapeDtypeStruct((1, 3), jnp.int32),
    )
    model_shapes = _flat_shapes(variables["params"])

    sd_shapes = published_whisper_sd_shapes(cfg)
    converted = convert_whisper_state_dict(_shape_only_state(sd_shapes))
    conv_shapes = {k: v.shape for k, v in converted.items()}

    unexpected = sorted(set(conv_shapes) - set(model_shapes))
    missing = sorted(set(model_shapes) - set(conv_shapes))
    assert unexpected == [], f"{size}: checkpoint keys dropped: {unexpected[:8]}"
    assert missing == [], f"{size}: params left random: {missing[:8]}"
    mismatched = {
        k: (conv_shapes[k], model_shapes[k])
        for k in model_shapes
        if conv_shapes[k] != model_shapes[k]
    }
    assert mismatched == {}, f"{size}: shape drift: {dict(list(mismatched.items())[:5])}"


@pytest.mark.parametrize("size", FAST_WHISPER_SIZES)
def test_whisper_key_schema_fast(size):
    _check_whisper_schema(size)


@pytest.mark.slow
@pytest.mark.parametrize(
    "size", [s for s in ALL_WHISPER_SIZES if s not in FAST_WHISPER_SIZES]
)
def test_whisper_key_schema_all_sizes(size):
    _check_whisper_schema(size)


def test_positional_buffer_mismatch_is_loud():
    """A checkpoint whose sinusoid buffer disagrees with the recomputed
    table must fail conversion, not silently run with different
    positions."""
    cfg = WhisperConfig.from_name("tiny", dtype="float32")
    state = _shape_only_state(published_whisper_sd_shapes(cfg))
    state["encoder.positional_embedding"] = (
        state["encoder.positional_embedding"] + 0.5
    )
    with pytest.raises(ValueError, match="positional_embedding"):
        convert_whisper_state_dict(state)


# ---------------------------------------------------------------------------
# fairseq AV-HuBERT at the published large card
# ---------------------------------------------------------------------------


def published_avhubert_sd_shapes(cfg: AVHuBERTConfig) -> dict:
    """{fairseq key: shape} for an AV-HuBERT seq2seq fine-tune checkpoint
    (fairseq AVHubertSeq2Seq layout; the reference loads these via
    av_hubert_path, docs/fix/AVHUBERT_WHISPER_FLAMINGO_FIX.md:160-175).
    Includes the pretrain-only and buffer keys a real file carries
    (label_embs_concat, final_proj, num_batches_tracked,
    embed_positions._float_tensor) that conversion must SKIP."""
    H, F = cfg.hidden_size, cfg.intermediate_size
    P = "encoder.w2v_model."
    sd = {
        P + "feature_extractor_audio.proj.weight": (H, cfg.audio_feat_dim),
        P + "feature_extractor_audio.proj.bias": (H,),
        P + "feature_extractor_video.proj.weight": (H, cfg.visual_backbone_channels),
        P + "feature_extractor_video.proj.bias": (H,),
        P + "mask_emb": (H,),
        P + "label_embs_concat": (4, cfg.final_dim),
        P + "final_proj.weight": (cfg.final_dim, H),
        P + "final_proj.bias": (cfg.final_dim,),
    }
    fused = 2 * H if cfg.modality_fuse == "concat" else H
    sd[P + "post_extract_proj.weight"] = (H, fused)
    sd[P + "post_extract_proj.bias"] = (H,)
    sd[P + "layer_norm.weight"] = (fused,)
    sd[P + "layer_norm.bias"] = (fused,)

    R = P + "feature_extractor_video.resnet."
    fc, bc = cfg.visual_frontend_channels, cfg.visual_backbone_channels
    sd[R + "frontend3D.0.weight"] = (fc, 1, 5, 7, 7)
    for leaf in ("weight", "bias", "running_mean", "running_var"):
        sd[R + f"frontend3D.1.{leaf}"] = (fc,)
    sd[R + "frontend3D.1.num_batches_tracked"] = ()
    sd[R + "frontend3D.2.weight"] = (fc,)
    planes = [max(bc // 8, 8), max(bc // 4, 8), max(bc // 2, 8), bc]
    inp = fc
    for stage, pl_ in enumerate(planes, start=1):
        for b in range(2):
            pre = R + f"trunk.layer{stage}.{b}."
            cin = inp if b == 0 else pl_
            sd[pre + "conv1.weight"] = (pl_, cin, 3, 3)
            sd[pre + "conv2.weight"] = (pl_, pl_, 3, 3)
            for bn in ("bn1", "bn2"):
                for leaf in ("weight", "bias", "running_mean", "running_var"):
                    sd[pre + f"{bn}.{leaf}"] = (pl_,)
                sd[pre + f"{bn}.num_batches_tracked"] = ()
            sd[pre + "relu1.weight"] = (pl_,)
            sd[pre + "relu2.weight"] = (pl_,)
            if b == 0 and cin != pl_:
                sd[pre + "downsample.0.weight"] = (pl_, cin, 1, 1)
                for leaf in ("weight", "bias", "running_mean", "running_var"):
                    sd[pre + f"downsample.1.{leaf}"] = (pl_,)
                sd[pre + "downsample.1.num_batches_tracked"] = ()
        inp = pl_

    sd[P + "encoder.pos_conv.0.weight_g"] = (1, 1, cfg.conv_pos)
    sd[P + "encoder.pos_conv.0.weight_v"] = (
        H, H // cfg.conv_pos_groups, cfg.conv_pos)
    sd[P + "encoder.pos_conv.0.bias"] = (H,)
    for i in range(cfg.num_hidden_layers):
        pre = P + f"encoder.layers.{i}."
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[pre + f"self_attn.{proj}.weight"] = (H, H)
            sd[pre + f"self_attn.{proj}.bias"] = (H,)
        sd[pre + "self_attn_layer_norm.weight"] = (H,)
        sd[pre + "self_attn_layer_norm.bias"] = (H,)
        sd[pre + "fc1.weight"] = (F, H)
        sd[pre + "fc1.bias"] = (F,)
        sd[pre + "fc2.weight"] = (H, F)
        sd[pre + "fc2.bias"] = (H,)
        sd[pre + "final_layer_norm.weight"] = (H,)
        sd[pre + "final_layer_norm.bias"] = (H,)
    sd[P + "encoder.layer_norm.weight"] = (H,)
    sd[P + "encoder.layer_norm.bias"] = (H,)

    D, DF = cfg.decoder_hidden_size, cfg.decoder_ffn_dim
    sd["decoder.embed_tokens.weight"] = (cfg.vocab_size, D)
    sd["decoder.embed_positions._float_tensor"] = (1,)
    for i in range(cfg.decoder_layers):
        pre = f"decoder.layers.{i}."
        for attn in ("self_attn", "encoder_attn"):
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                sd[pre + f"{attn}.{proj}.weight"] = (D, D)
                sd[pre + f"{attn}.{proj}.bias"] = (D,)
            sd[pre + f"{attn}_layer_norm.weight"] = (D,)
            sd[pre + f"{attn}_layer_norm.bias"] = (D,)
        sd[pre + "fc1.weight"] = (DF, D)
        sd[pre + "fc1.bias"] = (DF,)
        sd[pre + "fc2.weight"] = (D, DF)
        sd[pre + "fc2.bias"] = (D,)
        sd[pre + "final_layer_norm.weight"] = (D,)
        sd[pre + "final_layer_norm.bias"] = (D,)
    sd["decoder.layer_norm.weight"] = (D,)
    sd["decoder.layer_norm.bias"] = (D,)
    return sd


@pytest.mark.slow
def test_avhubert_key_schema_published_large():
    """Full key-set + shape parity at the reference's actual model card
    (config/avhubert_large.yaml in /root/reference: H=1024, 24 layers,
    9 decoder layers), via eval_shape — no weights materialized."""
    cfg = AVHuBERTConfig.from_yaml("/root/reference/config/avhubert_large.yaml")
    _check_avhubert_schema(cfg)


def test_avhubert_key_schema_tiny():
    _check_avhubert_schema(AVHuBERTConfig.tiny_test(dtype="float32"))


def _check_avhubert_schema(cfg):
    model = AVHuBERTForSpeech2Text(cfg)
    variables = jax.eval_shape(
        model.init,
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 12, cfg.audio_feat_dim), jnp.float32),
        jax.ShapeDtypeStruct((1, 12, 88, 88, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, 3), jnp.int32),
    )
    model_shapes = _flat_shapes(variables)

    sd_shapes = published_avhubert_sd_shapes(cfg)
    state = {k: np.broadcast_to(np.float32(0.5), s) for k, s in sd_shapes.items()}
    converted = convert_avhubert_state_dict(state)
    conv_shapes = {k: np.shape(v) for k, v in converted.items()}

    unexpected = sorted(set(conv_shapes) - set(model_shapes))
    missing = sorted(set(model_shapes) - set(conv_shapes))
    assert unexpected == [], f"checkpoint keys dropped: {unexpected[:8]}"
    assert missing == [], f"params left random: {missing[:8]}"
    mismatched = {
        k: (conv_shapes[k], model_shapes[k])
        for k in model_shapes
        if conv_shapes[k] != model_shapes[k]
    }
    assert mismatched == {}, f"shape drift: {dict(list(mismatched.items())[:5])}"

    # keys a real file carries that conversion must deliberately skip —
    # all covered by the skip table, none reachable any other way
    skipped = [k for k in sd_shapes if _AVHUBERT_SKIP.search(k)]
    assert any("label_embs_concat" in k for k in skipped)
    assert any("num_batches_tracked" in k for k in skipped)
    assert any("_float_tensor" in k for k in skipped)
