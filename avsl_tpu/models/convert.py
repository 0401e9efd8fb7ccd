"""Torch-checkpoint -> flax parameter conversion.

The reference fine-tunes from OpenAI Whisper ``.pt`` checkpoints and
fairseq AV-HuBERT ``.pt`` weights with a strict->non-strict partial load
and missing/unexpected-key triage (avsl/whisper_flamingo_ft_ami.py:377-446
in /root/reference). Here: a torch ``state_dict`` (CPU torch is available
in this environment) is flattened to ``path -> ndarray``, renamed through
a rule table into this framework's flax tree layout, transposed where
torch/flax conventions differ (Linear kernels, conv filters), and merged
via ``train.checkpoints.partial_load`` which reports the same triage.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

# (regex, replacement) applied in order to each torch key; the result is a
# "/"-joined flax path. Covers the OpenAI Whisper layout.
_WHISPER_RULES: List[Tuple[str, str]] = [
    (r"^model\.", ""),  # some checkpoints nest under model.
    (r"^encoder\.conv(\d)\.(weight|bias)$", r"encoder/conv\1/\2"),
    (r"^encoder\.blocks\.(\d+)\.", r"encoder/block_\1/"),
    (r"^encoder\.ln_post\.", r"encoder/ln_post/"),
    (r"^decoder\.token_embedding\.weight$", r"decoder/token_embedding/embedding"),
    (r"^decoder\.positional_embedding$", r"decoder/positional_embedding"),
    (r"^decoder\.blocks\.(\d+)\.", r"decoder/block_\1/"),
    (r"^decoder\.ln\.", r"decoder/ln/"),
    # block-internal names (cross rules first: "attn.query." is a substring
    # of "cross_attn.query.")
    (r"cross_attn\.query\.", r"cross_attn/q_proj/"),
    (r"cross_attn\.key\.", r"cross_attn/k_proj/"),
    (r"cross_attn\.value\.", r"cross_attn/v_proj/"),
    (r"cross_attn\.out\.", r"cross_attn/out_proj/"),
    (r"cross_attn_ln\.", r"cross_attn_ln/"),
    (r"attn\.query\.", r"self_attn/q_proj/"),
    (r"attn\.key\.", r"self_attn/k_proj/"),
    (r"attn\.value\.", r"self_attn/v_proj/"),
    (r"attn\.out\.", r"self_attn/out_proj/"),
    (r"attn_ln\.", r"self_attn_ln/"),
    (r"mlp\.0\.", r"mlp/fc1/"),
    (r"mlp\.2\.", r"mlp/fc2/"),
    (r"mlp_ln\.", r"mlp_ln/"),
    # leaf renames
    (r"/weight$", r"/kernel"),
    (r"/bias$", r"/bias"),
    (r"(self_attn_ln|cross_attn_ln|mlp_ln|ln_post|ln)/kernel$", r"\1/LayerNorm_0/scale"),
    (r"(self_attn_ln|cross_attn_ln|mlp_ln|ln_post|ln)/bias$", r"\1/LayerNorm_0/bias"),
]


def rename_whisper_key(key: str) -> str:
    for pat, rep in _WHISPER_RULES:
        key = re.sub(pat, rep, key)
    return key


def _to_flax_array(path: str, value: np.ndarray) -> np.ndarray:
    """Transpose torch layouts into flax conventions."""
    v = np.asarray(value)
    if path.endswith("/kernel"):
        if v.ndim == 2:  # Linear: torch [out, in] -> flax [in, out]
            return v.T
        if v.ndim == 3:  # Conv1d: torch [out, in, k] -> flax [k, in, out]
            return v.transpose(2, 1, 0)
        if v.ndim == 4:  # Conv2d: torch [out, in, kh, kw] -> [kh, kw, in, out]
            return v.transpose(2, 3, 1, 0)
        if v.ndim == 5:  # Conv3d: [out, in, kt, kh, kw] -> [kt, kh, kw, in, out]
            return v.transpose(2, 3, 4, 1, 0)
    return v


def load_torch_state_dict(
    path: str, allow_unsafe_pickle: bool = False
) -> Dict[str, np.ndarray]:
    """Read a .pt checkpoint to {key: float32 ndarray} (handles the
    {'model_state_dict'| 'state_dict' | 'model'} nestings).

    Loads with ``weights_only=True`` (no arbitrary-code deserialization).
    Checkpoints that pickle custom objects (e.g. fairseq configs) need
    ``allow_unsafe_pickle=True`` — an explicit opt-in, because unpickling
    executes code from the file."""
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        if not allow_unsafe_pickle:
            raise ValueError(
                f"{path} is not loadable with weights_only=True ({e}); "
                "pass allow_unsafe_pickle=True to permit full unpickling "
                "if you trust this file"
            ) from e
        obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model_state_dict", "state_dict", "model"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    if not isinstance(obj, dict):
        raise ValueError(f"Unrecognized checkpoint structure in {path}")
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().to(torch.float32).cpu().numpy()
    return out


def convert_whisper_state_dict(
    state: Dict[str, np.ndarray]
) -> Dict[str, np.ndarray]:
    """Torch Whisper state_dict -> flat flax path dict.

    ``encoder.positional_embedding`` is a registered BUFFER in the OpenAI
    model (sinusoids computed at construction), so published checkpoints
    carry it even though it is not a parameter; this framework's encoder
    recomputes the same sinusoids at apply time (models/whisper.py). The
    buffer is consumed here (not forwarded as an 'unexpected' key) after
    verifying it matches the recomputed table — a mismatch would mean the
    encoder positions silently diverge from the checkpoint's.
    """
    out = {}
    for k, v in state.items():
        nk = re.sub(r"^model\.", "", k)
        if nk == "encoder.positional_embedding":
            from avsl_tpu.models.layers import sinusoid_embedding

            buf = np.asarray(v, np.float32)
            ours = sinusoid_embedding(buf.shape[0], buf.shape[1])
            if not np.allclose(buf, ours, atol=5e-3):
                raise ValueError(
                    "checkpoint encoder.positional_embedding does not match "
                    "the recomputed Whisper sinusoid table "
                    f"(max abs diff {np.abs(buf - ours).max():.4g}); the "
                    "encoder would run with different positions than the "
                    "checkpoint was trained with"
                )
            continue
        path = rename_whisper_key(k)
        out[path] = _to_flax_array(path, v)
    return out


# parameters whose silent non-load leaves the model effectively random:
# token/positional embeddings and output heads. A vocab-size disagreement
# (e.g. ByteTokenizer's ~271 ids vs a real Whisper's 51865-row
# token_embedding) lands these in shape_mismatch, which non-strict
# partial_load would otherwise skip without a word.
_CRITICAL_MISMATCH = re.compile(
    r"(token_embedding|embed_tokens|positional_embedding|embed_positions"
    r"|output_proj|lm_head)"
)


def load_torch_checkpoint_into(
    params: Any, ckpt_path: str, converter=convert_whisper_state_dict,
    allow_unsafe_pickle: bool = False, allow_embedding_mismatch: bool = False,
) -> Tuple[Any, Dict[str, list]]:
    """Full pipeline: read .pt -> rename/transpose -> partial_load triage.

    Raises when an embedding/output-head tensor is skipped for a shape
    mismatch (usually a tokenizer/vocab-size disagreement) unless
    ``allow_embedding_mismatch=True`` — the reference resizes embeddings
    for ``<laugh>`` *after* loading (whisper_flamingo_ft_ami.py:457-467),
    so a mismatch at load time means the model would train from a random
    embedding while claiming to be 'converted'."""
    from avsl_tpu.train.checkpoints import partial_load

    state = load_torch_state_dict(ckpt_path, allow_unsafe_pickle=allow_unsafe_pickle)
    flat = converter(state)
    new_params, report = partial_load(params, flat)
    # the guard must catch an embedding lost ANY way: shape mismatch
    # (vocab drift) OR rename drift (converted key not in the model tree
    # -> 'unexpected'). A critical key in 'missing' is drift only when the
    # checkpoint DID cover that subtree (some sibling under the same
    # params/<top> prefix loaded) — an encoder-only pretrain checkpoint
    # legitimately leaves the whole decoder (embed_tokens, output_proj)
    # to random init, the reference's own pretrain->fine-tune handoff.
    def _top(key: str) -> str:
        parts = [p for p in key.split("/") if p not in ("params", "batch_stats")]
        return parts[0] if parts else key

    loaded_tops = {_top(k) for k in flat}
    critical = [
        k
        for bucket in ("shape_mismatch", "unexpected")
        for k in report[bucket]
        if _CRITICAL_MISMATCH.search(k)
    ]
    critical += [
        k
        for k in report["missing"]
        if _CRITICAL_MISMATCH.search(k) and _top(k) in loaded_tops
    ]
    if critical and not allow_embedding_mismatch:
        raise ValueError(
            f"checkpoint {ckpt_path}: embedding/output tensors skipped "
            f"(shape mismatch or key drift): {critical}. A shape mismatch "
            "usually means the model's vocab size does not match the "
            "checkpoint (use the real BPE vocab, then resize for added "
            "tokens after loading); unexpected/missing keys mean the "
            "converter's rename rules drifted from the model layout. Pass "
            "allow_embedding_mismatch=True to proceed anyway."
        )
    return new_params, report


# ---------------------------------------------------------------------------
# fairseq AV-HuBERT checkpoints
# ---------------------------------------------------------------------------
#
# The reference consumes the public fairseq AV-HuBERT .pt weights
# (whisper-flamingo loads them via `av_hubert_path`, and
# avsl/modules/resnet.py:177-198 split-loads the frontend3D/trunk subtrees
# of the same layout). Key layout per the fairseq AVHubertModel:
# `feature_extractor_{audio,video}.*`, `post_extract_proj`, `mask_emb`,
# `layer_norm`, `encoder.pos_conv.0.{weight_g,weight_v,bias}` (weight-normed
# grouped Conv1d), `encoder.layers.N.*`; seq2seq fine-tunes nest the encoder
# under `encoder.w2v_model.` and add a `decoder.*` transformer.

_AVHUBERT_RULES: List[Tuple[str, str]] = [
    (r"^encoder\.w2v_model\.", r""),  # seq2seq fine-tune nesting
    # frontends
    (r"^feature_extractor_audio\.proj\.", r"params/avhubert/encoder/audio_encoder/proj/"),
    (r"^feature_extractor_video\.proj\.", r"params/avhubert/encoder/visual_encoder/proj/"),
    (r"^feature_extractor_video\.resnet\.", r"RESNET/"),
    (r"^RESNET/frontend3D\.0\.weight$", r"RESNET/stem_conv/kernel"),
    (r"^RESNET/frontend3D\.1\.", r"RESNET/stem_bn."),
    (r"^RESNET/frontend3D\.2\.weight$", r"RESNET/stem_prelu/negative_slope"),
    (r"^RESNET/trunk\.layer(\d)\.(\d)\.", r"RESNET/trunk.layer\1_\2."),
    (r"\.conv(\d)\.weight$", r".conv\1/kernel"),
    (r"\.relu(\d)\.weight$", r".prelu\1/negative_slope"),
    (r"\.downsample\.0\.weight$", r".downsample_conv/kernel"),
    (r"\.downsample\.1\.", r".downsample_bn."),
    # BatchNorm leaves: affine -> params, running stats -> batch_stats
    # (conv kernels and PReLU slopes were consumed by the rules above, so
    # every remaining RESNET .weight/.bias is a BN affine)
    (r"^RESNET/(.+)\.weight$", r"RESNET/\1/scale"),
    (r"^RESNET/(.+)\.bias$", r"RESNET/\1/bias"),
    (r"^RESNET/(.+)\.running_mean$", r"STATS/\1/mean"),
    (r"^RESNET/(.+)\.running_var$", r"STATS/\1/var"),
    (r"^RESNET/", r"params/avhubert/encoder/visual_encoder/frontend/"),
    (r"^STATS/", r"batch_stats/avhubert/encoder/visual_encoder/frontend/"),
    (r"\.", r"/"),  # remaining torch dots
    # wrapper-level pieces
    (r"^post_extract_proj/", r"params/avhubert/encoder/post_extract_proj/"),
    (r"^mask_emb$", r"params/avhubert/encoder/mask_emb"),
    (r"^layer_norm/(weight|scale)$", r"params/avhubert/encoder/fuse_ln/LayerNorm_0/scale"),
    (r"^layer_norm/bias$", r"params/avhubert/encoder/fuse_ln/LayerNorm_0/bias"),
    # transformer encoder
    (r"^encoder/pos_conv/0/bias$",
     r"params/avhubert/encoder/transformer/pos_conv/conv/bias"),
    (r"^encoder/layers/(\d+)/self_attn/",
     r"params/avhubert/encoder/transformer/layer_\1/self_attn/"),
    (r"^encoder/layers/(\d+)/self_attn_layer_norm/",
     r"params/avhubert/encoder/transformer/layer_\1/self_attn_ln/LayerNorm_0/"),
    (r"^encoder/layers/(\d+)/fc1/",
     r"params/avhubert/encoder/transformer/layer_\1/mlp/fc1/"),
    (r"^encoder/layers/(\d+)/fc2/",
     r"params/avhubert/encoder/transformer/layer_\1/mlp/fc2/"),
    (r"^encoder/layers/(\d+)/final_layer_norm/",
     r"params/avhubert/encoder/transformer/layer_\1/mlp_ln/LayerNorm_0/"),
    (r"^encoder/layer_norm/", r"params/avhubert/encoder/transformer/LNFINAL/"),
    # decoder (seq2seq fine-tunes)
    (r"^decoder/embed_tokens/weight$", r"params/decoder/embed_tokens/embedding"),
    (r"^decoder/embed_positions/weight$", r"params/decoder/embed_positions/embedding"),
    (r"^decoder/layers/(\d+)/self_attn/", r"params/decoder/layer_\1/self_attn/"),
    (r"^decoder/layers/(\d+)/encoder_attn/", r"params/decoder/layer_\1/cross_attn/"),
    (r"^decoder/layers/(\d+)/self_attn_layer_norm/",
     r"params/decoder/layer_\1/self_attn_ln/LayerNorm_0/"),
    (r"^decoder/layers/(\d+)/encoder_attn_layer_norm/",
     r"params/decoder/layer_\1/cross_attn_ln/LayerNorm_0/"),
    (r"^decoder/layers/(\d+)/fc1/", r"params/decoder/layer_\1/mlp/fc1/"),
    (r"^decoder/layers/(\d+)/fc2/", r"params/decoder/layer_\1/mlp/fc2/"),
    (r"^decoder/layers/(\d+)/final_layer_norm/",
     r"params/decoder/layer_\1/mlp_ln/LayerNorm_0/"),
    (r"^decoder/layer_norm/", r"params/decoder/ln/LayerNorm_0/"),
    (r"^decoder/(output_projection|embed_out)/weight$",
     r"params/decoder/output_proj/kernel"),
    # leaf renames on the converted side
    (r"/weight$", r"/kernel"),
    (r"(LayerNorm_0)/kernel$", r"\1/scale"),
]

# fairseq keys with no counterpart here (pretraining heads, torch buffers)
_AVHUBERT_SKIP = re.compile(
    r"(label_embs_concat|final_proj\.|target_glu|num_batches_tracked"
    r"|num_updates|_float_tensor|version)"
)


def rename_avhubert_key(key: str, layer_norm_first: bool = True) -> str:
    for pat, rep in _AVHUBERT_RULES:
        key = re.sub(pat, rep, key)
    # fairseq applies `encoder.layer_norm` after the block stack when
    # layer_norm_first (pre-norm blocks) and before it otherwise
    key = key.replace("/LNFINAL/", "/ln_post/LayerNorm_0/" if layer_norm_first
                      else "/ln_pre/LayerNorm_0/")
    return re.sub(r"(LayerNorm_0)/kernel$", r"\1/scale", key)


def convert_avhubert_state_dict(
    state: Dict[str, np.ndarray], layer_norm_first: bool = True
) -> Dict[str, np.ndarray]:
    """fairseq AV-HuBERT state_dict -> flat path dict over the FULL
    variables tree of ``AVHuBERTForSpeech2Text`` (``params/...`` +
    ``batch_stats/...``), ready for ``partial_load(variables, ...)``.

    The weight-normed positional conv (``encoder.pos_conv.0.weight_g`` /
    ``weight_v``, torch ``dim=2``) is recombined into the effective dense
    kernel and re-decomposed into flax ``nn.WeightNorm``'s (direction,
    per-output-channel scale) parameterization, which reproduces the same
    effective weight at apply time.
    """
    out: Dict[str, np.ndarray] = {}
    pos_g = pos_v = None
    for k, v in state.items():
        if _AVHUBERT_SKIP.search(k):
            continue
        nk = re.sub(r"^encoder\.w2v_model\.", "", k)
        if nk == "encoder.pos_conv.0.weight_g":
            pos_g = np.asarray(v)
            continue
        if nk == "encoder.pos_conv.0.weight_v":
            pos_v = np.asarray(v)
            continue
        if nk == "encoder.pos_conv.0.weight":
            # torch remove_weight_norm renames weight_v/g back to plain
            # 'weight' — without this a re-saved (fused) checkpoint's
            # pos_conv fell through the rules into 'unexpected' and the
            # model silently kept a RANDOM positional conv
            pos_v = np.asarray(v)
            continue
        path = rename_avhubert_key(nk, layer_norm_first)
        val = np.asarray(v)
        if path.endswith("negative_slope"):
            out[path] = val  # per-channel PReLU slopes, shape (C,)
        else:
            out[path] = _to_flax_array(path, val)
    if pos_v is not None:
        # torch: w = g * v / ||v|| with the norm over all dims except dim=2
        # (v: [out, in/groups, k]; g broadcast [1, 1, k])
        if pos_g is not None:
            norm = np.sqrt((pos_v ** 2).sum(axis=(0, 1), keepdims=True))
            w = pos_v * (pos_g / np.maximum(norm, 1e-12))
        else:  # weight-norm already fused (e.g. re-saved checkpoint)
            w = pos_v
        w_flax = w.transpose(2, 1, 0)  # [k, in/groups, out]
        prefix = "params/avhubert/encoder/transformer/pos_conv"
        out[f"{prefix}/conv/kernel"] = w_flax
        # flax nn.WeightNorm: w_eff = scale * kernel/||kernel|| (norm over
        # all axes but the last); scale = ||w|| keeps w_eff == w exactly
        out[f"{prefix}/WeightNorm_0/conv/kernel/scale"] = np.sqrt(
            (w_flax ** 2).sum(axis=(0, 1))
        )
    return out
