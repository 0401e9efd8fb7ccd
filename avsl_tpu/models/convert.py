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


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a .pt checkpoint to {key: float32 ndarray} (handles the
    {'model_state_dict'| 'state_dict' | 'model'} nestings)."""
    import torch

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
    """Torch Whisper state_dict -> flat flax path dict."""
    out = {}
    for k, v in state.items():
        path = rename_whisper_key(k)
        out[path] = _to_flax_array(path, v)
    return out


def load_torch_checkpoint_into(
    params: Any, ckpt_path: str, converter=convert_whisper_state_dict
) -> Tuple[Any, Dict[str, list]]:
    """Full pipeline: read .pt -> rename/transpose -> partial_load triage."""
    from avsl_tpu.train.checkpoints import partial_load

    state = load_torch_state_dict(ckpt_path)
    flat = converter(state)
    return partial_load(params, flat)
