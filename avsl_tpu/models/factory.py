"""Model assembly: Whisper(+Flamingo) with an AV-HuBERT video encoder.

The reference assembles this via ``whisper.load_model(..., video=True,
av_hubert_encoder=..., add_gated_x_attn=...)`` from its external fork
(avsl/whisper_flamingo_ft_ami.py:337-348 in /root/reference); here it is
an explicit factory over the flax modules.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn

from avsl_tpu.core.config import AVHuBERTConfig, WhisperConfig
from avsl_tpu.models.avhubert import AVHuBERTModel
from avsl_tpu.models.whisper import Whisper


def make_av_hubert_video_encoder(av_cfg: AVHuBERTConfig) -> nn.Module:
    """AV-HuBERT trunk run video-only as the Flamingo video encoder."""

    cfg = dataclasses.replace(av_cfg, use_audio=False, modality_fuse="add")

    class VideoEncoder(nn.Module):
        # introspectable (tests, tooling); default_factory because the
        # config dataclass is mutable
        av_cfg: AVHuBERTConfig = dataclasses.field(
            default_factory=lambda: cfg
        )

        @nn.compact
        def __call__(self, video, mask=None, deterministic=True,
                     use_running_average=None):
            return AVHuBERTModel(self.av_cfg, name="av_hubert")(
                video=video, padding_mask=mask, deterministic=deterministic,
                use_running_average=use_running_average,
            )

    return VideoEncoder()


def build_whisper_flamingo(
    model_name: str = "large-v2",
    vocab_size: Optional[int] = None,
    add_gated_x_attn: int = 1,
    use_av_hubert_encoder: bool = True,
    av_hubert_cfg: Optional[AVHuBERTConfig] = None,
    dropout_rate: float = 0.0,
    dtype: str = "bfloat16",
    remat: bool = False,
    remat_policy: str = "block",
) -> Tuple[Whisper, WhisperConfig]:
    """Build the Whisper(+Flamingo) model.

    ``model_name`` accepts the Whisper presets plus "test" (miniature).
    ``vocab_size`` overrides the preset vocab (tokenizer-driven runs).
    """
    if model_name == "test":
        w_cfg = WhisperConfig.tiny_test(dtype=dtype)
        av_hubert_cfg = av_hubert_cfg or AVHuBERTConfig.tiny_test(dtype=dtype)
    else:
        w_cfg = WhisperConfig.from_name(model_name, dtype=dtype)
        av_hubert_cfg = av_hubert_cfg or AVHuBERTConfig(dtype=dtype)

    overrides: dict = {
        "add_gated_x_attn": int(add_gated_x_attn),
        "dropout_rate": dropout_rate,
        "remat": remat,
        "remat_policy": remat_policy,
    }
    if vocab_size is not None:
        overrides["n_vocab"] = int(vocab_size)
    if use_av_hubert_encoder:
        overrides["video_state"] = av_hubert_cfg.hidden_size
    w_cfg = dataclasses.replace(w_cfg, **overrides)
    # gradient checkpointing covers the WHOLE model like the reference's
    # gradient_checkpointing_enable walk (utils/memory_utils.py:85-97):
    # the AV-HuBERT trunk reads its own remat flag
    av_hubert_cfg = dataclasses.replace(
        av_hubert_cfg, remat=remat, remat_policy=remat_policy
    )

    video_model = (
        make_av_hubert_video_encoder(av_hubert_cfg)
        if (use_av_hubert_encoder and add_gated_x_attn)
        else None
    )
    return Whisper(w_cfg, video_model=video_model), w_cfg
