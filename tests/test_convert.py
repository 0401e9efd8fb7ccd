"""Torch->flax weight conversion: build a torch Whisper-layout state_dict
for the tiny config, convert, load, and check forward-path effect."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from avsl_tpu.core.config import WhisperConfig
from avsl_tpu.models import Whisper
from avsl_tpu.models.convert import (
    convert_whisper_state_dict,
    load_torch_checkpoint_into,
    rename_whisper_key,
)
from avsl_tpu.train.checkpoints import partial_load


def test_rename_rules():
    cases = {
        "encoder.conv1.weight": "encoder/conv1/kernel",
        "encoder.blocks.3.attn.query.weight": "encoder/block_3/self_attn/q_proj/kernel",
        "encoder.blocks.0.mlp.0.bias": "encoder/block_0/mlp/fc1/bias",
        "encoder.ln_post.weight": "encoder/ln_post/LayerNorm_0/scale",
        "decoder.token_embedding.weight": "decoder/token_embedding/embedding",
        "decoder.blocks.2.cross_attn.key.weight": "decoder/block_2/cross_attn/k_proj/kernel",
        "decoder.blocks.2.attn_ln.bias": "decoder/block_2/self_attn_ln/LayerNorm_0/bias",
        "decoder.positional_embedding": "decoder/positional_embedding",
        "decoder.ln.weight": "decoder/ln/LayerNorm_0/scale",
    }
    for src, want in cases.items():
        assert rename_whisper_key(src) == want, src


def _torch_state_for(cfg: WhisperConfig, rng):
    d, heads = cfg.n_audio_state, cfg.n_audio_head
    sd = {}

    def t(shape):
        return torch.tensor(rng.normal(0, 0.02, shape).astype(np.float32))

    sd["encoder.conv1.weight"] = t((d, cfg.n_mels, 3))
    sd["encoder.conv1.bias"] = t((d,))
    sd["encoder.conv2.weight"] = t((d, d, 3))
    sd["encoder.conv2.bias"] = t((d,))
    for i in range(cfg.n_audio_layer):
        pre = f"encoder.blocks.{i}."
        sd[pre + "attn.query.weight"] = t((d, d))
        sd[pre + "attn.query.bias"] = t((d,))
        sd[pre + "attn.key.weight"] = t((d, d))
        sd[pre + "attn.value.weight"] = t((d, d))
        sd[pre + "attn.value.bias"] = t((d,))
        sd[pre + "attn.out.weight"] = t((d, d))
        sd[pre + "attn.out.bias"] = t((d,))
        sd[pre + "attn_ln.weight"] = t((d,))
        sd[pre + "attn_ln.bias"] = t((d,))
        sd[pre + "mlp.0.weight"] = t((4 * d, d))
        sd[pre + "mlp.0.bias"] = t((4 * d,))
        sd[pre + "mlp.2.weight"] = t((d, 4 * d))
        sd[pre + "mlp.2.bias"] = t((d,))
        sd[pre + "mlp_ln.weight"] = t((d,))
        sd[pre + "mlp_ln.bias"] = t((d,))
    sd["encoder.ln_post.weight"] = t((d,))
    sd["encoder.ln_post.bias"] = t((d,))

    dt = cfg.n_text_state
    sd["decoder.token_embedding.weight"] = t((cfg.n_vocab, dt))
    sd["decoder.positional_embedding"] = t((cfg.n_text_ctx, dt))
    for i in range(cfg.n_text_layer):
        pre = f"decoder.blocks.{i}."
        for blk, names in (
            ("attn", ("query", "key", "value", "out")),
            ("cross_attn", ("query", "key", "value", "out")),
        ):
            for n in names:
                sd[pre + f"{blk}.{n}.weight"] = t((dt, dt))
                if n != "key":
                    sd[pre + f"{blk}.{n}.bias"] = t((dt,))
        for ln in ("attn_ln", "cross_attn_ln", "mlp_ln"):
            sd[pre + ln + ".weight"] = t((dt,))
            sd[pre + ln + ".bias"] = t((dt,))
        sd[pre + "mlp.0.weight"] = t((4 * dt, dt))
        sd[pre + "mlp.0.bias"] = t((4 * dt,))
        sd[pre + "mlp.2.weight"] = t((dt, 4 * dt))
        sd[pre + "mlp.2.bias"] = t((dt,))
    sd["decoder.ln.weight"] = t((dt,))
    sd["decoder.ln.bias"] = t((dt,))
    return sd


def test_full_checkpoint_conversion(tmp_path):
    cfg = WhisperConfig.tiny_test(dtype="float32")
    model = Whisper(cfg)
    mel = jnp.zeros((1, cfg.n_mels, 64), jnp.float32)
    toks = jnp.asarray([[1, 2, 3]])
    variables = model.init(jax.random.PRNGKey(0), mel, toks)

    rng = np.random.default_rng(0)
    sd = _torch_state_for(cfg, rng)
    ckpt = str(tmp_path / "whisper_test.pt")
    torch.save({"model_state_dict": sd}, ckpt)

    before = model.apply(variables, mel, toks)
    new_params, report = load_torch_checkpoint_into(variables["params"], ckpt)
    # every torch tensor must land somewhere, nothing unexpected
    assert report["unexpected"] == [], report["unexpected"][:5]
    assert report["shape_mismatch"] == [], report["shape_mismatch"][:5]
    assert len(report["loaded"]) == len(sd)
    # nothing from the flax tree except (none) should be missing
    assert report["missing"] == [], report["missing"][:5]

    after = model.apply({"params": new_params}, mel, toks)
    assert np.abs(np.asarray(after) - np.asarray(before)).max() > 1e-3
    assert np.isfinite(np.asarray(after)).all()
