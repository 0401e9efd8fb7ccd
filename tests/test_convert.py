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
    # real checkpoints carry the encoder's sinusoid BUFFER; conversion
    # verifies it against the recomputed table and consumes it
    from avsl_tpu.models.layers import sinusoid_embedding

    sd["encoder.positional_embedding"] = torch.tensor(
        sinusoid_embedding(cfg.n_audio_ctx, d)
    )

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
    # every tensor loads except the sinusoid buffer (consumed + verified)
    assert len(report["loaded"]) == len(sd) - 1
    # nothing from the flax tree except (none) should be missing
    assert report["missing"] == [], report["missing"][:5]

    after = model.apply({"params": new_params}, mel, toks)
    assert np.abs(np.asarray(after) - np.asarray(before)).max() > 1e-3
    assert np.isfinite(np.asarray(after)).all()


def _torch_whisper_encoder_forward(sd, mel_np, cfg):
    """Independent torch reference forward of the OpenAI Whisper encoder
    (published architecture: conv x2 + exact GELU, sinusoidal positions,
    pre-norm blocks with q/k each scaled by d_head**-0.25, biasless key
    projection, fp32 softmax, final LayerNorm). Computed directly from the
    torch-format state dict — no code shared with the flax model."""
    import torch.nn.functional as F

    d, H = cfg.n_audio_state, cfg.n_audio_head
    dh = d // H
    with torch.no_grad():
        x = torch.tensor(mel_np)
        x = F.gelu(F.conv1d(x, sd["encoder.conv1.weight"], sd["encoder.conv1.bias"], padding=1))
        x = F.gelu(F.conv1d(x, sd["encoder.conv2.weight"], sd["encoder.conv2.bias"], stride=2, padding=1))
        x = x.permute(0, 2, 1)  # [B, T, d]
        half = d // 2
        inc = np.log(10000.0) / (half - 1)
        inv = np.exp(-inc * np.arange(half))
        st = np.arange(x.shape[1])[:, None] * inv[None, :]
        pos = np.concatenate([np.sin(st), np.cos(st)], axis=1).astype(np.float32)
        x = x + torch.tensor(pos)

        def ln(v, w, b):
            return F.layer_norm(v, (d,), sd[w], sd[b])

        B, T = x.shape[0], x.shape[1]
        for i in range(cfg.n_audio_layer):
            p = f"encoder.blocks.{i}."
            xin = ln(x, p + "attn_ln.weight", p + "attn_ln.bias")
            q = F.linear(xin, sd[p + "attn.query.weight"], sd[p + "attn.query.bias"])
            k = F.linear(xin, sd[p + "attn.key.weight"])
            v = F.linear(xin, sd[p + "attn.value.weight"], sd[p + "attn.value.bias"])
            q = q.view(B, T, H, dh).permute(0, 2, 1, 3) * dh ** -0.25
            k = k.view(B, T, H, dh).permute(0, 2, 3, 1) * dh ** -0.25
            v = v.view(B, T, H, dh).permute(0, 2, 1, 3)
            w = torch.softmax((q @ k).float(), dim=-1)
            out = (w @ v).permute(0, 2, 1, 3).reshape(B, T, d)
            x = x + F.linear(out, sd[p + "attn.out.weight"], sd[p + "attn.out.bias"])
            xin = ln(x, p + "mlp_ln.weight", p + "mlp_ln.bias")
            h = F.gelu(F.linear(xin, sd[p + "mlp.0.weight"], sd[p + "mlp.0.bias"]))
            x = x + F.linear(h, sd[p + "mlp.2.weight"], sd[p + "mlp.2.bias"])
        x = ln(x, "encoder.ln_post.weight", "encoder.ln_post.bias")
    return x.numpy()


def test_whisper_conversion_numerics(tmp_path):
    """Converted weights must reproduce the torch forward pass — key layout
    alone can hide transposition/scaling bugs (ADVICE r1). Triage
    semantics: whisper_flamingo_ft_ami.py:377-446."""
    cfg = WhisperConfig.tiny_test(dtype="float32")
    model = Whisper(cfg)
    mel_np = np.random.default_rng(5).normal(size=(2, cfg.n_mels, 64)).astype(np.float32)
    mel = jnp.asarray(mel_np)
    toks = jnp.asarray([[1, 2, 3], [4, 5, 6]])
    variables = model.init(jax.random.PRNGKey(0), mel, toks)

    rng = np.random.default_rng(11)
    sd = _torch_state_for(cfg, rng)
    # make LayerNorm scales realistic (~1) so the comparison exercises the
    # same numeric regime as a real checkpoint
    for k in list(sd):
        if k.endswith(("ln.weight", "ln_post.weight", "attn_ln.weight", "mlp_ln.weight")):
            sd[k] = sd[k] + 1.0
    ckpt = str(tmp_path / "w.pt")
    torch.save({"model_state_dict": sd}, ckpt)

    new_params, report = load_torch_checkpoint_into(variables["params"], ckpt)
    assert report["shape_mismatch"] == []

    ref = _torch_whisper_encoder_forward(sd, mel_np, cfg)
    got, _ = model.apply({"params": new_params}, mel, method=model.encode)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-3)


def test_embedding_shape_mismatch_is_loud(tmp_path):
    """A vocab-size disagreement must not silently skip the token embedding
    (ADVICE r1: non-strict partial_load left a random embedding in a
    'converted' model)."""
    cfg = WhisperConfig.tiny_test(dtype="float32")
    model = Whisper(cfg)
    mel = jnp.zeros((1, cfg.n_mels, 64), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), mel, jnp.asarray([[1]]))

    sd = _torch_state_for(cfg, np.random.default_rng(0))
    # wrong vocab size, as with a real 51865-row Whisper checkpoint
    sd["decoder.token_embedding.weight"] = torch.zeros((cfg.n_vocab + 7, cfg.n_text_state))
    ckpt = str(tmp_path / "bad.pt")
    torch.save({"model_state_dict": sd}, ckpt)

    with pytest.raises(ValueError, match="token_embedding"):
        load_torch_checkpoint_into(variables["params"], ckpt)
    # explicit opt-in still works and reports the skip
    _, report = load_torch_checkpoint_into(
        variables["params"], ckpt, allow_embedding_mismatch=True
    )
    assert any("token_embedding" in k for k in report["shape_mismatch"])


# ---------------------------------------------------------------------------
# fairseq AV-HuBERT conversion
# ---------------------------------------------------------------------------


def _fairseq_avhubert_state(cfg, rng):
    """Synthesize a fairseq AVHubertSeq2Seq state_dict with tiny shapes."""
    t = lambda shape: torch.tensor(  # noqa: E731
        rng.normal(size=shape).astype(np.float32)
    )
    tv = lambda shape: torch.tensor(  # noqa: E731
        (np.abs(rng.normal(size=shape)) + 0.5).astype(np.float32)
    )  # running_var must be positive
    H, F = cfg.hidden_size, cfg.intermediate_size
    sd = {}
    P = "encoder.w2v_model."  # seq2seq fine-tune nesting
    sd[P + "feature_extractor_audio.proj.weight"] = t((H, cfg.audio_feat_dim))
    sd[P + "feature_extractor_audio.proj.bias"] = t((H,))
    bc = cfg.visual_backbone_channels
    sd[P + "feature_extractor_video.proj.weight"] = t((H, bc))
    sd[P + "feature_extractor_video.proj.bias"] = t((H,))
    # ResNet frontend
    R = P + "feature_extractor_video.resnet."
    fc = cfg.visual_frontend_channels
    sd[R + "frontend3D.0.weight"] = t((fc, 1, 5, 7, 7))
    for leaf, shape in (("weight", (fc,)), ("bias", (fc,)),
                        ("running_mean", (fc,)), ("running_var", (fc,))):
        sd[R + f"frontend3D.1.{leaf}"] = tv(shape) if leaf == "running_var" else t(shape)
    sd[R + "frontend3D.1.num_batches_tracked"] = torch.tensor(0)
    sd[R + "frontend3D.2.weight"] = t((fc,))
    planes = [max(bc // 8, 8), max(bc // 4, 8), max(bc // 2, 8), bc]
    inp = fc
    for stage, pl_ in enumerate(planes, start=1):
        for b in range(2):
            pre = R + f"trunk.layer{stage}.{b}."
            cin = inp if b == 0 else pl_
            sd[pre + "conv1.weight"] = t((pl_, cin, 3, 3))
            sd[pre + "conv2.weight"] = t((pl_, pl_, 3, 3))
            for bn in ("bn1", "bn2"):
                for leaf in ("weight", "bias", "running_mean", "running_var"):
                    sd[pre + f"{bn}.{leaf}"] = tv((pl_,)) if leaf == "running_var" else t((pl_,))
                sd[pre + f"{bn}.num_batches_tracked"] = torch.tensor(0)
            sd[pre + "relu1.weight"] = t((pl_,))
            sd[pre + "relu2.weight"] = t((pl_,))
            if b == 0 and cin != pl_:
                sd[pre + "downsample.0.weight"] = t((pl_, cin, 1, 1))
                for leaf in ("weight", "bias", "running_mean", "running_var"):
                    sd[pre + f"downsample.1.{leaf}"] = tv((pl_,)) if leaf == "running_var" else t((pl_,))
                sd[pre + "downsample.1.num_batches_tracked"] = torch.tensor(0)
        inp = pl_
    # wrapper
    fused = 2 * H  # concat fusion
    sd[P + "post_extract_proj.weight"] = t((H, fused))
    sd[P + "post_extract_proj.bias"] = t((H,))
    sd[P + "mask_emb"] = t((H,))
    sd[P + "layer_norm.weight"] = t((fused,))
    sd[P + "layer_norm.bias"] = t((fused,))
    # transformer encoder w/ weight-normed pos conv
    sd[P + "encoder.pos_conv.0.weight_g"] = t((1, 1, cfg.conv_pos))
    sd[P + "encoder.pos_conv.0.weight_v"] = t(
        (H, H // cfg.conv_pos_groups, cfg.conv_pos))
    sd[P + "encoder.pos_conv.0.bias"] = t((H,))
    for i in range(cfg.num_hidden_layers):
        pre = P + f"encoder.layers.{i}."
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[pre + f"self_attn.{proj}.weight"] = t((H, H))
            sd[pre + f"self_attn.{proj}.bias"] = t((H,))
        sd[pre + "self_attn_layer_norm.weight"] = t((H,))
        sd[pre + "self_attn_layer_norm.bias"] = t((H,))
        sd[pre + "fc1.weight"] = t((F, H))
        sd[pre + "fc1.bias"] = t((F,))
        sd[pre + "fc2.weight"] = t((H, F))
        sd[pre + "fc2.bias"] = t((H,))
        sd[pre + "final_layer_norm.weight"] = t((H,))
        sd[pre + "final_layer_norm.bias"] = t((H,))
    sd[P + "encoder.layer_norm.weight"] = t((H,))
    sd[P + "encoder.layer_norm.bias"] = t((H,))
    # pretrain-only keys that must be skipped
    sd[P + "label_embs_concat"] = t((4, cfg.final_dim))
    sd[P + "final_proj.weight"] = t((cfg.final_dim, H))
    sd[P + "final_proj.bias"] = t((cfg.final_dim,))
    # decoder
    D, DF = cfg.decoder_hidden_size, cfg.decoder_ffn_dim
    sd["decoder.embed_tokens.weight"] = t((cfg.vocab_size, D))
    sd["decoder.embed_positions._float_tensor"] = t((1,))
    for i in range(cfg.decoder_layers):
        pre = f"decoder.layers.{i}."
        for attn in ("self_attn", "encoder_attn"):
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                sd[pre + f"{attn}.{proj}.weight"] = t((D, D))
                sd[pre + f"{attn}.{proj}.bias"] = t((D,))
            sd[pre + f"{attn}_layer_norm.weight"] = t((D,))
            sd[pre + f"{attn}_layer_norm.bias"] = t((D,))
        sd[pre + "fc1.weight"] = t((DF, D))
        sd[pre + "fc1.bias"] = t((DF,))
        sd[pre + "fc2.weight"] = t((D, DF))
        sd[pre + "fc2.bias"] = t((D,))
        sd[pre + "final_layer_norm.weight"] = t((D,))
        sd[pre + "final_layer_norm.bias"] = t((D,))
    sd["decoder.layer_norm.weight"] = t((D,))
    sd["decoder.layer_norm.bias"] = t((D,))
    return sd


def test_avhubert_fairseq_conversion(tmp_path):
    from avsl_tpu.core.config import AVHuBERTConfig
    from avsl_tpu.models.avhubert import AVHuBERTForSpeech2Text
    from avsl_tpu.models.convert import (
        convert_avhubert_state_dict,
        load_torch_checkpoint_into,
    )

    cfg = AVHuBERTConfig.tiny_test(dtype="float32")
    model = AVHuBERTForSpeech2Text(cfg)
    audio = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 12, cfg.audio_feat_dim)),
        jnp.float32,
    )
    video = jnp.zeros((1, 12, 88, 88, 1), jnp.float32)
    toks = jnp.asarray([[0, 5, 6]])
    variables = model.init(jax.random.PRNGKey(0), audio, video, toks)

    rng = np.random.default_rng(0)
    sd = _fairseq_avhubert_state(cfg, rng)
    ckpt = str(tmp_path / "avhubert_test.pt")
    torch.save({"model": sd}, ckpt)

    before = model.apply(variables, audio, video, toks)
    new_vars, report = load_torch_checkpoint_into(
        variables, ckpt, converter=convert_avhubert_state_dict
    )
    assert report["unexpected"] == [], report["unexpected"][:8]
    assert report["shape_mismatch"] == [], report["shape_mismatch"][:8]
    assert report["missing"] == [], report["missing"][:8]

    # weight-norm round trip: flax effective kernel == torch effective kernel
    g = np.asarray(sd["encoder.w2v_model.encoder.pos_conv.0.weight_g"])
    v = np.asarray(sd["encoder.w2v_model.encoder.pos_conv.0.weight_v"])
    w_torch = v * (g / np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True)))
    pc = new_vars["params"]["avhubert"]["encoder"]["transformer"]["pos_conv"]
    kernel = np.asarray(pc["conv"]["kernel"])
    # flax WeightNorm names its param with a literal "/" path string
    scale = np.asarray(pc["WeightNorm_0"]["conv/kernel/scale"])
    w_flax = scale * kernel / np.sqrt((kernel ** 2).sum(axis=(0, 1)))
    np.testing.assert_allclose(w_flax, w_torch.transpose(2, 1, 0), rtol=1e-5)

    after = model.apply(new_vars, audio, video, toks)
    assert np.abs(np.asarray(after["logits"]) - np.asarray(before["logits"])).max() > 1e-3
    assert np.isfinite(np.asarray(after["logits"])).all()


def test_encoder_only_checkpoint_skips_decoder_without_raising(tmp_path):
    """The pretrain->fine-tune handoff: an encoder-only AV-HuBERT
    checkpoint legitimately leaves the seq2seq decoder (embed_tokens,
    output_proj) to random init — the critical-embedding guard must not
    fire on a subtree the checkpoint never claimed to cover, but must
    still fire when the decoder IS present and its embedding drifted."""
    from avsl_tpu.core.config import AVHuBERTConfig
    from avsl_tpu.models.avhubert import AVHuBERTForSpeech2Text
    from avsl_tpu.models.convert import (
        convert_avhubert_state_dict,
        load_torch_checkpoint_into,
    )

    cfg = AVHuBERTConfig.tiny_test(dtype="float32")
    model = AVHuBERTForSpeech2Text(cfg)
    audio = jnp.zeros((1, 12, cfg.audio_feat_dim), jnp.float32)
    video = jnp.zeros((1, 12, 88, 88, 1), jnp.float32)
    toks = jnp.asarray([[0, 5, 6]])
    variables = model.init(jax.random.PRNGKey(0), audio, video, toks)

    rng = np.random.default_rng(3)
    full = _fairseq_avhubert_state(cfg, rng)
    enc_only = {k: v for k, v in full.items() if not k.startswith("decoder.")}
    ckpt = str(tmp_path / "enc_only.pt")
    torch.save({"model": enc_only}, ckpt)

    new_vars, report = load_torch_checkpoint_into(
        variables, ckpt, converter=convert_avhubert_state_dict
    )
    assert any("embed_tokens" in k for k in report["missing"])
    assert report["loaded"]  # encoder weights did land

    # same decoder-present checkpoint with the embedding key dropped ->
    # rename-drift within a covered subtree -> loud failure
    drifted = dict(full)
    del drifted["decoder.embed_tokens.weight"]
    ckpt2 = str(tmp_path / "drifted.pt")
    torch.save({"model": drifted}, ckpt2)
    with pytest.raises(ValueError, match="embed_tokens"):
        load_torch_checkpoint_into(
            variables, ckpt2, converter=convert_avhubert_state_dict
        )
