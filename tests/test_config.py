import os

import pytest

from avsl_tpu.core.config import (
    AVHuBERTConfig,
    FlamingoTrainConfig,
    WhisperConfig,
    dict_to_namespace,
    get_default_config,
    load_yaml_config,
    merge_configs,
    namespace_to_dict,
    parse_args_with_config,
    save_yaml_config,
)


def test_merge_configs_recursive():
    base = {"a": 1, "b": {"x": 1, "y": 2}, "c": [1, 2]}
    override = {"b": {"y": 3, "z": 4}, "c": [9]}
    merged = merge_configs(base, override)
    assert merged == {"a": 1, "b": {"x": 1, "y": 3, "z": 4}, "c": [9]}
    assert base["b"]["y"] == 2  # inputs not mutated


def test_namespace_roundtrip():
    d = {"a": 1, "b": {"x": [1, {"q": 2}]}}
    ns = dict_to_namespace(d)
    assert ns.b.x[1].q == 2
    assert namespace_to_dict(ns) == {"a": 1, "b": {"x": [1, {"q": 2}]}}


def test_yaml_roundtrip(tmp_path):
    cfg = {"model_name": "small", "lr": 1e-4, "nested": {"k": True}}
    path = save_yaml_config(cfg, str(tmp_path / "cfg.yaml"))
    assert load_yaml_config(path) == cfg


def test_default_registry_and_cli_override(tmp_path):
    defaults = get_default_config("whisper_flamingo")
    assert defaults["model_name"] == "large-v2"
    assert defaults["gradient_accumulation_steps"] == 16

    yaml_path = str(tmp_path / "run.yaml")
    save_yaml_config({"model_name": "small", "batch_size": 4}, yaml_path)
    cfg = parse_args_with_config(
        "whisper_flamingo",
        argv=["--config", yaml_path, "--batch_size", "8"],
    )
    # defaults < yaml < cli
    assert cfg.model_name == "small"
    assert cfg.batch_size == 8
    assert cfg.num_train_steps == 8000


def test_avhubert_config_defaults():
    cfg = AVHuBERTConfig()
    assert cfg.hidden_size == 1024
    assert cfg.num_hidden_layers == 24
    assert cfg.decoder_layers == 9
    assert cfg.audio_feat_dim == 104
    assert cfg.vocab_size == 10000
    assert cfg.label_smoothing == 0.1
    # concat fusion doubles the fused dim
    assert cfg.encoder_hidden_size == 2048
    cfg2 = AVHuBERTConfig(modality_fuse="add")
    assert cfg2.encoder_hidden_size == 1024


def test_avhubert_from_fairseq_yaml(tmp_path):
    yaml_text = """
model:
  modality_fuse: sum
  encoder_embed_dim: 256
  encoder_layers: 4
  encoder_attention_heads: 4
  encoder_ffn_embed_dim: 1024
  decoder_layers: 3
  conv_dim: [128, 128]
  conv_stride: [5, 2]
  conv_kernel: [10, 3]
tokenizer:
  vocab_size: 500
  pad_token_id: 1
criterion:
  label_smoothing: 0.2
"""
    p = tmp_path / "card.yaml"
    p.write_text(yaml_text)
    cfg = AVHuBERTConfig.from_yaml(str(p))
    assert cfg.hidden_size == 256
    assert cfg.num_hidden_layers == 4
    assert cfg.decoder_layers == 3
    assert cfg.conv_dim == (128, 128)
    assert cfg.vocab_size == 500
    assert cfg.label_smoothing == 0.2
    assert cfg.modality_fuse == "sum"


def test_whisper_presets():
    for name, (mels, state, layers) in {
        "tiny": (80, 384, 4),
        "small": (80, 768, 12),
        "large-v2": (80, 1280, 32),
        "large-v3": (128, 1280, 32),
    }.items():
        cfg = WhisperConfig.from_name(name)
        assert cfg.n_mels == mels
        assert cfg.n_audio_state == state
        assert cfg.n_text_layer == layers
    with pytest.raises(KeyError):
        WhisperConfig.from_name("nope")


def test_flamingo_train_config_reads_reference_style_yaml(tmp_path):
    yaml_text = """
train_name: whisper_flamingo_ft_ami
audio_max_length: 160000
model_name: large-v2
learning_rate: 1.0e-5
gradient_accumulation_steps: 16
add_gated_x_attn: 1
av_fusion: separate
spec_augment: "ls-basic"
unknown_extra_key: 42
"""
    p = tmp_path / "train.yaml"
    p.write_text(yaml_text)
    cfg = FlamingoTrainConfig.from_yaml(str(p))
    assert cfg.audio_max_length == 160000
    assert cfg.add_gated_x_attn == 1
    assert cfg.spec_augment == "ls-basic"
    assert cfg.gradient_accumulation_steps == 16


def test_mesh_and_sharding(eight_devices):
    import jax
    import numpy as np

    from avsl_tpu.core.mesh import (
        DATA_AXIS,
        MODEL_AXIS,
        data_sharding,
        local_batch_size,
        make_mesh,
        shard_batch,
    )

    mesh = make_mesh(8, model_parallel=2)
    assert mesh.shape[DATA_AXIS] == 4
    assert mesh.shape[MODEL_AXIS] == 2
    assert local_batch_size(8, mesh) == 2

    batch = {"x": np.ones((8, 3), np.float32), "y": np.arange(8)}
    on_dev = shard_batch(mesh, batch)
    assert on_dev["x"].sharding.is_equivalent_to(data_sharding(mesh, 2), 2)

    # psum over the data axis works on the virtual mesh
    from functools import partial

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=jax.sharding.PartitionSpec(DATA_AXIS, None),
        out_specs=jax.sharding.PartitionSpec(None, None),
    )
    def total(x):
        return jax.lax.psum(jax.numpy.sum(x, axis=0, keepdims=True), DATA_AXIS)

    out = total(np.ones((8, 3), np.float32))
    np.testing.assert_allclose(np.asarray(out), np.full((1, 3), 8.0))
