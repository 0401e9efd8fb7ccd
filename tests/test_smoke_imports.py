"""Import smoke + environment preflight (reference test-strategy parity:
avsl/test/verify_imports.py and test_system_requirements, SURVEY.md §4)."""

import importlib
import os
import pkgutil

import avsl_tpu


def test_every_module_imports():
    """The reference's checked-in package does not import cleanly
    (SURVEY.md §0); this framework must."""
    failures = []
    for mod in pkgutil.walk_packages(avsl_tpu.__path__, prefix="avsl_tpu."):
        try:
            importlib.import_module(mod.name)
        except Exception as e:  # noqa: BLE001
            failures.append((mod.name, repr(e)))
    assert not failures, failures


def test_public_symbols_resolve():
    # every symbol the training entry points need
    from avsl_tpu.core import (  # noqa: F401
        AVHuBERTConfig, FlamingoTrainConfig, WhisperConfig, make_mesh,
    )
    from avsl_tpu.data import AMI_SPEAKERS, LengthBucketBatcher  # noqa: F401
    from avsl_tpu.data.runtime import AmiVideoDataset, WhisperVideoCollator  # noqa: F401
    from avsl_tpu.data.tokenizer import get_tokenizer  # noqa: F401
    from avsl_tpu.decode import beam_search, greedy_decode, wer_cer  # noqa: F401
    from avsl_tpu.infer import StreamingTranscriber  # noqa: F401
    from avsl_tpu.kernels import (  # noqa: F401
        avhubert_audio_features, log_mel_spectrogram, resample_poly, spec_augment,
    )
    from avsl_tpu.models import AVHuBERTForSpeech2Text, Whisper  # noqa: F401
    from avsl_tpu.models.factory import build_whisper_flamingo  # noqa: F401
    from avsl_tpu.train import TrainState, make_train_step  # noqa: F401
    from avsl_tpu.train.runner import TrainerRunner  # noqa: F401


def test_system_requirements():
    """Environment preflight (reference test_whisper_flamingo.py:656-713):
    devices available, dirs writable, native toolchain present."""
    import jax

    assert len(jax.devices()) >= 1
    from avsl_tpu.utils import check_writable, disk_usage_report

    assert check_writable(".")
    rep = disk_usage_report(".")
    assert rep["free_gb"] > 0.5, "disk nearly full"

    # native media runtime buildable or built
    so = os.path.join("cpp", "avsl_media", "libavsl_media.so")
    makefile = os.path.join("cpp", "avsl_media", "Makefile")
    assert os.path.exists(so) or os.path.exists(makefile)


def test_flagship_large_config_constructs():
    """AVSL_BENCH_MODEL=large builds the reference training envelope
    (whisper large-v2 + AV-HuBERT-large dims,
    config/ami_whisper_flamingo_large.yaml) — construct-only."""
    import __graft_entry__ as ge

    model, cfg = ge._flagship(size="large")
    assert cfg.name == "large-v2"
    assert cfg.n_audio_state == 1280 and cfg.n_audio_layer == 32
    assert cfg.video_state == 1024
