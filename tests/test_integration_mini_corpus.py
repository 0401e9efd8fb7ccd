"""The whole pipeline on a synthetic mini-AMI corpus.

Builds raw inputs (NITE XML + source wav + source closeup video with a
moving synthetic face), then drives every layer in sequence:

  annotations -> transcripts txt -> segment collection -> audio/video
  segmentation -> lip-ROI extraction -> HF dataset packaging ->
  fine-tuning (2 steps) -> streaming transcription.

This is the `test_mini_dataset`-style end-to-end check of the reference's
test strategy (SURVEY.md §4), covering the seams no unit test reaches.
"""

import os

import numpy as np
import pytest
import scipy.io.wavfile as wavfile

NITE = 'xmlns:nite="http://nite.sourceforge.net/"'


@pytest.fixture(scope="module")
def mini_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("mini_ami")
    tdir = root / "transcripts"
    (tdir / "words").mkdir(parents=True)
    (tdir / "segments").mkdir()
    media = root / "media"
    media.mkdir()

    # --- annotations: 2 segments for meeting X, speaker A ---
    words = [
        ("w0", "0.50", "0.90", "hello"),
        ("w1", "0.95", "1.40", "there"),
        ("w2", "2.10", "2.60", "general"),
        ("w3", "2.70", "3.20", "kenobi"),
    ]
    words_xml = [f'<?xml version="1.0"?>\n<nite:root {NITE}>']
    for wid, s, e, text in words:
        words_xml.append(
            f'<w nite:id="X.A.words{wid[1]}" starttime="{s}" endtime="{e}">{text}</w>'
        )
    words_xml.append("</nite:root>")
    (tdir / "words" / "X.A.words.xml").write_text("\n".join(words_xml))

    segs_xml = f"""<?xml version="1.0"?>
<nite:root {NITE}>
<segment transcriber_start="0.50" transcriber_end="1.40">
<nite:child href="X.A.words.xml#id(X.A.words0)..id(X.A.words1)"/>
</segment>
<segment transcriber_start="2.10" transcriber_end="3.20">
<nite:child href="X.A.words.xml#id(X.A.words2)..id(X.A.words3)"/>
</segment>
</nite:root>
"""
    (tdir / "segments" / "X.A.segments.xml").write_text(segs_xml)

    # --- media: 4 s headset wav + 4 s closeup video with a moving face ---
    sr = 16000
    t = np.arange(4 * sr) / sr
    audio = (0.3 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    wavfile.write(str(media / "X.Headset-0.wav"), sr, (audio * 32767).astype(np.int16))

    import cv2

    h, w, fps = 144, 176, 25
    rng = np.random.default_rng(0)
    base = rng.integers(30, 90, (h, w)).astype(np.float32)
    vw = cv2.VideoWriter(
        str(media / "X.Closeup1.avi"), cv2.VideoWriter_fourcc(*"MJPG"), fps,
        (w, h), isColor=False,
    )
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(4 * fps):
        jit = 4 * np.sin(i / 4.0)
        face = 120 * np.exp(-(((xx - 88 - jit) / 28) ** 2 + ((yy - 60) / 36) ** 2))
        mouth = 40 * np.exp(
            -(((xx - 88 - jit) / 7) ** 2 + ((yy - 78) / 4) ** 2)
        ) * (1 + np.sin(i * 1.3))
        vw.write(np.clip(base + face - mouth, 0, 255).astype(np.uint8))
    vw.release()
    return root


def test_full_pipeline(mini_corpus, tmp_path):
    from avsl_tpu.data.ami_xml import process_transcripts
    from avsl_tpu.data.dataset_process import segment_sources

    out = tmp_path / "out"
    # 1. annotations -> transcripts
    written = process_transcripts(str(mini_corpus / "transcripts"), str(out / "txt"))
    assert len(written) == 1
    lines = open(written[0]).read().strip().splitlines()
    assert lines[0] == "[0.50-1.40] hello there"

    # 2-5. segmentation + lips + records + HF dataset
    result = segment_sources(
        str(out / "txt"),
        audio_sources={("X", "A"): str(mini_corpus / "media" / "X.Headset-0.wav")},
        video_sources={("X", "A"): str(mini_corpus / "media" / "X.Closeup1.avi")},
        output_dir=str(out / "ds"),
        extract_lips=True,
    )
    stats = result["stats"]
    assert stats["segments"] == 2
    assert stats["audio_ok"] == 2
    assert stats["video_ok"] == 2
    assert stats["lip_ok"] == 2, stats
    assert stats["alignment_issues"] == 0
    ds = result["dataset"]
    assert len(ds) == 2

    # lip clips are valid 96x96 video
    from avsl_tpu.data.video_io import read_video_frames

    lip_dir = str(out / "ds" / "lip_videos")
    lip_files = sorted(os.listdir(lip_dir))
    assert len(lip_files) == 2
    frames = read_video_frames(os.path.join(lip_dir, lip_files[0]))
    assert frames.shape[1:] == (96, 96)

    # 6. fine-tune 2 steps on the packaged dataset (audio+video, tiny model)
    import yaml

    from avsl_tpu.cli import finetune

    hf_dir = str(out / "ds" / "hf_dataset")
    cfg = {
        "model_name": "test",
        "train_data_path": hf_dir,
        "val_data_path": hf_dir,
        "test_data_path": "",
        "audio_max_length": 16000,
        "batch_size": 2,
        "eval_batch_size": 2,
        "num_train_steps": 2,
        "warmup_steps": 1,
        "gradient_accumulation_steps": 1,
        "validate_every_n_batches": 100,
        "add_gated_x_attn": 1,
        "use_av_hubert_encoder": True,
        "spec_augment": None,
        "precision": 32,
        "train_id": "mini_corpus",
        "log_output_dir": str(tmp_path / "logs"),
        "check_output_dir": str(tmp_path / "ckpt"),
        "num_sanity_val_steps": 0,
        "max_duration_filter_seconds": 10.0,
        # exercises the host->device prefetch wiring (data/prefetch.py)
        "prefetch_batches": 1,
    }
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        fit = finetune.main([cfg_path])
    finally:
        os.chdir(cwd)
    assert fit["final_step"] == 2
    assert np.isfinite(fit["history"][-1][1]) if fit["history"] else True

    # 7. streaming transcription over the segment directory
    from avsl_tpu.cli import transcribe

    items = transcribe.collect_items(str(out / "ds" / "audio_segments"))
    assert len(items) == 2
    res = transcribe.main(
        ["--input", str(out / "ds" / "audio_segments"), "--smoke",
         "--batch_size", "2", "--max_new_tokens", "4"]
    )
    assert len(res) == 2
