"""CLI end-to-end smokes (tiny model, synthetic data; each ~1 min on CPU)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_finetune_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from avsl_tpu.cli import finetune

    result = finetune.main(["--smoke"])
    assert result["final_step"] == 6
    assert np.isfinite(result["history"][-1][1])
    # checkpoints + logs landed
    assert os.path.isdir("checkpoints/whisper_flamingo_ft")
    assert os.path.isdir("output/train_whisper_flamingo_ft")


def test_whisper_ft_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from avsl_tpu.cli import whisper_ft

    result = whisper_ft.main(["--smoke", "--num_beams", "2"])
    assert result["train"]["final_step"] == 4
    assert 0 <= result["eval"]["wer"] <= 2.0
    assert os.path.exists("output/whisper_ft/results.json")


def test_evaluate_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from avsl_tpu.cli import evaluate

    result = evaluate.main(["--smoke", "--beam", "2", "--max_new_tokens", "6"])
    assert "test/wer_av" in result and "test/wer_beam" in result


def test_preprocess_cli_subprocess(tmp_path):
    # drive the real python -m surface for the annotation commands
    tdir = tmp_path / "transcripts"
    (tdir / "words").mkdir(parents=True)
    (tdir / "segments").mkdir()
    (tdir / "words" / "X.A.words.xml").write_text(
        '<?xml version="1.0"?>\n'
        '<nite:root xmlns:nite="http://nite.sourceforge.net/">\n'
        '<w nite:id="X.A.words0" starttime="0.5" endtime="0.9">hey</w>\n'
        "</nite:root>\n"
    )
    (tdir / "segments" / "X.A.segments.xml").write_text(
        '<?xml version="1.0"?>\n'
        '<nite:root xmlns:nite="http://nite.sourceforge.net/">\n'
        '<segment transcriber_start="0.5" transcriber_end="0.9">\n'
        '<nite:child href="X.A.words.xml#id(X.A.words0)"/>\n'
        "</segment></nite:root>\n"
    )
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, "-m", "avsl_tpu.cli.preprocess", "transcripts",
         "--input", str(tdir), "--output", str(tmp_path / "txt")],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-500:]
    content = (tmp_path / "txt" / "X-A.txt").read_text()
    assert content.strip() == "[0.5-0.9] hey"


def test_transcribe_smoke(tmp_path, monkeypatch):
    import cv2
    import scipy.io.wavfile as wavfile

    from avsl_tpu.cli import transcribe

    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    for i in range(5):
        sr = 16000
        x = (0.2 * np.sin(2 * np.pi * (200 + 80 * i) * np.arange(sr) / sr)).astype(np.float32)
        wavfile.write(str(seg_dir / f"seg{i}.wav"), sr, (x * 32767).astype(np.int16))
    for i in range(2):
        frames = np.random.default_rng(i).integers(0, 255, (20, 96, 96)).astype(np.uint8)
        w = cv2.VideoWriter(
            str(seg_dir / f"seg{i}-lip.mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"), 25, (96, 96), isColor=False,
        )
        for f in frames:
            w.write(f)
        w.release()

    monkeypatch.chdir(tmp_path)
    out = transcribe.main(
        ["--input", str(seg_dir), "--smoke", "--batch_size", "4",
         "--max_new_tokens", "6", "--output", str(tmp_path / "out.json")]
    )
    assert len(out) == 5
    assert sum(r["has_video"] for r in out) == 2
    assert os.path.exists(str(tmp_path / "out.json"))


def test_finetune_bucketed_multisteps(tmp_path, monkeypatch):
    """Non-smoke finetune path: HF dataset from disk, token-budget
    bucketing, cross-batch grad accumulation via optax.MultiSteps."""
    import scipy.io.wavfile as wavfile
    import yaml

    from avsl_tpu.cli import finetune
    from avsl_tpu.data.hf_dataset import av_to_hf_dataset

    rng = np.random.default_rng(0)
    recs = []
    for i in range(12):
        sr = 16000
        dur = 0.4 + 0.05 * i
        x = (0.2 * rng.standard_normal(int(sr * dur))).astype(np.float32)
        p = str(tmp_path / f"u{i}.wav")
        wavfile.write(p, sr, (x * 32767).astype(np.int16))
        recs.append(
            {"id": f"u{i}", "transcript": f"utterance number {i}",
             "duration": dur, "audio": p}
        )
    av_to_hf_dataset(recs[:8], str(tmp_path / "train"), check_videos=False)
    av_to_hf_dataset(recs[8:], str(tmp_path / "val"), check_videos=False)

    cfg = {
        "model_name": "test",
        "train_data_path": str(tmp_path / "train"),
        "val_data_path": str(tmp_path / "val"),
        "test_data_path": "",
        "audio_max_length": 16000,
        "batch_size": 2,
        "eval_batch_size": 2,
        "num_train_steps": 2,
        "warmup_steps": 1,
        "gradient_accumulation_steps": 2,
        "validate_every_n_batches": 100,
        "add_gated_x_attn": 0,
        "use_av_hubert_encoder": False,
        "spec_augment": "ls-basic",
        "precision": 32,
        "train_id": "bucketed_test",
        "log_output_dir": str(tmp_path / "logs"),
        "check_output_dir": str(tmp_path / "ckpt"),
        "num_sanity_val_steps": 0,
        "max_duration_filter_seconds": 10.0,
    }
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    monkeypatch.chdir(tmp_path)
    result = finetune.main([cfg_path])
    # 2 optimizer steps x accum 2 = 4 micro steps
    assert result["final_step"] == 4
    assert np.isfinite(result["history"][-1][1]) if result["history"] else True


def test_preprocess_new_modes_cli(tmp_path, capsys):
    """CLI surface of the round-2 recovery/marker modes (reference
    --mode segment_exist / process_lip / dsfl drivers)."""
    import json as _json

    import numpy as np
    import pandas as pd
    import scipy.io.wavfile as wavfile

    from avsl_tpu.cli.preprocess import main as pp_main
    from avsl_tpu.data.video_io import write_video_frames

    # --- segment_exist on a tmp already-sliced corpus -------------------
    src = tmp_path / "src"
    (src / "audio_segments").mkdir(parents=True)
    (src / "video_segments").mkdir()
    tdir = tmp_path / "transcripts"
    tdir.mkdir()
    (tdir / "EN9999a-A.txt").write_text("[0.50-1.50] hello there\n")
    (src / "audio_segments" / "EN9999a-A-0.50-1.50.wav").write_bytes(b"x")
    (src / "audio_segments" / "stray-notes.wav").write_bytes(b"x")  # skipped
    pp_main([
        "segment_exist", "--source_dir", str(src), "--transcripts", str(tdir),
        "--output", str(tmp_path / "ds"), "--no_dataset",
    ])
    stats = _json.loads(capsys.readouterr().out)
    assert stats["records"] == 1 and stats["skipped_bad_ids"] == 1
    assert (tmp_path / "ds" / "dataset_records.json").exists()

    # --- reprocess_lips over a CSV --------------------------------------
    vid = str(tmp_path / "seg1.mp4")
    write_video_frames(
        vid, np.random.default_rng(0).integers(0, 255, (6, 120, 160)).astype(np.uint8),
        fps=25,
    )
    csv_path = str(tmp_path / "info.csv")
    pd.DataFrame({"id": ["seg1"], "video": [vid]}).to_csv(csv_path, index=False)
    pp_main(["reprocess_lips", "--csv", csv_path, "--output", str(tmp_path / "lips")])
    rep = _json.loads(capsys.readouterr().out)
    assert rep["n_ok"] + rep["n_failed"] == 1
    assert "has_lip_video" in pd.read_csv(csv_path).columns

    # --- marker_dataset with media slicing + stats JSON ------------------
    media = tmp_path / "media"
    media.mkdir()
    sr = 16000
    wavfile.write(
        str(media / "EN9999a.Headset-0.wav"), sr,
        (np.sin(np.arange(3 * sr) * 0.05) * 20000).astype(np.int16),
    )
    mcsv = str(tmp_path / "markers.csv")
    pd.DataFrame({
        "meeting_id": ["EN9999a", "EN9999a"],
        "speaker_id": ["A", "A"],
        "word": ["<laugh>", "um"],
        "start_time": [0.5, 1.0],
        "end_time": [1.0, 1.4],
        "disfluency_type": ["laughter", "hesitation"],
    }).to_csv(mcsv, index=False)
    pp_main([
        "marker_dataset", "--csv", mcsv, "--media_dir", str(media),
        "--output", str(tmp_path / "marker_out"), "--check_speakers", "--no_balance",
    ])
    mstats = _json.loads(capsys.readouterr().out)
    assert mstats["audio_ok"] == 2
    assert mstats["per_event_type"] == {"hesitation": 1, "laughter": 1}
    assert (tmp_path / "marker_out" / "marker_dataset_stats.json").exists()


def test_pretrain_smoke(tmp_path, monkeypatch):
    """Full pretraining recipe end-to-end: synthetic corpus -> k-means
    codebook (saved/reloadable npz) -> masked-cluster training -> eval
    accuracies + checkpoint."""
    monkeypatch.chdir(tmp_path)
    from avsl_tpu.cli import pretrain

    km = str(tmp_path / "km.npz")
    result = pretrain.main(
        ["--smoke", "--km_model", km, "--checkpoint_dir", "ckpt"]
    )
    assert result["steps"] == 6
    assert result["last_loss"] < result["first_loss"]
    assert np.isfinite(result["eval_acc_masked"])
    assert os.path.exists(km)
    assert os.path.isdir("ckpt")
    # reusing the saved codebook reproduces the same targets/losses
    again = pretrain.main(["--smoke", "--km_model", km])
    assert abs(again["first_loss"] - result["first_loss"]) < 1e-3


def test_pretrain_iteration2(tmp_path, monkeypatch):
    """HuBERT iteration-2: a second pretraining round on k-means targets
    re-clustered from the iteration-1 model's layer features."""
    monkeypatch.chdir(tmp_path)
    from avsl_tpu.cli import pretrain

    result = pretrain.main(["--smoke", "--iterations", "2", "--steps", "4"])
    assert len(result["iterations"]) == 2
    assert result["relabel_layer"] == 1
    for it in result["iterations"]:
        assert np.isfinite(it["last_loss"])
        assert it["last_loss"] < it["first_loss"]


def test_align_cli_smoke_and_csv(tmp_path):
    """Forced-alignment CLI: --smoke end-to-end, then CSV mode over a
    real wav with the tiny card (reference has no aligner)."""
    import csv
    import json

    import numpy as np

    from avsl_tpu.cli.align import main
    from avsl_tpu.data.audio_segments import write_wav

    out = main(["--smoke"])
    assert out[0]["id"] == "smoke"
    words = out[0]["words"]
    assert [w["word"] for w in words] == ["hello", "world"]
    assert all(w["end_s"] > w["start_s"] >= 0 for w in words)
    assert words[0]["end_s"] <= words[1]["start_s"] + 1e-6

    sr = 16000
    wav = str(tmp_path / "a.wav")
    write_wav(wav, (0.2 * np.sin(
        2 * np.pi * 250 * np.arange(sr) / sr)).astype(np.float32))
    csv_path = str(tmp_path / "segs.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["id", "audio", "text"])
        w.writeheader()
        w.writerow({"id": "s1", "audio": wav, "text": " one two"})
        w.writerow({"id": "s2", "audio": wav, "text": " three"})
    out_path = str(tmp_path / "aligned.json")
    results = main(["--csv", csv_path, "--tiny", "--output", out_path])
    assert [r["id"] for r in results] == ["s1", "s2"]
    assert [w["word"] for w in results[0]["words"]] == ["one", "two"]
    assert [w["word"] for w in results[1]["words"]] == ["three"]
    with open(out_path) as f:
        assert json.load(f) == results


def test_extract_cli_dumps_features(tmp_path):
    """Feature-extraction CLI (fairseq dump_hubert_feature counterpart):
    per-segment [T, hidden] .npy dumps, layer tap changes the features,
    AV vs audio-only changes them too (fusion actually sees the video)."""
    import csv
    import json

    import numpy as np

    from avsl_tpu.cli.extract import main
    from avsl_tpu.data.audio_segments import write_wav
    from avsl_tpu.data.video_io import write_video_frames

    sr = 16000
    wav = str(tmp_path / "a.wav")
    write_wav(wav, (0.2 * np.sin(
        2 * np.pi * 250 * np.arange(sr) / sr)).astype(np.float32))
    lip = str(tmp_path / "a-lip.mp4")
    write_video_frames(
        lip,
        np.random.default_rng(0).integers(0, 255, (25, 96, 96)).astype(np.uint8),
        fps=25,
    )
    csv_path = str(tmp_path / "segs.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["id", "audio", "video"])
        w.writeheader()
        w.writerow({"id": "av", "audio": wav, "video": lip})
        w.writerow({"id": "a", "audio": wav, "video": ""})
    out = str(tmp_path / "feats")
    results = main(["--csv", csv_path, "--tiny", "--output", out])
    assert [r["id"] for r in results] == ["av", "a"]
    f_av = np.load(results[0]["path"])
    f_a = np.load(results[1]["path"])
    assert f_av.ndim == 2 and f_av.shape == f_a.shape
    assert np.isfinite(f_av).all()
    assert np.abs(f_av - f_a).max() > 0  # the video stream reached fusion

    out2 = str(tmp_path / "feats_l1")
    r2 = main(["--audio", wav, "--tiny", "--output", out2, "--layer", "1"])
    f_l1 = np.load(r2[0]["path"])
    assert f_l1.shape == f_a.shape
    assert np.abs(f_l1 - f_a).max() > 0  # tap != final output
