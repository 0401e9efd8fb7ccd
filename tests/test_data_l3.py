"""L3 packaging tests: segmentation, chunked resume, HF packaging, drivers."""

import csv
import json
import os

import numpy as np
import pandas as pd
import pytest
import scipy.io.wavfile as wavfile

from avsl_tpu.data.audio_segments import (
    add_noise,
    align_audio_video_lengths,
    batch_segment_audio,
    load_wav,
    slice_segment,
    write_wav,
)
from avsl_tpu.data.chunked import (
    ChunkCheckpoint,
    chunk_status,
    find_checkpoint,
    prepare_chunks,
    process_in_chunks,
    save_checkpoint,
    update_csv_with_results,
)
from avsl_tpu.data.dataset_process import (
    balance_classes,
    collect_marker_segments,
    create_dataset_records,
    load_laughter_markers,
    marker_segment_id,
    segment_sources,
)
from avsl_tpu.data.hf_dataset import (
    av_to_hf_dataset,
    av_to_hf_dataset_with_shards,
    filter_corrupted_records,
    load_sharded_records,
    push_dataset_to_hub,
)
from avsl_tpu.data.segments import Segment


@pytest.fixture()
def source_wav(tmp_path):
    sr = 16000
    t = np.arange(sr * 5) / sr
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    path = str(tmp_path / "EN9999a.Headset-0.wav")
    wavfile.write(path, sr, (audio * 32767).astype(np.int16))
    return path


def test_load_slice_write_wav(source_wav, tmp_path):
    audio = load_wav(source_wav)
    assert audio.dtype == np.float32 and len(audio) == 80000
    clip = slice_segment(audio, 1.0, 2.5)
    assert len(clip) == 24000
    out = write_wav(str(tmp_path / "x.wav"), clip)
    np.testing.assert_allclose(load_wav(out), clip, atol=1e-3)


def test_batch_segment_audio(source_wav, tmp_path):
    segs = [
        Segment("EN9999a", "A", 0.5, 1.5, "hello"),
        Segment("EN9999a", "A", 2.0, 4.2, "world"),
        Segment("EN9999a", "A", 4.9, 9.0, "tail overrun"),
    ]
    res = batch_segment_audio(source_wav, segs, str(tmp_path / "audio"))
    assert [ok for ok, _ in res] == [True, True, True]
    a = load_wav(res[0][1])
    assert len(a) == 16000
    tail = load_wav(res[2][1])
    assert len(tail) == int(0.1 * 16000)  # clipped at source end


def test_add_noise_snr():
    rng = np.random.default_rng(0)
    clean = 0.5 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000).astype(np.float32)
    noise = rng.normal(0, 0.3, 8000).astype(np.float32)
    mixed = add_noise(clean, noise, snr_db=10, rng=rng)
    assert mixed.shape == clean.shape
    resid = mixed - clean * (np.abs(mixed).max() / max(np.abs(clean).max(), 1e-9) if np.abs(mixed).max() <= 1 else 1)
    # SNR approx check: noise power ~= clean power / 10
    n_p = np.mean((mixed - clean) ** 2)
    c_p = np.mean(clean**2)
    assert 0.03 < n_p / c_p < 0.3


def test_align_lengths():
    a, v = align_audio_video_lengths(np.zeros((10, 4)), np.zeros((7, 2)))
    assert len(a) == len(v) == 7


def test_process_in_chunks_resume(tmp_path):
    calls = []

    def work(x):
        calls.append(x)
        if x == 7 and len([c for c in calls if c == 7]) == 1:
            raise RuntimeError("transient")
        return True, x * 2

    ckdir = str(tmp_path / "ck")
    out = process_in_chunks(list(range(10)), work, ckdir, chunk_size=3,
                            checkpoint_every=1)
    assert out["n_ok"] == 9 and out["n_failed"] == 1
    assert chunk_status(ckdir, 0) is True
    assert chunk_status(ckdir, 2) is False  # chunk containing the failure

    # resume: checkpoint says all chunks done -> nothing reruns
    calls.clear()
    out2 = process_in_chunks(list(range(10)), work, ckdir, chunk_size=3)
    assert calls == []
    assert out2["resumed_from"] is not None


def test_process_in_chunks_midchunk_resume(tmp_path):
    ckdir = str(tmp_path / "ck2")
    save_checkpoint(ckdir, ChunkCheckpoint(chunk_index=1, last_item_processed=0))
    seen = []
    out = process_in_chunks(
        list(range(9)), lambda x: (seen.append(x) or True, x), ckdir, chunk_size=3
    )
    # chunk 0 skipped entirely; chunk 1 resumes at item 1 (global index 4)
    assert seen[0] == 4


def test_update_csv_with_results(tmp_path):
    p = str(tmp_path / "drive.csv")
    pd.DataFrame({"id": ["a", "b", "c"], "x": [1, 2, 3]}).to_csv(p, index=False)
    n = update_csv_with_results(p, {"b": {"lip_path": "/out/b.mp4", "ok": True}})
    assert n == 1
    df = pd.read_csv(p)
    assert df.loc[df.id == "b", "lip_path"].iloc[0] == "/out/b.mp4"
    assert pd.isna(df.loc[df.id == "a", "lip_path"].iloc[0])


@pytest.fixture()
def records(tmp_path, source_wav):
    recs = []
    for i in range(5):
        recs.append(
            {
                "id": f"seg{i}",
                "transcript": f"text {i}",
                "start": float(i),
                "end": float(i + 1),
                "duration": 1.0,
                "meeting_id": "EN9999a",
                "speaker_id": "A",
                "audio": source_wav,
            }
        )
    recs.append(dict(recs[0], id="missing", audio=str(tmp_path / "nope.wav")))
    return recs


def test_filter_and_package_hf(records, tmp_path):
    kept, dropped = filter_corrupted_records(records, check_videos=False)
    assert len(kept) == 5 and len(dropped) == 1

    ds = av_to_hf_dataset(records, str(tmp_path / "hfds"), check_videos=False)
    assert len(ds) == 5
    assert os.path.exists(str(tmp_path / "hfds" / "corruption_report.json"))
    item = ds[0]
    assert item["transcript"] == "text 0"
    # decode=False cast: audio carries path/bytes; decoding is done by the
    # framework's own media path
    assert "path" in item["audio"] or "bytes" in item["audio"]


def test_sharded_layout_roundtrip(records, tmp_path):
    manifest = av_to_hf_dataset_with_shards(
        records, str(tmp_path / "sharded"), num_shards=3, check_videos=False
    )
    assert manifest["n_records"] == 5 and manifest["n_dropped"] == 1
    assert len(manifest["shards"]) == 3
    back = load_sharded_records(str(tmp_path / "sharded"))
    assert {r["id"] for r in back} == {f"seg{i}" for i in range(5)}
    rows = list(csv.DictReader(open(manifest["csv"])))
    assert len(rows) == 5 and "shard" in rows[0]


def test_push_backoff():
    attempts = []
    sleeps = []

    def flaky():
        attempts.append(1)
        if len(attempts) < 3:
            raise RuntimeError("HTTP 429 too many requests")
        return "pushed"

    out = push_dataset_to_hub(flaky, sleep=sleeps.append)
    assert out == "pushed"
    assert sleeps == [2.0, 4.0]  # exponential

    with pytest.raises(ValueError):
        push_dataset_to_hub(lambda: (_ for _ in ()).throw(ValueError("fatal")),
                            sleep=sleeps.append)


def test_marker_pipeline(tmp_path):
    csv_path = str(tmp_path / "markers.csv")
    pd.DataFrame(
        {
            "meeting_id": ["M"] * 6,
            "speaker_id": ["A"] * 6,
            "word": ["<laugh>", "um", "uh", ".", "<laugh>", "word"],
            "start_time": [1.0, 2.0, 3.0, 4.0, 5.0, np.nan],
            "end_time": [1.5, 2.4, 3.01, 4.5, 5.5, 7.0],
            "disfluency_type": ["laughter", "hesitation", "hesitation",
                                 "fluent", "laughter", "fluent"],
        }
    ).to_csv(csv_path, index=False)

    df = load_laughter_markers(csv_path)
    assert len(df) == 4  # punct + NaN dropped
    segs, skip = collect_marker_segments(df, min_duration=0.05)
    assert skip["too_short"] == 1  # the 10ms 'uh'
    assert len(segs) == 3
    assert segs[0]["id"] == marker_segment_id("M", "A", 1.0, 1.5, "laughter")

    balanced = balance_classes(segs)
    labels = [s["event_type"] for s in balanced]
    assert labels.count("laughter") == labels.count("hesitation") == 1


def test_segment_sources_end_to_end(tmp_path, source_wav):
    tdir = tmp_path / "transcripts"
    tdir.mkdir()
    (tdir / "EN9999a-A.txt").write_text(
        "[0.50-1.50] hello there\n[2.00-4.20] general kenobi\n"
    )
    out = segment_sources(
        str(tdir),
        audio_sources={("EN9999a", "A"): source_wav},
        output_dir=str(tmp_path / "out"),
        video_sources=None,
        extract_lips=False,
        package_hf=True,
    )
    assert out["stats"]["segments"] == 2
    assert out["stats"]["audio_ok"] == 2
    assert out["stats"]["alignment_issues"] == 0
    assert len(out["dataset"]) == 2
    recs, issues = create_dataset_records(
        [Segment("EN9999a", "A", 0.5, 1.5, "hello there")],
        str(tmp_path / "out" / "audio_segments"),
    )
    assert issues == []


def test_ami_segments_csv_loader(tmp_path, source_wav):
    import pandas as pd

    from avsl_tpu.data.dataset_process import (
        load_ami_segments_csv,
        process_ami_segments_dataset,
    )

    csv_path = str(tmp_path / "ami-segments-info.csv")
    pd.DataFrame(
        {
            "segment_id": ["s0", "s1"],
            "transcript": ["hello", "world"],
            "duration": [1.0, 2.0],
            "audio_abs": [source_wav, source_wav],
        }
    ).to_csv(csv_path, index=False)

    recs = load_ami_segments_csv(csv_path)
    assert recs[0]["audio"] == source_wav
    assert recs[0]["id"] == "s0"

    ds = process_ami_segments_dataset(
        csv_path, str(tmp_path / "hf_out"), check_videos=False
    )
    assert len(ds) == 2


def test_split_dataset(tmp_path, records):
    from avsl_tpu.data.hf_dataset import split_dataset

    recs = [dict(r) for r in records[:5]] * 4  # 20 records
    for i, r in enumerate(recs):
        r["id"] = f"r{i}"
    splits = split_dataset(recs, seed=1)
    assert len(splits["train"]) == 14
    assert len(splits["val"]) == 2
    assert len(splits["test"]) == 4
    ids = [r["id"] for s in splits.values() for r in s]
    assert sorted(ids) == sorted(r["id"] for r in recs)  # disjoint + complete

    on_disk = split_dataset(recs, str(tmp_path / "splits"), seed=1)
    assert len(on_disk["train"]) == 14
    assert os.path.isdir(str(tmp_path / "splits" / "test"))


def test_dataset_from_existing_segments(tmp_path, source_wav):
    """The reference's --mode segment_exist recovery workflow
    (dataset_process.py:549-749): records rebuilt from already-sliced
    media + transcripts, with has_* flags; no re-segmentation."""
    from avsl_tpu.data.dataset_process import dataset_from_existing_segments

    src = tmp_path / "src"
    (src / "audio_segments").mkdir(parents=True)
    (src / "video_segments").mkdir()
    tdir = tmp_path / "transcripts"
    tdir.mkdir()
    (tdir / "EN9999a-A.txt").write_text("[0.50-1.50] hello there\n")

    # this framework's suffixes for one segment, reference suffixes for another
    (src / "audio_segments" / "EN9999a-A-0.50-1.50.wav").write_bytes(b"x")
    (src / "audio_segments" / "EN9999a-A-2.00-3.00-audio.wav").write_bytes(b"x")
    (src / "video_segments" / "EN9999a-A-0.50-1.50-video.mp4").write_bytes(b"x")

    out = dataset_from_existing_segments(
        str(src), str(tdir), str(tmp_path / "ds"), package_hf=False
    )
    by_id = {r["id"]: r for r in out["records"]}
    assert set(by_id) == {"EN9999a-A-0.50-1.50", "EN9999a-A-2.00-3.00"}
    r = by_id["EN9999a-A-0.50-1.50"]
    assert r["has_audio"] and r["has_video"] and r["has_transcript"]
    assert r["transcript"] == "hello there"
    r2 = by_id["EN9999a-A-2.00-3.00"]
    assert r2["has_audio"] and not r2["has_video"] and not r2["has_transcript"]
    assert os.path.exists(str(tmp_path / "ds" / "dataset_records.json"))


def test_reprocess_lips_from_csv(tmp_path):
    """CSV-driven lip reprocess (reference --mode process_lip,
    dataset_process.py:753-1079): results JSON + in-place CSV merge of
    has_lip_video/lip_video; missing files counted, not fatal."""
    from avsl_tpu.data.dataset_process import reprocess_lips_from_csv
    from avsl_tpu.data.video_io import write_video_frames

    vid = str(tmp_path / "seg1.mp4")
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (8, 120, 160)).astype(np.uint8)
    write_video_frames(vid, frames, fps=25)

    csv_path = str(tmp_path / "info.csv")
    pd.DataFrame({
        "id": ["seg1", "seg2"],
        "video": [vid, str(tmp_path / "missing.mp4")],
        "has_video": [True, True],
    }).to_csv(csv_path, index=False)

    out = reprocess_lips_from_csv(csv_path, str(tmp_path / "lips"))
    assert out["missing_files"] == 1
    assert out["n_ok"] + out["n_failed"] == 1

    df = pd.read_csv(csv_path)
    row = df[df["id"] == "seg1"].iloc[0]
    assert bool(row["has_lip_video"]) == (out["n_ok"] == 1)
    results = json.load(open(str(tmp_path / "lips" / "lip_segment_results.json")))
    assert "seg1" in results


def test_process_marker_dataset_stats(tmp_path, source_wav):
    """dsfl-style per-reason skip accounting + per-type stats JSON
    (dsfl_dataset_process.py:50-53; laugh_dataset_process.py:296-309)."""
    from avsl_tpu.data.dataset_process import process_marker_dataset

    df = pd.DataFrame({
        "meeting_id": ["EN9999a"] * 5 + ["ZZ0000x"],
        "speaker_id": ["A"] * 4 + ["Q", "A"],
        "word": ["<laugh>", "um", "uh", "w", "w", "w"],
        "start_time": [1.0, 2.0, 3.0, 4.0, 1.0, 1.0],
        "end_time": [1.5, 2.4, 3.01, 4.5, 1.5, 1.5],
        "disfluency_type": ["laughter", "hesitation", "hesitation",
                            "fluent", "fluent", "fluent"],
    })
    out = process_marker_dataset(
        df,
        audio_sources={("EN9999a", "A"): source_wav},
        output_dir=str(tmp_path / "marker_out"),
        min_duration=0.05,
        balance=False,
        speakers=["A", "B", "C", "D", "E"],
    )
    stats = out["stats"]
    assert stats["skipped"]["speaker_mapping"] == 1  # speaker Q
    assert stats["skipped"]["too_short"] == 1        # 10ms 'uh'
    assert stats["skipped"]["source_missing"] == 1   # meeting ZZ0000x
    assert stats["per_event_type"] == {"fluent": 1, "hesitation": 1, "laughter": 1}
    assert stats["audio_ok"] == 3
    assert os.path.exists(out["stats_path"])
    saved = json.load(open(out["stats_path"]))
    assert saved["per_event_type"] == stats["per_event_type"]
    # sliced audio actually exists with the event-typed id
    seg = out["segments"][0]
    assert os.path.exists(seg["audio"])
    assert "laughter" in seg["audio"]


def test_marker_segment_id_sanitizes_event_labels():
    """Filename-hostile event labels (dsfl types like 'uh-huh?') are
    sanitized before entering segment ids (dsfl_dataset_process.py:116)."""
    from avsl_tpu.data.dataset_process import marker_segment_id, sanitize_filename

    assert sanitize_filename('uh/huh?*"x"') == "uh_huh___x_"
    sid = marker_segment_id("M", "A", 1.0, 1.5, "uh-huh?")
    assert "?" not in sid and sid.startswith("M-A-uh-huh_")


def test_resume_with_different_chunk_size_remaps(tmp_path):
    """A checkpoint written at chunk_size=3 resumed at chunk_size=5 must
    remap via the completed item count, never reuse the raw chunk index
    (which would silently skip items)."""
    ckdir = str(tmp_path / "ck_remap")
    # first run at size 3: complete chunks 0-1 (items 0-5), then item 6
    seen1 = []
    save_checkpoint(
        ckdir,
        ChunkCheckpoint(chunk_index=2, last_item_processed=0, chunk_size=3),
    )
    out = process_in_chunks(
        list(range(10)), lambda x: (seen1.append(x) or True, x),
        ckdir, chunk_size=5,
    )
    # 7 items done -> floor(7/5)=1 full new-size chunk done -> restart at
    # item 5 (items 5-6 safely re-processed, nothing skipped)
    assert seen1[0] == 5
    assert out["n_ok"] == 5

    # same chunk_size resumes exactly (no remap)
    ckdir2 = str(tmp_path / "ck_same")
    save_checkpoint(
        ckdir2,
        ChunkCheckpoint(chunk_index=1, last_item_processed=1, chunk_size=3),
    )
    seen2 = []
    process_in_chunks(
        list(range(9)), lambda x: (seen2.append(x) or True, x),
        ckdir2, chunk_size=3,
    )
    assert seen2[0] == 5  # chunk 1 item 2 = global 5


def _boom_on_three(x):
    if x == 3:
        raise ValueError("corrupt item")
    return True, x * 2


def test_multiprocessing_driver_guards_item_exceptions(tmp_path):
    """One raising item must become (False, error) instead of killing the
    pool.map before the chunk checkpoint (which would make every resume
    replay the same crash)."""
    from avsl_tpu.data.chunked import process_chunks_with_multiprocessing

    ckdir = str(tmp_path / "ck_mp")
    out = process_chunks_with_multiprocessing(
        list(range(6)), _boom_on_three, ckdir, chunk_size=3, num_workers=2,
    )
    assert out["n_ok"] == 5 and out["n_failed"] == 1
    ok, payload = out["results"][3]
    assert ok is False and "ValueError" in payload
    # both chunks checkpointed despite the failure
    ck = find_checkpoint(ckdir)
    assert ck.chunk_index == 2 and ck.chunk_size == 3


def test_marker_duplicate_ids_disambiguated():
    """Two annotations that round to identical (speaker, time, type) must
    not share a segment id — one wav would be double-counted."""
    df = pd.DataFrame(
        {
            "meeting_id": ["M", "M"],
            "speaker_id": ["A", "A"],
            "word": ["<laugh>", "<laugh>"],
            "start_time": [1.0, 1.001],   # both round to 1.00 centiseconds
            "end_time": [1.5, 1.501],
            "disfluency_type": ["laughter", "laughter"],
        }
    )
    segs, _ = collect_marker_segments(df, min_duration=0.05)
    assert len(segs) == 2
    assert segs[0]["id"] != segs[1]["id"]
    assert segs[1]["id"].endswith("-2")


def test_hf_dataset_column_union(records, tmp_path):
    """Media keys present on only SOME records must still become columns
    (keying off record 0 alone dropped them when it was audio-only)."""
    recs = [dict(r) for r in records[:3]]
    recs[2]["lip_video"] = recs[2]["audio"]  # any existing file path
    ds = av_to_hf_dataset(recs, str(tmp_path / "hf_union"),
                          check_videos=False)
    assert "lip_video" in ds.column_names
    assert len(ds) == 3
