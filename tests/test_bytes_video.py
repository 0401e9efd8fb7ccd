"""Bytes-backed video records (VERDICT r3 item 7).

A dataset whose video column stores ENCODED BYTES — the normal HF
``Video()`` cast round-trip, and decord's ingestion role in the
reference (utils/hf_video_utils.py:23-96) — must read through every
decode entry point: read_video_frames, load_video_feats,
validate_video, and the corruption filter feeding av_to_hf_dataset.
"""

import os

import numpy as np
import pytest

from avsl_tpu.data.hf_dataset import av_to_hf_dataset, filter_corrupted_records
from avsl_tpu.data.video_io import (
    load_video_feats,
    read_video_frames,
    validate_video,
    video_source_path,
    write_video_frames,
)


@pytest.fixture()
def mp4(tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (12, 96, 112), np.uint8)
    path = str(tmp_path / "clip.mp4")
    write_video_frames(path, frames, fps=25)
    return path, frames


def test_bytes_and_dict_sources_decode_like_paths(mp4):
    path, _ = mp4
    ref = read_video_frames(path)
    data = open(path, "rb").read()
    for src in (
        data,  # raw bytes
        bytearray(data),
        {"bytes": data, "path": None},  # HF Video() cast round-trip
        {"bytes": None, "path": path},  # path-only record dict
        {"path": path},
    ):
        np.testing.assert_array_equal(read_video_frames(src), ref)


def test_reader_like_object_resolves_by_path_attr(mp4):
    path, _ = mp4

    class FakeReader:  # decord.VideoReader look-alike
        def __init__(self, p):
            self._filename = p

    np.testing.assert_array_equal(
        read_video_frames(FakeReader(path)), read_video_frames(path)
    )


def test_temp_spool_is_cleaned_up(mp4):
    path, _ = mp4
    data = open(path, "rb").read()
    with video_source_path(data) as p:
        assert os.path.exists(p)
        spooled = p
    assert not os.path.exists(spooled)


def test_unresolvable_sources_raise(mp4):
    with pytest.raises(IOError, match="neither bytes nor path"):
        read_video_frames({"id": "x"})
    with pytest.raises(IOError, match="cannot resolve"):
        read_video_frames(12345)


def test_load_video_feats_from_bytes(mp4):
    path, _ = mp4
    data = open(path, "rb").read()
    a = load_video_feats(path)
    b = load_video_feats({"bytes": data, "path": None})
    np.testing.assert_array_equal(a, b)
    assert b.shape[1:] == (88, 88, 1)


def test_validate_video_on_bytes(mp4):
    path, _ = mp4
    data = open(path, "rb").read()
    ok, reason = validate_video({"bytes": data, "path": None})
    assert ok, reason
    bad_ok, bad_reason = validate_video({"bytes": b"\x00" * 4096, "path": None})
    assert not bad_ok and bad_reason == "unreadable_first_frame"
    tiny_ok, tiny_reason = validate_video(b"xx")
    assert not tiny_ok and tiny_reason == "too_small"


def test_corruption_filter_and_hf_round_trip(mp4, tmp_path):
    """Records whose video column stores encoded bytes flow through the
    corruption filter and av_to_hf_dataset; corrupt byte payloads are
    dropped with a report, exactly like corrupt files."""
    import scipy.io.wavfile as wavfile

    path, _ = mp4
    data = open(path, "rb").read()
    wav = str(tmp_path / "a.wav")
    wavfile.write(wav, 16000, np.zeros(1600, np.int16))

    records = [
        {"id": "ok", "transcript": "hi", "audio": wav,
         "video": {"bytes": data, "path": None}},
        {"id": "bad", "transcript": "no", "audio": wav,
         "video": {"bytes": b"\x00" * 4096, "path": None}},
    ]
    kept, dropped = filter_corrupted_records(records)
    assert [r["id"] for r in kept] == ["ok"]
    assert [r["id"] for r in dropped] == ["bad"]

    out = str(tmp_path / "ds")
    ds = av_to_hf_dataset(records, out, cast_media=False)
    assert len(ds) == 1
    # the stored record still decodes through the framework's own path
    rec = ds[0]
    frames = read_video_frames(rec["video"])
    assert frames.shape[0] == 12
    import json

    report = json.load(open(os.path.join(out, "corruption_report.json")))
    assert report["dropped"] == ["bad"]
