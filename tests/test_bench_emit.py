"""The driver parses bench.py's FINAL stdout line as the round headline.

Round 4's number was lost because the full result blob (every secondary
series inlined) exceeded the driver's tail-capture window and was
truncated mid-line (VERDICT.md round 4, Weak #1). These tests pin the
contract: the final stdout line is a compact, parseable headline JSON
with metric/value/unit/vs_baseline, bounded in size; the full result
lands in bench_full.json.
"""

import io
import json
import sys

import pytest


@pytest.fixture()
def emit(tmp_path):
    src = open("bench.py").read()
    # execute only the module prefix (constants + _emit); main() pulls in
    # jax/models and must not run here
    prefix = src.split("def _series_stats")[0] + "pass"
    ns = {"__file__": str(tmp_path / "bench.py")}
    exec(compile(prefix, "bench.py", "exec"), ns)
    return ns["_emit"], tmp_path


def _capture_stdout(fn, *a):
    cap = io.StringIO()
    old = sys.stdout
    sys.stdout = cap
    try:
        fn(*a)
    finally:
        sys.stdout = old
    return cap.getvalue()


BIG_RESULT = {
    "metric": "ami_av_segments_per_sec_per_chip",
    "value": 12.3,
    "unit": "segments/s",
    "vs_baseline": 8.2,
    "mode": "crops",
    "model": "base",
    "host_crop_median_s": 0.61,
    "device_resident": {"segments_per_sec": 36.5, "iter_median_s": 0.219,
                        "padding": "x" * 2000},
    "real_media": {"segments_per_sec": 2.8, "padding": "y" * 2000},
    "large_device_resident": {"segments_per_sec": 15.8},
    "serving": {"requests_per_sec": 4.2, "p50_latency_s": 0.4},
    "train_step": {"reference": {"mfu": 0.31, "step_time_s": 0.55,
                                 "segments_per_sec": 29.0,
                                 "padding": "z" * 2000}},
    "crops_depleted": {"segments_per_sec": 11.9},
}


def test_final_stdout_line_is_compact_and_parseable(emit):
    _emit, tmp = emit
    out = _capture_stdout(_emit, BIG_RESULT)
    lines = out.strip().split("\n")
    last = lines[-1]
    # well under any sane tail-capture window even with secondary scalars
    assert len(last) < 1200
    parsed = json.loads(last)
    assert parsed["metric"] == "ami_av_segments_per_sec_per_chip"
    assert parsed["value"] == 12.3
    assert parsed["unit"] == "segments/s"
    assert parsed["vs_baseline"] == 8.2
    # no nested dicts on the final line
    assert not any(isinstance(v, (dict, list)) for v in parsed.values())


def test_secondary_series_summarised_as_scalars(emit):
    _emit, tmp = emit
    parsed = json.loads(
        _capture_stdout(_emit, BIG_RESULT).strip().split("\n")[-1]
    )
    assert parsed["device_resident_segments_per_sec"] == 36.5
    assert parsed["large_device_resident_segments_per_sec"] == 15.8
    assert parsed["serving_requests_per_sec"] == 4.2
    assert parsed["train_mfu"] == 0.31
    assert parsed["train_step_time_s"] == 0.55


def test_full_result_written_to_file(emit):
    _emit, tmp = emit
    _capture_stdout(_emit, BIG_RESULT)
    full = json.loads((tmp / "bench_full.json").read_text())
    assert full == BIG_RESULT


def test_error_result_passes_through(emit):
    _emit, tmp = emit
    parsed = json.loads(
        _capture_stdout(
            _emit,
            {"metric": "segments_per_sec_per_chip", "value": 0.0,
             "unit": "segments/s", "vs_baseline": 0.0,
             "error": "tpu_backend_unavailable"},
        ).strip().split("\n")[-1]
    )
    assert parsed["value"] == 0.0
    assert parsed["error"] == "tpu_backend_unavailable"


@pytest.fixture()
def bench_ns(tmp_path):
    src = open("bench.py").read()
    prefix = src.split("def _series_stats")[0] + "pass"
    ns = {"__file__": str(tmp_path / "bench.py")}
    exec(compile(prefix, "bench.py", "exec"), ns)
    return ns, tmp_path


def test_watchdog_emits_parseable_line_with_no_results(bench_ns):
    """A run wedged before ANY series lands (observed: a d2h scalar pull
    blocking >27 min) must still put a parseable final line on stdout."""
    ns, tmp_path = bench_ns
    ns["os"]._exit = lambda code: None  # keep the test process alive
    try:
        out = _capture_stdout(ns["_watchdog_emit"])
    finally:
        import os as _os
        import importlib
        importlib.reload(_os)
    line = out.strip().splitlines()[-1]
    d = json.loads(line)
    assert d["value"] == 0.0
    assert "watchdog" in d["error"]
    assert d["metric"] == "ami_av_segments_per_sec_per_chip"


def test_watchdog_uses_partial_headline_and_wins_the_emit_race(bench_ns):
    ns, tmp_path = bench_ns
    ns["os"]._exit = lambda code: None
    ns["_PARTIAL"]["headline"] = {"segments_per_sec": 12.5}
    ns["_PARTIAL"]["device_resident"] = {"segments_per_sec": 40.0}
    out = _capture_stdout(ns["_watchdog_emit"])
    d = json.loads(out.strip().splitlines()[-1])
    assert d["value"] == 12.5
    assert d["device_resident_segments_per_sec"] == 40.0
    # idempotence: a late normal emit after the watchdog fired is a no-op
    late = _capture_stdout(ns["_emit"], {"metric": "x", "value": 1})
    assert late == ""
