"""Dynamic-batching transcription server (infer/server.py).

The reference has no serving surface; this validates the TPU build's
production path: HTTP intake -> request coalescing into the compiled
static-batch program -> per-request completion, with stats, error
isolation, and the missing-modality mix in one batch.
"""

import base64
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def server():
    from avsl_tpu.data.tokenizer import get_tokenizer
    from avsl_tpu.infer import StreamingTranscriber, TranscriptionServer
    from avsl_tpu.models.factory import build_whisper_flamingo

    tokenizer = get_tokenizer(None, "en")
    model, cfg = build_whisper_flamingo(
        "test", vocab_size=tokenizer.vocab_size, dtype="float32"
    )
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_mels, 100), jnp.float32),
        jnp.asarray([[1]]),
        video=jnp.zeros((1, 20, 88, 88, 1), jnp.float32),
    )
    tr = StreamingTranscriber(
        model, variables, tokenizer,
        audio_max_length=16000, video_frames=20,
        batch_size=4, max_new_tokens=4,
    )
    srv = TranscriptionServer(tr, port=0, max_wait_ms=150.0).start()
    yield srv
    srv.stop()


def _url(server, path):
    host, port = server.address
    return f"http://{host}:{port}{path}"


def _post(server, payload, timeout=120):
    req = urllib.request.Request(
        _url(server, "/v1/transcribe"),
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def _pcm_b64(seconds=0.5, freq=300.0):
    t = np.arange(int(16000 * seconds)) / 16000
    pcm = (0.2 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    return base64.b64encode(pcm.tobytes()).decode()


def test_healthz_and_single_request(server):
    with urllib.request.urlopen(_url(server, "/healthz"), timeout=30) as r:
        health = json.loads(r.read())
    assert health["ok"] and health["batch_size"] == 4

    status, out = _post(server, {"id": "solo", "audio_pcm_b64": _pcm_b64()})
    assert status == 200
    assert out["id"] == "solo"
    assert isinstance(out["text"], str)
    assert out["has_video"] is False
    assert out["latency_ms"] > 0
    assert isinstance(out["avg_logprob"], float) and out["avg_logprob"] <= 0


def test_concurrent_requests_are_batched(server):
    """Four simultaneous requests within the wait window should coalesce
    into fewer device launches than requests (occupancy > 1)."""
    before = server.stats.snapshot().get("n_batches", 0)
    results = {}
    errs = []

    def fire(i):
        try:
            results[i] = _post(
                server, {"id": f"r{i}", "audio_pcm_b64": _pcm_b64(freq=200 + 40 * i)}
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=fire, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert not errs
    assert len(results) == 4
    for i, (status, out) in results.items():
        assert status == 200 and out["id"] == f"r{i}"

    snap = server.stats.snapshot()
    assert snap["n_requests"] >= 5  # incl. the single-request test
    assert snap["batch_occupancy"]["max"] >= 2
    new_batches = snap["n_batches"] - before
    assert new_batches < 4  # coalesced, not one launch per request


def test_malformed_request_is_rejected(server):
    req = urllib.request.Request(
        _url(server, "/v1/transcribe"),
        data=json.dumps({"id": "bad"}).encode(),  # no audio at all
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400


def test_cli_serve_smoke():
    from avsl_tpu.cli.serve import main

    srv = main(["--smoke", "--batch_size", "2", "--max_new_tokens", "2",
                "--port", "0"])
    assert srv is not None


def test_backpressure_sheds_load_with_429(server):
    """A bounded queue rejects the overflow request with HTTP 429 while
    queued work completes once the scheduler drains. Deterministic: the
    scheduler thread is started only after the queue is full."""
    import numpy as np
    import urllib.error

    from avsl_tpu.infer import TranscriptionServer

    srv = TranscriptionServer(
        server.transcriber, port=0, max_wait_ms=1.0, max_queue=1
    )
    srv._http_thread.start()  # HTTP up, scheduler NOT running
    try:
        first = {}

        def fire_first():
            first["resp"] = _post(srv, {
                "id": "q1", "audio_pcm_b64": _pcm_b64(freq=260),
            }, timeout=180)

        t = threading.Thread(target=fire_first)
        t.start()
        # wait until q1 actually occupies the queue
        for _ in range(100):
            if srv._queue.full():
                break
            import time as _time

            _time.sleep(0.02)
        assert srv._queue.full()

        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(srv, {"id": "q2", "audio_pcm_b64": _pcm_b64(freq=300)})
        assert ei.value.code == 429
        assert srv.stats.snapshot()["n_rejected"] == 1

        srv._scheduler.start()  # drain: q1 must now complete normally
        t.join(timeout=180)
        status, out = first["resp"]
        assert status == 200 and out["id"] == "q1"
    finally:
        srv.stop()


def test_batch_failure_isolates_and_daemon_survives(server):
    """A transcriber exception fails that batch's requests with HTTP 500;
    the scheduler and compiled program stay up and the next request
    succeeds (the daemon's error-isolation contract)."""
    import urllib.error

    tr = server.transcriber
    original = tr.transcribe_batch
    state = {"raised": False}

    def boom(items):
        if not state["raised"]:
            state["raised"] = True
            raise RuntimeError("injected device failure")
        return original(items)

    tr.transcribe_batch = boom
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(server, {"id": "f1", "audio_pcm_b64": _pcm_b64(freq=310)})
        assert ei.value.code == 500
        assert "injected device failure" in ei.value.read().decode()

        status, out = _post(
            server, {"id": "f2", "audio_pcm_b64": _pcm_b64(freq=320)}
        )
        assert status == 200 and out["id"] == "f2"
        assert server.stats.snapshot()["n_errors"] >= 1
    finally:
        tr.transcribe_batch = original
