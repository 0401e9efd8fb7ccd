"""Serving-daemon load test: concurrent HTTP clients against the
dynamic batcher; prints ONE JSON line with throughput + latency + batch
occupancy.

    python scripts/bench_serving.py [--clients 16] [--requests 64]
        [--batch_size 8] [--max_wait_ms 30] [--device cpu|default]

Measures the SERVER layer (request coalescing, scheduler, HTTP) around
the compiled program — on CPU it characterizes batching efficiency
(occupancy should approach min(clients, batch_size)); on the TPU the
same numbers include real device steps. The reference has no serving
surface to compare against; this is the framework's own regression
anchor for the daemon.
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--clients", type=int, default=16)
    p.add_argument("--requests", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_wait_ms", type=float, default=30.0)
    p.add_argument("--max_new_tokens", type=int, default=8)
    p.add_argument("--device", default="cpu", choices=["cpu", "default"],
                   help="cpu forces the host backend (safe anywhere); "
                        "default uses whatever jax picks (TPU under axon)")
    args = p.parse_args()

    if args.device == "cpu":
        os.environ.pop("JAX_PLATFORMS", None)
    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

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
        batch_size=args.batch_size, max_new_tokens=args.max_new_tokens,
    )
    srv = TranscriptionServer(tr, port=0, max_wait_ms=args.max_wait_ms).start()
    host, port = srv.address
    url = f"http://{host}:{port}/v1/transcribe"

    # one warm-up request compiles the program outside the measured window
    pcm = (0.2 * np.sin(2 * np.pi * 300 * np.arange(8000) / 16000)).astype(
        np.float32
    )
    b64 = base64.b64encode(pcm.tobytes()).decode()

    def post(i):
        req = urllib.request.Request(
            url,
            data=json.dumps({"id": f"r{i}", "audio_pcm_b64": b64}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            return json.loads(r.read())

    post(-1)
    before = srv.stats.snapshot()

    errors = []
    done = []
    lock = threading.Lock()
    todo = list(range(args.requests))

    def client():
        while True:
            with lock:
                if not todo:
                    return
                i = todo.pop()
            try:
                out = post(i)
                with lock:
                    done.append(out["latency_ms"])
            except Exception as e:  # pragma: no cover
                with lock:
                    errors.append(str(e))

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    snap = srv.stats.snapshot()
    srv.stop()

    lat = np.asarray(done, np.float64)
    print(json.dumps({
        "metric": "serving_requests_per_sec",
        "value": round(args.requests / dt, 2),
        "unit": "req/s",
        "clients": args.clients,
        "requests": args.requests,
        "errors": len(errors),
        "latency_ms": {
            "p50": round(float(np.percentile(lat, 50)), 1),
            "p95": round(float(np.percentile(lat, 95)), 1),
        } if lat.size else None,
        "batch_occupancy_mean": round(
            (snap["n_requests"] - before["n_requests"]) /
            max(snap["n_batches"] - before["n_batches"], 1), 2
        ),
        "device": args.device,
    }))


if __name__ == "__main__":
    main()
