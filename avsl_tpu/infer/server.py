"""Transcription serving daemon: HTTP front, dynamic batching core.

The reference has no serving story at all — its inference surface is a
Lightning validation loop inside the training script
(/root/reference/avsl/whisper_flamingo_ft_ami.py:558-634). This is the
production-serving counterpart for the TPU build, shaped around how a
TPU actually wants to be fed:

* **One compiled program, one static batch shape.** Requests arriving
  within a ``max_wait_ms`` window are coalesced into the
  ``StreamingTranscriber``'s fixed batch (padding the remainder), so
  the device always runs the same XLA program at full tile occupancy —
  no per-request retrace, no shape zoo.
* **The batcher is the only device client.** HTTP handler threads never
  touch jax; they enqueue a request and wait on its event. A single
  scheduler thread owns the device loop, which serializes device access
  by construction (the same rule the tunnel bench learned the hard way).
* **Missing modality is a batch property, not a server mode.**
  Audio-only and AV requests mix freely in one batch (zeroed video +
  feature-level presence masking downstream).

Protocol (JSON over HTTP, stdlib-only so the dependency surface stays
baked-in):

    POST /v1/transcribe   {"id": ..., "audio": <wav path>,
                           "audio_pcm_b64": <base64 float32 PCM@16k>,
                           "lip_video": <mp4 path>, "video": <mp4 path>,
                           "long": <bool>}
      -> {"id", "text", "has_video", "latency_ms"}
         (+ "segments": [{start_s, end_s, text}] when long=true:
          arbitrary-duration media split at minimum-energy points, the
          windows batched like any other requests — infer/longform.py)
    GET  /healthz         -> {"ok": true, ...}
    GET  /stats           -> latency percentiles + batch occupancy

Use :class:`TranscriptionServer` programmatically or via
``python -m avsl_tpu.cli.serve``.
"""

from __future__ import annotations

import base64
import json
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from queue import Empty, Full, Queue
from typing import Any, Dict, List, Optional

import numpy as np


@dataclass
class _Pending:
    item: Dict[str, Any]
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[Any] = None
    error: Optional[str] = None
    t_enqueue: float = field(default_factory=time.perf_counter)
    latency_ms: float = 0.0


class _Stats:
    def __init__(self):
        self.lock = threading.Lock()
        self.latencies_ms: List[float] = []
        self.occupancies: List[int] = []
        self.n_requests = 0
        self.n_errors = 0
        self.n_rejected = 0

    def record_batch(self, occupancy: int, latencies_ms: List[float], errors: int = 0):
        with self.lock:
            self.occupancies.append(occupancy)
            self.latencies_ms.extend(latencies_ms)
            self.n_requests += occupancy
            self.n_errors += errors
            # bounded memory: keep the newest 10k samples
            self.latencies_ms = self.latencies_ms[-10000:]
            self.occupancies = self.occupancies[-10000:]

    def snapshot(self) -> Dict[str, Any]:
        with self.lock:
            lat = np.asarray(self.latencies_ms, np.float64)
            occ = np.asarray(self.occupancies, np.float64)
            out = {
                "n_requests": self.n_requests,
                "n_errors": self.n_errors,
                "n_rejected": self.n_rejected,
                "n_batches": int(occ.size),
            }
            if lat.size:
                out["latency_ms"] = {
                    "p50": round(float(np.percentile(lat, 50)), 1),
                    "p95": round(float(np.percentile(lat, 95)), 1),
                    "max": round(float(lat.max()), 1),
                }
            if occ.size:
                out["batch_occupancy"] = {
                    "mean": round(float(occ.mean()), 2),
                    "max": int(occ.max()),
                }
            return out


class TranscriptionServer:
    """Dynamic-batching scheduler + stdlib HTTP front for a
    :class:`~avsl_tpu.infer.StreamingTranscriber`.

    ``max_wait_ms`` trades tail latency for batch occupancy: the first
    request in an empty queue waits at most this long for companions
    before the batch launches (arrivals during the device run queue up
    for the next one, so a loaded server pipelines naturally).
    """

    def __init__(
        self,
        transcriber,
        host: str = "127.0.0.1",
        port: int = 0,
        max_wait_ms: float = 30.0,
        max_queue: int = 256,
    ):
        self.transcriber = transcriber
        self.max_wait_ms = float(max_wait_ms)
        self.stats = _Stats()
        # backpressure: a bounded queue sheds load with HTTP 429 instead
        # of letting tail latency grow without bound under overload
        self._queue: "Queue[_Pending]" = Queue(maxsize=max(int(max_queue), 1))
        self._stop = threading.Event()
        self._scheduler = threading.Thread(target=self._run_scheduler, daemon=True)

        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet by default
                pass

            def _reply(self, code: int, payload: Dict[str, Any]):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._reply(200, {
                        "ok": True,
                        "batch_size": server.transcriber.batch_size,
                        "quantize": getattr(server.transcriber, "quantize", None),
                    })
                elif self.path == "/stats":
                    snap = server.stats.snapshot()
                    spec = server.transcriber.spec_stats()
                    if spec is not None:
                        snap["speculative"] = spec
                    self._reply(200, snap)
                else:
                    self._reply(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/v1/transcribe":
                    self._reply(404, {"error": "not found"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(n) or b"{}")
                    item = server._parse_item(req)
                except Exception as e:  # malformed request
                    self._reply(400, {"error": str(e)})
                    return
                if req.get("long"):
                    # long-form: split HERE (host-only work on the
                    # handler thread), enqueue every window as an
                    # ordinary request — windows of concurrent long
                    # requests coalesce in the same batcher — then
                    # stitch (infer/longform.py)
                    from avsl_tpu.infer.longform import split_item, stitch

                    try:
                        tr = server.transcriber
                        windows, spans = split_item(
                            item, tr.audio_max_length, tr.video_frames,
                            crop=tr.crop,
                        )
                    except Exception as e:
                        self._reply(400, {"error": str(e)})
                        return
                    pendings = [server.submit(w) for w in windows]
                    if any(p is None for p in pendings):
                        # overload: some windows were shed; the accepted
                        # ones still run but this request fails fast
                        self._reply(429, {"error": "server overloaded"})
                        return
                    t_left = 600.0
                    for p in pendings:
                        t0 = time.perf_counter()
                        if not p.done.wait(timeout=max(t_left, 0.001)):
                            self._reply(504, {"error": "timed out"})
                            return
                        t_left -= time.perf_counter() - t0
                    errs = [p.error for p in pendings if p.error is not None]
                    if errs:
                        self._reply(500, {"error": errs[0]})
                        return
                    long_r = stitch(
                        item.get("id", ""), [p.result for p in pendings], spans
                    )
                    self._reply(200, {
                        "id": long_r.id,
                        "text": long_r.text,
                        "has_video": long_r.has_video,
                        "segments": [
                            {"start_s": s.start_s, "end_s": s.end_s,
                             "text": s.text, "avg_logprob": s.avg_logprob,
                             **({"words": s.words}
                                if s.words is not None else {})}
                            for s in long_r.segments
                        ],
                        "latency_ms": round(
                            max(p.latency_ms for p in pendings), 1
                        ),
                    })
                    return
                pending = server.submit(item)
                if pending is None:
                    self._reply(429, {"error": "server overloaded"})
                    return
                if not pending.done.wait(timeout=300.0):
                    self._reply(504, {"error": "timed out"})
                    return
                if pending.error is not None:
                    self._reply(500, {"error": pending.error})
                    return
                r = pending.result
                payload = {
                    "id": r.id,
                    "text": r.text,
                    "has_video": r.has_video,
                    "avg_logprob": r.avg_logprob,
                    "latency_ms": round(pending.latency_ms, 1),
                }
                if r.words is not None:
                    payload["words"] = r.words
                self._reply(200, payload)

        self._http = ThreadingHTTPServer((host, port), Handler)
        self._http.daemon_threads = True
        self._http_thread = threading.Thread(
            target=self._http.serve_forever, daemon=True
        )

    # -- request intake -------------------------------------------------

    @staticmethod
    def _parse_item(req: Dict[str, Any]) -> Dict[str, Any]:
        item: Dict[str, Any] = {"id": str(req.get("id", ""))}
        if "audio_pcm_b64" in req:
            pcm = np.frombuffer(
                base64.b64decode(req["audio_pcm_b64"]), np.float32
            )
            if pcm.size == 0:
                raise ValueError("empty audio_pcm_b64")
            item["audio"] = pcm
        elif "audio" in req:
            item["audio"] = str(req["audio"])
        else:
            raise ValueError("need 'audio' (wav path) or 'audio_pcm_b64'")
        for k in ("lip_video", "video"):
            if req.get(k):
                item[k] = str(req[k])
        return item

    def submit(self, item: Dict[str, Any]) -> Optional[_Pending]:
        """Enqueue one request; wait on ``pending.done``. Returns None
        when the queue is full (callers answer 429)."""
        pending = _Pending(item=item)
        try:
            self._queue.put_nowait(pending)
        except Full:
            with self.stats.lock:
                self.stats.n_rejected += 1
            return None
        return pending

    # -- scheduler ------------------------------------------------------

    def _gather(self) -> List[_Pending]:
        """Block for the first request, then coalesce up to batch_size
        within the max_wait window."""
        try:
            first = self._queue.get(timeout=0.2)
        except Empty:
            return []
        batch = [first]
        deadline = time.perf_counter() + self.max_wait_ms / 1e3
        while len(batch) < self.transcriber.batch_size:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                batch.append(self._queue.get(timeout=remaining))
            except Empty:
                break
        return batch

    def _run_scheduler(self):
        while not self._stop.is_set():
            batch = self._gather()
            if not batch:
                continue
            t0 = time.perf_counter()
            try:
                results = self.transcriber.transcribe_batch(
                    [p.item for p in batch]
                )
                for p, r in zip(batch, results):
                    p.result = r
                    p.latency_ms = 1e3 * (time.perf_counter() - p.t_enqueue)
                errors = 0
            except Exception as e:  # batch-level failure: fail each request
                for p in batch:
                    p.error = f"{type(e).__name__}: {e}"
                errors = len(batch)
            finally:
                for p in batch:
                    p.done.set()
            self.stats.record_batch(
                occupancy=len(batch),
                latencies_ms=[p.latency_ms for p in batch if p.error is None],
                errors=errors,
            )
            del t0  # latency is per-request (enqueue->done), not per-batch

    # -- lifecycle ------------------------------------------------------

    @property
    def address(self):
        return self._http.server_address

    def start(self):
        self._scheduler.start()
        self._http_thread.start()
        return self

    def serve_forever(self):
        # SIGTERM (the orchestrator's stop signal) drains like Ctrl-C:
        # in-flight batches finish, waiters get their replies, then the
        # scheduler and HTTP threads join
        import signal

        try:
            signal.signal(signal.SIGTERM, lambda *_: self._stop.set())
        except ValueError:  # not the main thread (tests)
            pass
        self.start()
        try:
            while not self._stop.is_set():
                time.sleep(0.5)
        except KeyboardInterrupt:
            pass
        finally:
            self.stop()

    def stop(self):
        self._stop.set()
        self._http.shutdown()
        self._http.server_close()
        if self._scheduler.is_alive():
            self._scheduler.join(timeout=5.0)
        # fail-fast anything still queued: their handler threads are
        # blocked on pending.done and would otherwise wait out the full
        # request timeout after the scheduler has already exited
        while True:
            try:
                p = self._queue.get_nowait()
            except Empty:
                break
            p.error = "server stopped"
            p.done.set()
