"""Benchmark: AMI AV segments/sec/chip (preprocess + encode + decode).

Covers the full per-segment pipeline the baseline number describes
(/root/repo/BASELINE.md — the reference bottleneck is ~1-2 segments/s for
lip-ROI extraction alone on a GPU node): face/mouth detection, per-frame
NCC mouth tracking, similarity warp to 88x88 mouth crops, Whisper
log-mel, Whisper(+Flamingo gated x-attn) audio encoder + AV-HuBERT video
encoder (Pallas fused attention), KV-cached greedy decode.

HEADLINE (mode "crops"): the minimal-bytes production split. Detection +
tracking + warp run ON THE HOST next to the media source (C++ sampler,
cv2 NCC — infer/host_crops.py, golden-tested against the reference's own
dlib lip clip at the on-device frontend's level), and only int16 PCM +
uint8 88x88 crops cross the host->device link: ~18 MB per 8-segment
batch instead of ~203 MB of full frames. The host work runs on a
producer thread overlapped with the consumer's upload/compute waits (the
production pipeline shape; all uploads stay on the consumer thread).
This makes the headline robust to the tunnel's multi-tier rate limiting
(measured: ~2.5 GB burst at ~1.4 GB/s, then ~130 MB/s, then ~16 MB/s):
at a fully-throttled 50 MB/s, 18 MB/iter still sustains >= 15 seg/s.

Secondary series in the same JSON:
* device_resident — the whole pipeline INCLUDING detection/track/warp on
  device, inputs resident (uploaded once): per-batch compute independent
  of link state.
* real_media — mp4 decode (C++ libav) + host crops inside the measured
  loop, in a fresh subprocess (the tunnel's transfer budget is largely
  per-process). Decode is host-CPU-bound: this host has 1 core.
* crops_depleted — the headline loop re-run at the END of the bench,
  after every other series has drained the transfer budget, with the
  measured h2d bandwidth alongside: the throttle-proof artifact.
* large_device_resident — the reference's actual envelope (whisper
  large-v2 + AV-HuBERT-large, bf16) device-resident, via a subprocess.
* train_step — jitted SPMD train step throughput + MFU at the reference
  fine-tuning envelope (scripts/bench_train.py subprocess).

Synthetic AMI-like segments: 10 s audio @16 kHz + 250 frames of 288x352
closeup video per segment (real AMI closeup footage when mounted).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import queue as queue_mod
import subprocess
import sys
import threading
import time

import numpy as np

BASELINE_SEGMENTS_PER_SEC = 1.5

BATCH = int(os.environ.get("AVSL_BENCH_BATCH", "8"))
ITERS = int(os.environ.get("AVSL_BENCH_ITERS", "8"))
MEDIA = os.environ.get("AVSL_BENCH_MEDIA", "on")  # "on" | "off" | "only"
AMI_EXAMPLE = "/root/reference/examples/ami/EN2001a-A-21.39-25.86-video.mp4"
DECODE_TOKENS = int(os.environ.get("AVSL_BENCH_DECODE_TOKENS", "24"))
DETECT_DS = int(os.environ.get("AVSL_BENCH_DETECT_DS", "2"))
AUDIO_SECONDS = 10
VIDEO_FRAMES = 250  # 10 s @ 25 fps
SRC_H, SRC_W = 288, 352  # AMI closeup resolution
# wall-clock budget for the OPTIONAL series (large/train children,
# depleted re-run) — the headline + device series always run
BUDGET_S = float(os.environ.get("AVSL_BENCH_BUDGET_S", "2400"))
# run only the device-resident series and exit (used by the large child)
ONLY = os.environ.get("AVSL_BENCH_ONLY", "")

_T0 = time.time()


def _elapsed() -> float:
    return time.time() - _T0


def log(msg):
    if os.environ.get("AVSL_BENCH_PROFILE"):
        print(f"[t={_elapsed():.0f}s] {msg}", file=sys.stderr, flush=True)


# Stage results stashed as they land, for the wedge watchdog below: a
# single d2h pull on the tunneled backend can block for tens of minutes
# when the channel degrades (observed round 5: a scalar pull wedged
# >27 min in a healthy-looking session, and a fresh process's first pull
# took 110 s then wedged too). A fully-wedged run must still put SOME
# parseable final line on stdout — the round's artifact rides on it.
_PARTIAL: dict = {}
_EMITTED = threading.Event()


def _watchdog_emit() -> None:
    h = _PARTIAL.get("headline")
    result = {
        "metric": "ami_av_segments_per_sec_per_chip",
        "value": round(h["segments_per_sec"], 3) if h else 0.0,
        "unit": "segments/s",
        "vs_baseline": round(
            (h["segments_per_sec"] if h else 0.0) / BASELINE_SEGMENTS_PER_SEC,
            2,
        ),
        "error": "watchdog: wall-clock exceeded mid-run (wedged d2h pull "
                 "or pathological compile); partial results only",
        "bench_wall_s": round(_elapsed(), 1),
    }
    if h:
        result.update(h)
        result["mode"] = "crops"
    for k in ("device_resident", "real_media", "large_device_resident",
              "train_step", "serving", "crops_depleted"):
        if _PARTIAL.get(k) is not None:
            result[k] = _PARTIAL[k]
    _emit(result)
    os._exit(0)


def _arm_watchdog() -> None:
    t = threading.Timer(
        float(os.environ.get("AVSL_BENCH_WATCHDOG_S", str(BUDGET_S + 300))),
        _watchdog_emit,
    )
    t.daemon = True
    t.start()


def _emit(result: dict) -> None:
    """Emit the bench result.

    The driver tail-captures stdout and parses the FINAL line as the
    round's headline JSON; round 4's number was lost because the full
    result (every secondary series inlined) exceeded the tail window and
    got truncated mid-line (VERDICT.md Weak #1). So: the full blob goes
    to bench_full.json + stderr, and the final stdout line is a COMPACT
    headline — metric/value/unit/vs_baseline plus a few small scalars.
    Idempotent: the watchdog and the normal path race to emit exactly
    once.
    """
    if _EMITTED.is_set():
        return
    _EMITTED.set()
    full = json.dumps(result)
    try:
        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench_full.json"
        )
        with open(path, "w") as f:
            f.write(full + "\n")
    except OSError:
        pass
    print(full, file=sys.stderr, flush=True)

    compact = {
        k: result[k]
        for k in ("metric", "value", "unit", "vs_baseline")
        if k in result
    }
    for k in (
        "segments_per_sec_sustained", "iter_median_s", "iters", "mode",
        "model", "param_dtype", "bench_wall_s", "host_crop_median_s",
        "error",
    ):
        if k in result and not isinstance(result[k], (dict, list)):
            compact[k] = result[k]
    # one-scalar summaries of the secondary series (full data in the file)
    for series in (
        "device_resident", "real_media", "large_device_resident",
        "crops_depleted", "serving",
    ):
        v = result.get(series)
        if isinstance(v, dict) and "segments_per_sec" in v:
            compact[f"{series}_segments_per_sec"] = v["segments_per_sec"]
        elif isinstance(v, dict) and "requests_per_sec" in v:
            compact[f"{series}_requests_per_sec"] = v["requests_per_sec"]
    ts = result.get("train_step")
    if isinstance(ts, dict):
        ref = ts.get("reference", ts)
        if isinstance(ref, dict):
            for k in ("mfu", "step_time_s", "segments_per_sec"):
                if k in ref:
                    compact[f"train_{k}"] = ref[k]
    compact["full_result"] = "bench_full.json"
    print(json.dumps(compact), flush=True)


def _series_stats(times, total_s=None, batch=BATCH) -> dict:
    times = np.asarray(times)
    out = {
        "segments_per_sec": round(batch / float(np.median(times)), 3),
        "iter_median_s": round(float(np.median(times)), 4),
        "iter_mean_s": round(float(np.mean(times)), 4),
        "iter_p90_s": round(float(np.percentile(times, 90)), 4),
        "iters": len(times),
    }
    if total_s is not None:
        out["segments_per_sec_sustained"] = round(
            batch * len(times) / total_s, 3
        )
        out["loop_total_s"] = round(total_s, 3)
    return out


def main() -> None:
    # NOTE: deliberately NO jax persistent compilation cache here — on the
    # tunneled backend it never produces a hit (compile options embed
    # session state) but serializing each executable costs minutes.
    if os.environ.get("AVSL_BENCH_CHILD") != "1":
        # parent only: children are already bounded by run_child timeouts
        _arm_watchdog()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __graft_entry__ as ge
    from avsl_tpu.infer.host_crops import HostLipCropper
    from avsl_tpu.kernels import log_mel_spectrogram
    from avsl_tpu.kernels.lip_pipeline import make_staged_lip_frontend

    # AVSL_BENCH_MODEL=micro shrinks the model for fast experiments;
    # =large runs the reference's actual envelope (whisper large-v2 +
    # AV-HuBERT-large dims). Default is whisper-tiny dims + 256-wide AV
    # trunk — the throughput metric is preprocessing-dominated, so model
    # scale barely moves it (large_device_resident carries the large
    # number in the same JSON).
    bench_model = os.environ.get("AVSL_BENCH_MODEL", "")
    model, cfg = ge._flagship(
        dtype="bfloat16", tiny=bench_model == "micro",
        size="large" if bench_model == "large" else "base",
    )
    cast_params_bf16 = (
        os.environ.get(
            "AVSL_BENCH_PARAM_DTYPE",
            "bfloat16" if bench_model == "large" else "float32",
        )
        == "bfloat16"
    )

    # ---- inputs ------------------------------------------------------
    rng = np.random.default_rng(0)
    # int16 PCM is the production wire format; converted on device
    pcm = (rng.normal(size=(BATCH, AUDIO_SECONDS * 16000)) * 3000).astype(
        np.int16
    )
    if os.path.exists(AMI_EXAMPLE):
        # real AMI closeup footage (a real face, real compression), tiled
        # to segment length with a per-segment temporal offset — the
        # detection quality the bench exercises is falsifiable against
        # the golden tests on this same footage (tests/test_host_crops.py)
        from avsl_tpu.data.video_io import read_video_frames

        real = read_video_frames(AMI_EXAMPLE, grayscale=True)
        clips = np.empty((BATCH, VIDEO_FRAMES, SRC_H, SRC_W), np.uint8)
        reps = int(np.ceil(VIDEO_FRAMES / len(real)))
        for b in range(BATCH):
            rolled = np.roll(real, -13 * b, axis=0)
            clips[b] = np.concatenate([rolled] * reps)[:VIDEO_FRAMES]
    else:
        base = rng.integers(40, 200, (SRC_H, SRC_W)).astype(np.float32)
        clips = np.empty((BATCH, VIDEO_FRAMES, SRC_H, SRC_W), np.uint8)
        yy, xx = np.mgrid[0:SRC_H, 0:SRC_W]
        for b in range(BATCH):
            cx, cy = 170 + 10 * b % 40, 140
            for t in range(VIDEO_FRAMES):
                jitter = 6 * np.sin(t / 7 + b)
                face = 80 * np.exp(
                    -(((xx - cx - jitter) / 60.0) ** 2 + ((yy - cy) / 80.0) ** 2)
                )
                clips[b, t] = np.clip(base + face, 0, 255).astype(np.uint8)

    sot = jnp.full((BATCH, 1), 50258, jnp.int32)
    cropper = HostLipCropper(
        mode="track", detect_ds=4, track_ds=2,
        # stride 3 measured at IDENTICAL golden NCC (0.629 vs 0.628 at
        # stride 2 — the 12-frame trajectory smoothing absorbs it) and
        # ~25% less host time (tests/test_host_crops.py pins quality)
        track_stride=int(os.environ.get("AVSL_BENCH_TRACK_STRIDE", "3")),
        emit="88",
    )

    # ---- model state (init ON DEVICE — no parameter upload) -----------
    t0 = time.perf_counter()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((BATCH, cfg.n_mels, AUDIO_SECONDS * 100), jnp.float32),
        sot,
        video=jnp.zeros((BATCH, VIDEO_FRAMES, 88, 88, 1), jnp.float32),
    )
    if cast_params_bf16:
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            variables,
        )
    variables = jax.device_put(variables)
    log(f"init: {time.perf_counter() - t0:.1f}s")

    def _norm_lip(lip_u8):
        lip = lip_u8[..., None].astype(jnp.float32)
        return (lip / 255.0 - 0.421) / 0.165

    @jax.jit
    def encode88(variables, pcm_i16, crops_u8):
        audio = pcm_i16.astype(jnp.float32) / 32768.0
        mel = log_mel_spectrogram(audio, n_mels=cfg.n_mels)
        feats, xv = model.apply(
            variables, mel, _norm_lip(crops_u8), method=model.encode
        )
        return model.apply(
            variables, feats, xv, DECODE_TOKENS + 4,
            method=model.init_decode_cache,
        )

    @jax.jit
    def encode96(variables, pcm_i16, lip96):
        # device-pipeline path: 96 -> center-crop 88 + normalization
        audio = pcm_i16.astype(jnp.float32) / 32768.0
        mel = log_mel_spectrogram(audio, n_mels=cfg.n_mels)
        feats, xv = model.apply(
            variables, mel, _norm_lip(lip96[:, :, 4:92, 4:92]),
            method=model.encode,
        )
        return model.apply(
            variables, feats, xv, DECODE_TOKENS + 4,
            method=model.init_decode_cache,
        )

    @jax.jit
    def step(variables, tok, cache):
        logits, cache = model.apply(
            variables, tok, None, None, cache, method=model.decode
        )
        return jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32), cache

    def decode_tokens(cache):
        tok, toks = sot, []
        for _ in range(DECODE_TOKENS):
            tok, cache = step(variables, tok, cache)
            toks.append(tok)
        return jnp.concatenate(toks, axis=1)

    # the tunnel enforces a multi-tier rate limit — probes are small and
    # every byte they spend comes out of the measured job's budget
    probe_buf = np.ascontiguousarray(clips[0, :80])  # ~8 MB

    def put_bandwidth_mbps() -> float:
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            x = jax.device_put(probe_buf)
            x.block_until_ready()
            best = max(best, probe_buf.nbytes / (time.perf_counter() - t0) / 1e6)
            del x
        return best

    def true_sync(x):
        """Force REAL completion via a tiny d2h pull. On the tunneled
        backend `block_until_ready` can return at dispatch-ack (measured:
        a 34-GFLOP op "completes" in ~30 us with block alone; see
        docs/ENGINEERING_NOTES.md round-3 timing recipe), so every timed
        loop is anchored by a scalar pull at its start and end."""
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(leaf[(0,) * getattr(leaf, "ndim", 0)])
        return x

    def _qget(q, timeout=900.0):
        """Queue get that propagates producer-thread failures: a producer
        pushes its exception instead of dying silently, and the bounded
        timeout turns a dead producer into an error, not a hang."""
        item = q.get(timeout=timeout)
        if isinstance(item, BaseException):
            raise RuntimeError("bench producer thread failed") from item
        return item

    # ==== crops headline loop ==========================================
    def crops_loop(n_iters: int, tag: str) -> dict:
        """Producer thread hosts detection+track+warp; the consumer
        uploads PCM + crops, blocks (no transfer/compute overlap on the
        tunnel), then runs encode+decode. Reports BATCH/median(iter)."""
        q: "queue_mod.Queue" = queue_mod.Queue(maxsize=1)
        host_times = []

        def producer(n):
            try:
                for _ in range(n):
                    th = time.perf_counter()
                    crops_b, _okb = cropper(clips)
                    host_times.append(time.perf_counter() - th)
                    q.put(crops_b)
            except BaseException as e:  # propagate through the queue
                q.put(e)

        threading.Thread(target=producer, args=(n_iters + 1,), daemon=True).start()

        # warm (compiles already done by caller); first item primes the queue
        tw = time.perf_counter()
        crops_b = _qget(q)
        log(f"{tag} warm: q.get {time.perf_counter() - tw:.1f}s")
        tw = time.perf_counter()
        dev = jax.device_put(crops_b)
        pcm_dev = jax.device_put(pcm)
        jax.block_until_ready((dev, pcm_dev))
        log(f"{tag} warm: upload {time.perf_counter() - tw:.1f}s")
        tw = time.perf_counter()
        out = decode_tokens(encode88(variables, pcm_dev, dev))
        out.block_until_ready()
        log(f"{tag} warm: compute {time.perf_counter() - tw:.1f}s")
        tw = time.perf_counter()
        true_sync(out)
        log(f"{tag} warm: true_sync {time.perf_counter() - tw:.1f}s")

        times = []
        t_loop = time.perf_counter()
        for i in range(n_iters):
            ti = time.perf_counter()
            crops_b = _qget(q)
            dev = jax.device_put(crops_b)
            pcm_dev = jax.device_put(pcm)
            # block BEFORE dispatching compute: transfer/compute overlap
            # collapses the tunnel's transfer rate ~20x (measured r3)
            jax.block_until_ready((dev, pcm_dev))
            out = decode_tokens(encode88(variables, pcm_dev, dev))
            out.block_until_ready()
            times.append(time.perf_counter() - ti)
            log(f"{tag} iter{i}: {times[-1]:.3f}s")
        true_sync(out)
        total_s = time.perf_counter() - t_loop
        stats = _series_stats(times, total_s)
        stats["host_crop_median_s"] = round(float(np.median(host_times)), 4)
        stats["upload_mb_per_iter"] = round(
            (crops_b.nbytes + pcm.nbytes) / 1e6, 1
        )
        return stats

    headline = None
    if ONLY != "resident" and MEDIA != "only":
        # compile the crops path first — the headline runs on the
        # freshest transfer budget, before any other series touches the
        # link. Skipped when the headline itself is skipped: the resident
        # child compiles only encode96, the media child compiles encode88
        # in its own warm call — neither should burn minutes (and an
        # 18 MB upload) on this dead path.
        t0 = time.perf_counter()
        crops0, _ok0 = cropper(clips)
        cache0 = encode88(
            variables, jax.device_put(pcm), jax.device_put(crops0)
        )
        out0 = decode_tokens(cache0)
        out0.block_until_ready()
        log(f"crops-path compiles: {time.perf_counter() - t0:.1f}s")

        headline = crops_loop(ITERS, "crops")
        _PARTIAL["headline"] = headline

        # compute share with crops device-resident: isolates upload time
        # so h2d_effective_mbps and the 50 MB/s projection are derivable
        crops_dev = jax.device_put(crops0)
        pcm_dev = jax.device_put(pcm)
        comp_times = []
        co = None
        for i in range(4):
            ti = time.perf_counter()
            co = decode_tokens(encode88(variables, pcm_dev, crops_dev))
            co.block_until_ready()
            comp_times.append(time.perf_counter() - ti)
        true_sync(co)
        compute_s = float(np.median(comp_times))
        headline["compute_median_s"] = round(compute_s, 4)
        xfer_s = headline["iter_median_s"] - max(
            compute_s, headline["host_crop_median_s"]
        )
        if xfer_s > 0.02:
            headline["h2d_effective_mbps"] = round(
                headline["upload_mb_per_iter"] / xfer_s, 1
            )
        # pipelined iteration model: iter = max(host, upload + compute).
        # At a fully-depleted 50 MB/s link:
        proj = BATCH / max(
            headline["host_crop_median_s"],
            headline["upload_mb_per_iter"] / 50.0 + compute_s,
        )
        headline["projected_segments_per_sec_at_50mbps"] = round(proj, 2)

    # ==== device-resident full-pipeline series =========================
    # detection -> NCC track -> closed-form warp -> encode -> decode, all
    # on device, inputs uploaded once: per-batch compute independent of
    # the tunnel's transfer-budget state.
    device_series = None
    if os.environ.get("AVSL_BENCH_DEVICE_SERIES", "1") == "1" and MEDIA != "only":
        stages = make_staged_lip_frontend(VIDEO_FRAMES, detect_ds=DETECT_DS)
        j_sub = jax.jit(stages["subsample"])
        j_traj = jax.jit(lambda s: stages["traj"](s))
        j_track = jax.jit(
            lambda s, tr, fw, ok: stages["track_refine_parallel"](s, tr, fw, ok)
        )
        j_coords = jax.jit(stages["coords_from_traj"])
        j_sample = jax.jit(stages["sample"])
        track_on = os.environ.get("AVSL_BENCH_TRACK", "1") == "1"

        clips_dev = jnp.stack([jax.device_put(np.ascontiguousarray(c)) for c in clips])
        pcm_dev = jax.device_put(pcm)
        jax.block_until_ready((clips_dev, pcm_dev))

        def run_resident(salt=np.uint8(255)):
            # per-iter salt keeps successive calls distinct computations —
            # repeated IDENTICAL RPCs can be served from cache by the
            # tunnel (docs/ENGINEERING_NOTES.md recipe)
            c = clips_dev.at[0, 0, 0, 0].set(salt)
            small = j_sub(c)
            tr, fw, ok = j_traj(small)
            if track_on:
                tr, fw, ok = j_track(small, tr, fw, ok)
            lip96 = j_sample(c, *j_coords(tr, fw))
            return decode_tokens(encode96(variables, pcm_dev, lip96))

        t0 = time.perf_counter()
        true_sync(run_resident())  # compiles
        log(f"device-pipeline compiles: {time.perf_counter() - t0:.1f}s")
        series = []
        ro = None
        t_loop = time.perf_counter()
        for i in range(max(20, ITERS)):
            ti = time.perf_counter()
            ro = run_resident(np.uint8(i % 251))
            ro.block_until_ready()
            series.append(time.perf_counter() - ti)
            log(f"resident iter{i}: {series[-1]:.3f}s")
        true_sync(ro)
        device_series = _series_stats(series, time.perf_counter() - t_loop)
        _PARTIAL["device_resident"] = device_series

    # ==== real-media loop (this process IS the media child) ============
    real_media = None
    if MEDIA == "only":
        import tempfile

        from avsl_tpu.data.media_native import decode_video_batch
        from avsl_tpu.data.video_io import write_video_frames

        media_dir = tempfile.mkdtemp(prefix="avsl_bench_media_")
        # codec honesty: this environment ships NO h264 encoder, so the
        # segments are written as mp4v; the real h264 AMI clip decodes
        # ~2.8x slower on this host — see README perf table caveats
        seg_paths = [
            write_video_frames(
                os.path.join(media_dir, f"seg{b}.mp4"), clips[b], fps=25
            )
            for b in range(BATCH)
        ]
        n_media = min(6, ITERS)
        decode_fps = []
        host_crop_s = []
        mq: "queue_mod.Queue" = queue_mod.Queue(maxsize=1)

        def media_producer(n):
            # decode + host crops on the producer thread (pure host work,
            # GIL released in C++/cv2); uploads stay on the consumer
            try:
                for _ in range(n):
                    td = time.perf_counter()
                    arena, counts = decode_video_batch(
                        seg_paths, (SRC_W, SRC_H), VIDEO_FRAMES
                    )
                    decode_fps.append(counts.sum() / (time.perf_counter() - td))
                    th = time.perf_counter()
                    crops_b, _ = cropper(arena)
                    host_crop_s.append(time.perf_counter() - th)
                    mq.put(crops_b)
            except BaseException as e:  # propagate through the queue
                mq.put(e)

        threading.Thread(
            target=media_producer, args=(n_media + 1,), daemon=True
        ).start()

        pcm_dev = jax.device_put(pcm)

        def media_iter():
            crops_b = _qget(mq)
            dev = jax.device_put(crops_b)
            jax.block_until_ready(dev)
            return decode_tokens(encode88(variables, pcm_dev, dev))

        true_sync(media_iter())  # warm
        media_times = []
        mo = None
        t_loop = time.perf_counter()
        for i in range(n_media):
            ti = time.perf_counter()
            mo = media_iter()
            mo.block_until_ready()
            media_times.append(time.perf_counter() - ti)
            log(f"media iter{i}: {media_times[-1]:.3f}s")
        true_sync(mo)
        real_media = _series_stats(media_times, time.perf_counter() - t_loop)
        _PARTIAL["real_media"] = real_media
        real_media["media_seconds_per_sec"] = round(
            real_media["segments_per_sec"] * AUDIO_SECONDS, 1
        )
        real_media["decode_fps_host"] = round(float(np.median(decode_fps)), 0)
        real_media["host_crop_median_s"] = round(
            float(np.median(host_crop_s)), 4
        )
        real_media["host_cores"] = os.cpu_count()

    # ==== children (fresh subprocesses: per-process transfer budget) ====
    def run_child(env_extra: dict, argv=None, timeout=1500, tag="child"):
        env = dict(os.environ, **env_extra)
        try:
            proc = subprocess.run(
                argv or [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=timeout,
            )
            if os.environ.get("AVSL_BENCH_PROFILE"):
                sys.stderr.write(proc.stderr[-4000:])
            for line in reversed(proc.stdout.strip().splitlines()):
                if line.startswith("{"):
                    return json.loads(line)
            return {"error": f"{tag}: no JSON (rc={proc.returncode})"}
        except subprocess.TimeoutExpired:
            return {"error": f"{tag}: timeout"}
        except Exception as e:  # pragma: no cover
            return {"error": f"{tag}: {e}"}

    is_child = os.environ.get("AVSL_BENCH_CHILD") == "1"
    child_env = {"AVSL_BENCH_CHILD": "1"}

    if MEDIA == "on" and not is_child and ONLY != "resident":
        res = run_child(
            dict(child_env, AVSL_BENCH_MEDIA="only"), tag="media"
        )
        real_media = res.get("real_media", res if "error" in res else None)
        _PARTIAL["real_media"] = real_media

    large_resident = None
    if (
        not is_child and ONLY != "resident" and MEDIA != "only"
        and bench_model != "large"
        and os.environ.get("AVSL_BENCH_LARGE", "1") == "1"
        and _elapsed() < BUDGET_S - 600
    ):
        res = run_child(
            dict(child_env, AVSL_BENCH_MODEL="large",
                 AVSL_BENCH_ONLY="resident", AVSL_BENCH_MEDIA="off"),
            tag="large", timeout=1800,
        )
        large_resident = res.get(
            "device_resident", res if "error" in res else None
        )
        _PARTIAL["large_device_resident"] = large_resident

    train_step = None
    if (
        not is_child and ONLY != "resident" and MEDIA != "only"
        and os.environ.get("AVSL_BENCH_TRAIN", "1") == "1"
        and _elapsed() < BUDGET_S - 300
    ):
        train_script = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "scripts", "bench_train.py",
        )
        # reference envelope only by default (the throughput variant is a
        # second full compile of the same giant program)
        t_env = dict(
            child_env,
            AVSL_BENCH_TRAIN_ENVELOPES=os.environ.get(
                "AVSL_BENCH_TRAIN_ENVELOPES", "reference"
            ),
        )
        train_step = run_child(
            t_env, argv=[sys.executable, train_script],
            tag="train",
            timeout=float(os.environ.get("AVSL_BENCH_TRAIN_TIMEOUT", "1500")),
        )
        if "error" in train_step and os.environ.get(
            "AVSL_BENCH_TRAIN_FALLBACK", "1"
        ) == "1":
            # large-v2 compile exceeded the budget on this backend: still
            # land a REAL train-step artifact at tiny dims, with the
            # large attempt's error kept alongside
            err = train_step
            small = run_child(
                dict(t_env, AVSL_BENCH_TRAIN_MODEL="tiny"),
                argv=[sys.executable, train_script],
                tag="train-tiny", timeout=900,
            )
            train_step = {"large_v2": err, "fallback_tiny": small}

    _PARTIAL["train_step"] = train_step

    # ==== serving under sustained load (CPU child: batching/scheduler
    # layer regression anchor — does not touch the TPU, so it cannot
    # disturb the depleted re-run's transfer budget) =====================
    serving = None
    if (
        not is_child and ONLY != "resident" and MEDIA != "only"
        and os.environ.get("AVSL_BENCH_SERVING", "1") == "1"
        and _elapsed() < BUDGET_S - 120
    ):
        serving_script = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "scripts", "bench_serving.py",
        )
        serving = run_child(
            child_env,
            argv=[sys.executable, serving_script, "--device", "cpu",
                  "--clients", "8", "--requests", "32",
                  "--batch_size", "8"],
            tag="serving", timeout=600,
        )
        if "value" in serving:
            serving["requests_per_sec"] = serving.pop("value")
        _PARTIAL["serving"] = serving

    # ==== depleted re-run: the throttle-proof artifact ==================
    # always runs (costs ~40 s) — this is the evidence the headline
    # survives the drained link tier, and it must not fall off the end
    # when an expensive child ate the wall-clock budget
    crops_depleted = None
    if (
        headline is not None and not is_child
        and os.environ.get("AVSL_BENCH_DEPLETED", "1") == "1"
    ):
        bw = put_bandwidth_mbps()
        crops_depleted = crops_loop(4, "crops-depleted")
        _PARTIAL["crops_depleted"] = crops_depleted
        crops_depleted["h2d_probe_mbps_before"] = round(bw, 1)

    # ==== assemble ======================================================
    if ONLY == "resident":
        result = {
            "metric": "device_resident_segments_per_sec",
            "value": (device_series or {}).get("segments_per_sec", 0.0),
            "unit": "segments/s",
            "vs_baseline": round(
                (device_series or {}).get("segments_per_sec", 0.0)
                / BASELINE_SEGMENTS_PER_SEC, 2,
            ),
            "model": bench_model or "base",
            "device_resident": device_series,
        }
        _emit(result)
        return
    if MEDIA == "only":
        result = {
            "metric": "real_media_segments_per_sec",
            "value": (real_media or {}).get("segments_per_sec", 0.0),
            "unit": "segments/s",
            "vs_baseline": round(
                (real_media or {}).get("segments_per_sec", 0.0)
                / BASELINE_SEGMENTS_PER_SEC, 2,
            ),
            "real_media": real_media,
        }
        _emit(result)
        return

    segments_per_sec = headline["segments_per_sec"]
    result = {
        "metric": "ami_av_segments_per_sec_per_chip",
        "value": round(segments_per_sec, 3),
        "unit": "segments/s",
        "vs_baseline": round(segments_per_sec / BASELINE_SEGMENTS_PER_SEC, 2),
        **headline,
        "basis": "median_iter",
        "mode": "crops",
        "model": bench_model or "base",
        "param_dtype": "bfloat16" if cast_params_bf16 else "float32",
        "bench_wall_s": round(_elapsed(), 1),
    }
    if device_series is not None:
        result["device_resident"] = device_series
    if real_media is not None:
        result["real_media"] = real_media
    if large_resident is not None:
        result["large_device_resident"] = large_resident
    if train_step is not None:
        result["train_step"] = train_step
    if serving is not None:
        result["serving"] = serving
    if crops_depleted is not None:
        result["crops_depleted"] = crops_depleted
    _emit(result)


def _backend_available(timeout_s: float) -> bool:
    """Probe backend init in a SUBPROCESS with a hard timeout. Observed
    tunnel outage mode (docs/ENGINEERING_NOTES.md): `jax.devices()` itself
    hangs for minutes, then fails with `Unable to initialize backend
    'axon'` — an in-process probe cannot be timed out, a child can."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices(); print('ok')"],
            timeout=timeout_s, capture_output=True, text=True,
        )
        return r.returncode == 0 and "ok" in r.stdout
    except Exception:
        return False


def _backend_available_with_retry() -> bool:
    """The outage flaps (docs/ENGINEERING_NOTES.md): a failed probe now
    does not mean a failed probe in three minutes, and the round's ONLY
    bench artifact rides on this. Retry a bounded number of times before
    declaring the backend down."""
    timeout_s = float(os.environ.get("AVSL_BENCH_BACKEND_TIMEOUT", "240"))
    retries = int(os.environ.get("AVSL_BENCH_BACKEND_RETRIES", "3"))
    wait_s = float(os.environ.get("AVSL_BENCH_BACKEND_RETRY_WAIT", "150"))
    for attempt in range(retries):
        if _backend_available(timeout_s):
            return True
        print(
            f"bench: backend probe {attempt + 1}/{retries} failed "
            f"(timeout {timeout_s:.0f}s)"
            + (f"; retrying in {wait_s:.0f}s" if attempt + 1 < retries else ""),
            file=sys.stderr,
        )
        if attempt + 1 < retries:
            time.sleep(wait_s)
    return False


if __name__ == "__main__":
    plat = os.environ.get("JAX_PLATFORMS", "")
    if (
        plat and plat != "cpu"
        and os.environ.get("AVSL_BENCH_CHILD") != "1"
        and not _backend_available_with_retry()
    ):
        # honest failure artifact instead of an indefinite hang: the
        # driver records THIS line; value 0 marks the run invalid
        print(json.dumps({
            "metric": "segments_per_sec_per_chip",
            "value": 0.0,
            "unit": "segments/s",
            "vs_baseline": 0.0,
            "error": "tpu_backend_unavailable: jax.devices() hung or "
                     "failed in a probe subprocess (axon outage mode, "
                     "docs/ENGINEERING_NOTES.md)",
        }))
        sys.exit(0)
    main()
