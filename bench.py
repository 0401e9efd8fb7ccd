"""Benchmark: AMI AV segments/sec/chip (preprocess + encode + decode).

Measures the fused on-device pipeline on one TPU chip: Whisper log-mel
front end -> Whisper(+Flamingo gated x-attn) audio encoder + AV-HuBERT
video encoder -> KV-cached greedy decode, over synthetic AMI-like
segments (10 s audio @16 kHz + 250 frames of 88x88 grayscale lip clip).

Baseline: the reference pipeline's published preprocess+inference
bottleneck is ~1-2 segments/sec (lip-ROI extraction on a GPU node,
/root/reference docs/preprocess/LAUGHTER_DATASET_INFO.md:110; BASELINE.md).
We report vs_baseline against 1.5 seg/s.

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


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __graft_entry__ as ge
    from avsl_tpu.decode import greedy_decode
    from avsl_tpu.kernels import log_mel_spectrogram

    model, cfg = ge._flagship(dtype="bfloat16")

    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.normal(size=(BATCH, AUDIO_SECONDS * 16000)).astype(np.float32) * 0.1
    )
    video = jnp.asarray(
        rng.normal(size=(BATCH, VIDEO_FRAMES, 88, 88, 1)).astype(np.float32)
    )
    sot = jnp.full((BATCH, 1), 50258, jnp.int32)

    # jit the init so parameter initialization is one compiled program
    mel_example = jnp.zeros((BATCH, cfg.n_mels, AUDIO_SECONDS * 100), jnp.float32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), mel_example, sot, video=video
    )

    @jax.jit
    def pipeline(audio, video, sot):
        mel = log_mel_spectrogram(audio, n_mels=cfg.n_mels)
        feats, xv = model.apply(variables, mel, video, method=model.encode)
        cache = model.apply(
            variables, feats, xv, DECODE_TOKENS + 4, method=model.init_decode_cache
        )

        def step(tok, cache):
            return model.apply(
                variables, tok, None, None, cache, method=model.decode
            )

        return greedy_decode(step, cache, sot, DECODE_TOKENS, eot_id=50257)

    # warmup / compile
    out = pipeline(audio, video, sot)
    out.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = pipeline(audio, video, sot)
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
