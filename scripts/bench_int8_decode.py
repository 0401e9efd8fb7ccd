"""Measure the weight-only int8 serving win on the autoregressive
decode hot path (models/quant.py) at the reference's large envelope.

The claim to quantify (docs/SERVING.md): the KV-cached decode loop
re-reads every decoder weight once per token, so it is HBM-bandwidth
bound and halving the resident weight bytes (bf16 -> int8, dequantized
inside the jit) is worth up to 2x per step.

Method (tunnel-safe, see docs/ENGINEERING_NOTES.md timing recipe):

* Parameters are CREATED ON DEVICE (jit model.init + in-jit bf16 cast)
  — zero h2d upload, so the measurement doesn't depend on the tunnel's
  transfer-budget state.
* `block_until_ready` can return at dispatch-ack on this backend, so
  each timed loop is anchored by a scalar d2h pull (true_sync) at both
  ends, and the per-step time is the DIFFERENCE of two loop lengths
  (K_long - K_short tokens) so RTT and anchor cost cancel.
* A per-call salt token keeps successive loops distinct computations
  (identical RPCs can be served from cache by the tunnel).

Run standalone on the TPU (never concurrently with another TPU
process):  python scripts/bench_int8_decode.py [--size large]
Prints one JSON line with bf16/int8 per-token step times and the ratio.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def true_sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf[(0,) * getattr(leaf, "ndim", 0)])
    return x


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="large", choices=["base", "large"])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--k_short", type=int, default=8)
    p.add_argument("--k_long", type=int, default=32)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument(
        "--kv_int8", action="store_true",
        help="also measure the int8 KV-cache variants (quantize_kv_cache "
        "on the precomputed cross/xv K/V): bf16+kv8 and int8+kv8 rows",
    )
    args = p.parse_args()

    if os.environ.get("AVSL_FORCE_CPU") == "1":
        # the ambient JAX_PLATFORMS=axon pin wins over an env override —
        # a "CPU sanity" run without this knob silently burns TPU budget
        os.environ.pop("JAX_PLATFORMS", None)
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from avsl_tpu.models.quant import (
        dequantize_tree,
        quantize_kv_cache,
        quantize_tree,
        tree_bytes,
    )

    model, cfg = ge._flagship(dtype="bfloat16", size=args.size)
    B = args.batch
    t_mel = 1000  # 10 s
    t_vid = 250
    max_len = args.k_long + 4

    t0 = time.perf_counter()

    @jax.jit
    def init_bf16(rng):
        v = model.init(
            rng,
            jnp.zeros((1, cfg.n_mels, t_mel), jnp.float32),
            jnp.zeros((1, 1), jnp.int32),
            video=jnp.zeros((1, 8, 88, 88, 1), jnp.float32),
        )
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            v,
        )

    variables = init_bf16(jax.random.PRNGKey(0))
    jax.block_until_ready(variables)
    print(f"init(bf16, on-device): {time.perf_counter() - t0:.1f}s "
          f"{tree_bytes(variables) / 1e9:.2f} GB", file=sys.stderr)

    t0 = time.perf_counter()
    qvariables = jax.jit(quantize_tree)(variables)
    jax.block_until_ready(qvariables)
    print(f"quantize(on-device): {time.perf_counter() - t0:.1f}s "
          f"{tree_bytes(qvariables) / 1e9:.2f} GB", file=sys.stderr)

    # decode-only state: fabricated encoder features (content is
    # irrelevant for step latency; shapes match the 10 s envelope)
    # xv is the POST-projection video stream (video_projection maps
    # video_state -> n_text_state inside encode; models/whisper.py:239)
    n_audio_ctx = cfg.n_audio_ctx
    feats = jnp.zeros((B, n_audio_ctx, cfg.n_audio_state), jnp.bfloat16)
    xv = jnp.zeros((B, t_vid, cfg.n_text_state), jnp.bfloat16)

    @jax.jit
    def make_cache(v):
        return model.apply(v, feats, xv, max_len, method=model.init_decode_cache)

    @jax.jit
    def make_cache_q(qv):
        return model.apply(
            dequantize_tree(qv), feats, xv, max_len,
            method=model.init_decode_cache,
        )

    @jax.jit
    def step_bf16(v, tok, cache):
        logits, cache = model.apply(v, tok, None, None, cache, method=model.decode)
        return jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32), cache

    @jax.jit
    def step_int8(qv, tok, cache):
        v = dequantize_tree(qv)
        logits, cache = model.apply(v, tok, None, None, cache, method=model.decode)
        return jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32), cache

    cache0_b = make_cache(variables)
    cache0_q = make_cache_q(qvariables)
    jax.block_until_ready((cache0_b, cache0_q))
    if args.kv_int8:
        # compress the static cross/xv K/V on device (one jitted pass);
        # the int8 buffers are then the resident form the step programs
        # re-read per token
        compress = jax.jit(quantize_kv_cache)
        cache0_b8 = compress(cache0_b)
        cache0_q8 = compress(cache0_q)
        jax.block_until_ready((cache0_b8, cache0_q8))
        print(
            f"kv cache: {tree_bytes(cache0_b) / 1e9:.2f} GB -> "
            f"{tree_bytes(cache0_b8) / 1e9:.2f} GB int8",
            file=sys.stderr,
        )

    def loop(step, v, cache0, k, salt):
        tok = jnp.full((B, 1), 50257 + (salt % 3), jnp.int32)
        true_sync(tok)
        t0 = time.perf_counter()
        cache = cache0
        for _ in range(k):
            tok, cache = step(v, tok, cache)
        true_sync(tok)
        return time.perf_counter() - t0

    rows = [
        ("bf16", step_bf16, variables, cache0_b),
        ("int8", step_int8, qvariables, cache0_q),
    ]
    if args.kv_int8:
        rows += [
            ("bf16+kv8", step_bf16, variables, cache0_b8),
            ("int8+kv8", step_int8, qvariables, cache0_q8),
        ]
    results = {}
    for name, step, v, cache0 in rows:
        t0 = time.perf_counter()
        loop(step, v, cache0, 2, salt=0)  # compile
        print(f"compile[{name}]: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
        per_tok = []
        for r in range(args.repeats):
            t_short = loop(step, v, cache0, args.k_short, salt=r + 1)
            t_long = loop(step, v, cache0, args.k_long, salt=r + 1)
            per_tok.append((t_long - t_short) / (args.k_long - args.k_short))
            print(f"{name} r{r}: short={t_short:.3f}s long={t_long:.3f}s "
                  f"per-tok={1e3 * per_tok[-1]:.2f} ms", file=sys.stderr)
        results[name] = {
            "per_token_ms": round(1e3 * float(np.median(per_tok)), 3),
            "weight_gb": round(tree_bytes(v) / 1e9, 3),
        }

    speedup = results["bf16"]["per_token_ms"] / max(
        results["int8"]["per_token_ms"], 1e-9
    )
    print(json.dumps({
        "metric": "int8_decode_speedup_vs_bf16",
        "size": args.size,
        "batch": B,
        **results,
        "speedup": round(speedup, 3),
    }))


if __name__ == "__main__":
    main()
