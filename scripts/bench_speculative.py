"""Measure speculative decoding (decode/speculative.py) on the decode
hot path: wall-clock tokens/s of plain greedy vs draft-verify
speculation at the serving envelope.

Method (tunnel-safe; same anchors as scripts/bench_int8_decode.py):

* Target (Whisper[+Flamingo] at --size dims) and draft (whisper-tiny
  dims by default) are initialized ON DEVICE — no h2d upload.
* A draft is DISTILLED on the bench batch first (train/distill.py,
  labels computed once, draft overfits them), so the measured acceptance
  is a real number produced by the real machinery — but an OVERFIT UPPER
  BOUND for this synthetic corpus; production acceptance comes from
  distilling on real traffic. The JSON reports the acceptance alongside
  the speedup so the operating point is explicit.
* EOT is set to an id the models never emit, so greedy runs exactly
  max_new steps; per-token time is the difference of a long and a short
  budget (RTT, encode, and cache-init cancel).
* true_sync anchors every timed region with a scalar d2h pull; a salt
  token varies each call (tunnel RPC dedup).

Run standalone on the TPU (never concurrently with another TPU process):
    python scripts/bench_speculative.py [--size base] [--distill_steps 150]
Prints one JSON line: greedy/spec per-token ms, acceptance, speedup.
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
    p.add_argument("--size", default="base", choices=["base", "large"])
    p.add_argument("--draft", default="tiny", help="draft preset (or 'test')")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--n_short", type=int, default=24)
    p.add_argument("--n_long", type=int, default=72)
    p.add_argument("--spec_k", type=int, default=4)
    p.add_argument("--distill_steps", type=int, default=150)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--secs", type=int, default=10,
                   help="audio length (use 1 with --draft test: its audio ctx is 64 frames)")
    args = p.parse_args()

    if os.environ.get("AVSL_FORCE_CPU") == "1":
        os.environ.pop("JAX_PLATFORMS", None)
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import optax

    import __graft_entry__ as ge
    from avsl_tpu.decode import greedy_decode, speculative_greedy_decode
    from avsl_tpu.models.factory import build_whisper_flamingo
    from avsl_tpu.train.distill import make_distill_step, make_label_fn
    from avsl_tpu.train.loop import TrainState

    target, t_cfg = ge._flagship(dtype="bfloat16", size=args.size)
    draft, d_cfg = build_whisper_flamingo(
        args.draft, vocab_size=t_cfg.n_vocab, add_gated_x_attn=False,
        dtype="bfloat16",
    )
    B, k = args.batch, args.spec_k
    sr, secs = 16000, args.secs
    audio = jnp.asarray(
        0.1 * np.random.default_rng(0).standard_normal((B, sr * secs)),
        jnp.float32,
    )
    prompt0 = np.tile(np.asarray([[1, 2, 3]], np.int32), (B, 1))
    eot_never = t_cfg.n_vocab - 1  # random models effectively never emit it
    max_len = prompt0.shape[1] + args.n_long + k + 2

    def on_device_init(model, cfg, seed, with_video):
        @jax.jit
        def init(rng):
            kw = {}
            if with_video:
                kw["video"] = jnp.zeros((1, 8, 88, 88, 1), jnp.float32)
            v = model.init(
                rng,
                jnp.zeros((1, cfg.n_mels, secs * 100), jnp.float32),
                jnp.zeros((1, 1), jnp.int32),
                **kw,
            )
            return jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32
                else x,
                v,
            )

        return init(jax.random.PRNGKey(seed))

    t0 = time.perf_counter()
    t_vars = on_device_init(target, t_cfg, 0, bool(t_cfg.add_gated_x_attn))
    d_vars = on_device_init(draft, d_cfg, 1, False)
    jax.block_until_ready((t_vars, d_vars))
    print(f"init: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # ---- distill the draft on this batch (labels once, then overfit).
    # The timed programs salt the first prompt token through 3 values
    # (tunnel RPC dedup), so labels cover ALL 3 salted prompt variants —
    # otherwise every timed call runs a trajectory the draft never saw
    # and acceptance collapses to 0.
    t0 = time.perf_counter()
    label_fn = make_label_fn(target, t_vars, args.n_long, eot_never)
    label_sets = []
    for s in range(3):
        pr = np.array(prompt0)
        pr[:, 0] = 1 + s
        label_sets.append(label_fn(audio, jnp.asarray(pr)))
    jax.block_until_ready(label_sets)
    tx = optax.adamw(3e-3, weight_decay=0.0)
    state = TrainState.create(
        d_vars["params"], tx, batch_stats=d_vars.get("batch_stats")
    )
    step_fn = make_distill_step(draft, tx, hard_weight=0.5)
    agrees = [0.0, 0.0, 0.0]
    for i in range(args.distill_steps):
        tokens, t_logprob, valid = label_sets[i % 3]
        state, metrics = step_fn(state, audio, tokens, t_logprob, valid)
        agrees[i % 3] = float(metrics["agree"])
    agree = float(np.mean(agrees)) if args.distill_steps >= 3 else 0.0
    d_vars = {"params": state.params}
    if state.batch_stats is not None:
        d_vars["batch_stats"] = state.batch_stats
    print(f"distill({args.distill_steps} steps): "
          f"{time.perf_counter() - t0:.1f}s agree={agree:.3f}", file=sys.stderr)

    # ---- precompute encoder features on device (shared by all programs)
    from avsl_tpu.kernels import log_mel_spectrogram

    @jax.jit
    def enc(a):
        t_mel = log_mel_spectrogram(a, n_mels=t_cfg.n_mels)
        feats, _ = target.apply(t_vars, t_mel, None, method=target.encode)
        d_mel = log_mel_spectrogram(a, n_mels=d_cfg.n_mels)
        dfeats, _ = draft.apply(d_vars, d_mel, None, method=draft.encode)
        return feats, dfeats

    feats, dfeats = jax.block_until_ready(enc(audio))

    def greedy_prog(n):
        @jax.jit
        def run(salt):
            prompt = jnp.asarray(prompt0).at[:, 0].set(1 + salt % 3)
            cache = target.apply(
                t_vars, feats, None, max_len, method=target.init_decode_cache
            )

            def st(t, c):
                return target.apply(t_vars, t, None, None, c, method=target.decode)

            return greedy_decode(st, cache, prompt, n, eot_never)

        return run

    def spec_prog(n):
        @jax.jit
        def run(salt):
            prompt = jnp.asarray(prompt0).at[:, 0].set(1 + salt % 3)
            tc = target.apply(
                t_vars, feats, None, max_len, method=target.init_decode_cache
            )
            dc = draft.apply(
                d_vars, dfeats, None, max_len, method=draft.init_decode_cache
            )

            def st(t, c):
                return target.apply(t_vars, t, None, None, c, method=target.decode)

            def sd(t, c):
                return draft.apply(d_vars, t, None, None, c, method=draft.decode)

            res = speculative_greedy_decode(
                st, sd, tc, dc, prompt, n, eot_never, k=k
            )
            return res.tokens, res.accept_rate, res.rounds

        return run

    progs = {
        "greedy": {n: greedy_prog(n) for n in (args.n_short, args.n_long)},
        "spec": {n: spec_prog(n) for n in (args.n_short, args.n_long)},
    }

    results = {}
    accept = rounds = None
    salt = 0
    for name, by_n in progs.items():
        for n, fn in by_n.items():
            t0 = time.perf_counter()
            true_sync(fn(salt)); salt += 1  # compile
            print(f"compile[{name}/{n}]: {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr)
        per_tok = []
        for r in range(args.repeats):
            ts = {}
            for n, fn in by_n.items():
                t0 = time.perf_counter()
                out = fn(salt); salt += 1
                true_sync(out)
                ts[n] = time.perf_counter() - t0
                if name == "spec" and n == args.n_long:
                    accept = float(out[1])
                    rounds = int(out[2])
            per_tok.append(
                (ts[args.n_long] - ts[args.n_short])
                / (args.n_long - args.n_short) * 1e3
            )
            print(f"{name} r{r}: short={ts[args.n_short]:.3f}s "
                  f"long={ts[args.n_long]:.3f}s per-tok={per_tok[-1]:.2f} ms",
                  file=sys.stderr)
        results[name] = float(np.median(per_tok))

    print(json.dumps({
        "metric": "speculative_decode_speedup_vs_greedy",
        "size": args.size, "draft": args.draft, "batch": B, "k": k,
        "greedy_per_token_ms": round(results["greedy"], 3),
        "spec_per_token_ms": round(results["spec"], 3),
        "speedup": round(results["greedy"] / max(results["spec"], 1e-9), 3),
        "accept_rate": round(accept or 0.0, 3),
        "verify_rounds_long": rounds,
        "distill_agree": round(agree, 3),
        "note": "acceptance is an overfit upper bound on this synthetic "
                "corpus; production drafts distill on real traffic",
    }))


if __name__ == "__main__":
    main()
