"""Attribute the large-v2 train step's time to its components.

The reference-envelope step (batch 1 x accum 16, 10 s segments) measures
~0.76 s => ~47 ms per micro-segment at 22.5% MFU (BENCH_r04). Remat
policy is irrelevant (frozen towers run forward-only; the decoder is not
remat'd) — so the question is per-op efficiency. This script times each
component as its own jitted program at the SAME shapes:

  * whisper encoder forward (mel [1,80,1000])
  * AV-HuBERT video tower forward ([1,250,88,88])
  * decoder forward (teacher-forced, 120 tokens, incl. gated x-attn)
  * full loss forward
  * full loss forward+backward (trainable subtree only)
  * optimizer apply alone
  * a reference chained GEMM at encoder shapes (practical MXU ceiling)

plus each program's XLA cost-analysis FLOPs => achieved FLOP/s per
component. Prints one JSON line.

Sync discipline: on the tunneled axon backend `block_until_ready` acks
dispatch, NOT completion (round-4/5 finding — it "measured" 9259 TFLOP/s
on a 197 TFLOP/s chip). Every timed program therefore RETURNS ONE f32
SCALAR (sum over its real outputs) and each timed iteration ends with a
4-byte float() d2h pull, which cannot complete before the compute does.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _scalarize(out):
    """Reduce an arbitrary output tree to one f32 scalar on device."""
    import jax
    import jax.numpy as jnp

    tot = jnp.float32(0)
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.number):
            tot = tot + jnp.sum(leaf.astype(jnp.float32))
    return tot


def _time(fn, *args, iters=5):
    """Median wall time of fn(*args) -> scalar, synced by float() pull."""
    float(fn(*args))  # compile + d2h channel warm-up
    float(fn(*args))  # one more: first pull after a compile can drain
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _flops(jfn, *args):
    try:
        c = jfn.lower(*args).compile()
        ca = c.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) if ca else 0.0
    except Exception:
        return 0.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from avsl_tpu.models.factory import build_whisper_flamingo
    from avsl_tpu.train.objectives import flamingo_loss_fn
    from avsl_tpu.train.optim import select_optimizer

    model_name = os.environ.get("AVSL_PROFILE_MODEL", "large-v2")
    seconds, label_len = (10, 120) if model_name != "test" else (1, 16)
    model, cfg = build_whisper_flamingo(
        model_name, add_gated_x_attn=1, dtype="bfloat16", remat=True
    )
    t_mel, t_vid = seconds * 100, seconds * 25

    mel = jnp.zeros((1, cfg.n_mels, t_mel), jnp.float32)
    video = jnp.zeros((1, t_vid, 88, 88), jnp.bfloat16)
    dec = jnp.zeros((1, label_len), jnp.int32)
    labels = jnp.zeros((1, label_len), jnp.int32)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), mel, dec, video=video)
    variables = dict(variables)
    variables["params"] = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        variables["params"],
    )
    variables = jax.device_put(variables)
    jax.block_until_ready(variables)
    print("init done", file=sys.stderr, flush=True)

    results = {"model": model_name}

    # --- component programs (each returns ONE f32 scalar) ---------------
    @jax.jit
    def encode_full(v, mel, video):
        return _scalarize(model.apply(v, mel, video, deterministic=True,
                                      method=model.encode))

    @jax.jit
    def encode_audio(v, mel):
        return _scalarize(model.apply(v, mel, None, deterministic=True,
                                      method=model.encode))

    @jax.jit
    def decode_tf(v, dec, feats, xv):
        logits, _ = model.apply(v, dec, feats, xv=xv, deterministic=True,
                                method=model.decode)
        return _scalarize(logits)

    @jax.jit
    def feats_only(v, mel, video):
        feats, xv = model.apply(v, mel, video, deterministic=True,
                                method=model.encode)
        return feats, xv

    feats, xv = feats_only(variables, mel, video)
    jax.block_until_ready((feats, xv))

    loss_fn = flamingo_loss_fn(model, train=True)
    batch = {"input_ids": mel, "dec_input_ids": dec, "labels": labels,
             "video": video}

    class _Cfg:
        learning_rate = 1e-5
        warmup_steps = 2
        weight_decay = 0.01
        adam_epsilon = 1e-8
        add_gated_x_attn = 1
        video_projection_train_only = False
        freeze_video_model = True

    tx, labels_tree = select_optimizer(variables["params"], _Cfg(), t_total=100)
    train_mask = jax.tree_util.tree_map(lambda l: l == "train", labels_tree)

    def split(params):
        trainable = jax.tree_util.tree_map(
            lambda p, m: p if m else None, params, train_mask,
            is_leaf=lambda x: x is None,
        )
        frozen = jax.tree_util.tree_map(
            lambda p, m: None if m else p, params, train_mask,
            is_leaf=lambda x: x is None,
        )
        return trainable, frozen

    def merge(trainable, frozen):
        return jax.tree_util.tree_map(
            lambda t, f: t if f is None else f, trainable, frozen,
            is_leaf=lambda x: x is None,
        )

    trainable0, frozen0 = split(variables["params"])

    @jax.jit
    def loss_fwd(v, batch):
        out = loss_fn(v["params"], v, batch, jax.random.PRNGKey(0))
        return _scalarize(out[0] if isinstance(out, tuple) else out)

    @jax.jit
    def loss_bwd(trainable, frozen, v, batch):
        def f(tr):
            params = merge(tr, frozen)
            out = loss_fn(params, v, batch, jax.random.PRNGKey(0))
            return out[0] if isinstance(out, tuple) else out

        loss, grads = jax.value_and_grad(f)(trainable)
        return loss + _scalarize(grads)

    # --- optimizer apply alone ------------------------------------------
    opt_state = jax.jit(tx.init)(variables["params"])
    jax.block_until_ready(opt_state)

    @jax.jit
    def opt_apply(grads, opt_state, params):
        import optax

        updates, new_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return _scalarize(jax.tree_util.tree_leaves(new_params)[0]) \
            + _scalarize(jax.tree_util.tree_leaves(new_state)[0])

    zero_grads = jax.jit(
        lambda p: jax.tree_util.tree_map(jnp.zeros_like, p)
    )(variables["params"])
    jax.block_until_ready(zero_grads)

    # --- practical MXU ceiling at encoder shapes -------------------------
    a0 = jnp.ones((500, 1280), jnp.bfloat16) * 0.01
    w1 = jnp.ones((1280, 5120), jnp.bfloat16) * 0.01
    w2 = jnp.ones((5120, 1280), jnp.bfloat16) * 0.001

    @jax.jit
    def gemm_chain(a, w1, w2):
        for _ in range(32):
            a = (a @ w1) @ w2
        return jnp.sum(a.astype(jnp.float32))

    # --- measure ----------------------------------------------------------
    def record(name, jfn, *args):
        t = _time(jfn, *args)
        f = _flops(jfn, *args)
        results[name] = {
            "time_s": round(t, 5),
            "flops": f,
            "tflops_per_s": round(f / t / 1e12, 2) if f else None,
        }
        print(f"{name}: {t*1000:.1f} ms, {f/1e9:.1f} GFLOP, "
              f"{(f/t/1e12 if f else 0):.1f} TFLOP/s",
              file=sys.stderr, flush=True)
        print(json.dumps(results), flush=True)

    record("gemm_chain_500x1280", gemm_chain, a0, w1, w2)
    record("encode_audio_video", encode_full, variables, mel, video)
    record("encode_audio_only", encode_audio, variables, mel)
    record("decode_teacher_forced", decode_tf, variables, dec, feats, xv)
    record("loss_forward", loss_fwd, variables, batch)
    record("loss_forward_backward", loss_bwd, trainable0, frozen0,
           variables, batch)
    record("optimizer_apply", opt_apply, zero_grads, opt_state,
           variables["params"])

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
