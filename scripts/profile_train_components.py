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
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, *args, iters=6):
    out = fn(*args)
    jax_block(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax_block(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def jax_block(x):
    import jax

    jax.block_until_ready(x)


def _flops(fn, *args):
    import jax

    try:
        c = jax.jit(fn).lower(*args).compile()
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

    # --- encoder forward (audio + video towers together, then split) ----
    @jax.jit
    def encode_full(v, mel, video):
        return model.apply(v, mel, video, deterministic=True,
                           method=model.encode)

    @jax.jit
    def encode_audio(v, mel):
        return model.apply(v, mel, None, deterministic=True,
                           method=model.encode)

    @jax.jit
    def decode_tf(v, dec, feats, xv):
        logits, _ = model.apply(v, dec, feats, xv=xv, deterministic=True,
                                method=model.decode)
        return logits

    feats, xv = encode_full(variables, mel, video)
    jax_block((feats, xv))

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

    import flax

    part = flax.core.freeze if False else (lambda x: x)
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
        return out[0] if isinstance(out, tuple) else out

    @jax.jit
    def loss_bwd(trainable, frozen, v, batch):
        def f(tr):
            params = merge(tr, frozen)
            out = loss_fn(params, v, batch, jax.random.PRNGKey(0))
            return out[0] if isinstance(out, tuple) else out

        return jax.value_and_grad(f)(trainable)

    # --- optimizer apply alone ------------------------------------------
    opt_state = jax.jit(tx.init)(variables["params"])
    jax_block(opt_state)

    @jax.jit
    def opt_apply(grads, opt_state, params):
        updates, new_state = tx.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, updates), new_state

    zero_grads = jax.jit(
        lambda p: jax.tree_util.tree_map(jnp.zeros_like, p)
    )(variables["params"])
    jax_block(zero_grads)

    # --- practical MXU ceiling at encoder shapes -------------------------
    a0 = jnp.zeros((500, 1280), jnp.bfloat16)
    w1 = jnp.zeros((1280, 5120), jnp.bfloat16)
    w2 = jnp.zeros((5120, 1280), jnp.bfloat16)

    @jax.jit
    def gemm_chain(a, w1, w2):
        for _ in range(32):
            a = (a @ w1) @ w2
        return a

    # --- measure ----------------------------------------------------------
    def record(name, fn, *args):
        t = _time(fn, *args)
        f = _flops(lambda *a: fn(*a), *args)
        results[name] = {
            "time_s": round(t, 5),
            "flops": f,
            "tflops_per_s": round(f / t / 1e12, 2) if f else None,
        }
        print(f"{name}: {t*1000:.1f} ms, {f/1e9:.1f} GFLOP, "
              f"{(f/t/1e12 if f else 0):.1f} TFLOP/s",
              file=sys.stderr, flush=True)

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
