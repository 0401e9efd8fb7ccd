"""Train-step throughput + MFU at the reference fine-tuning envelope.

Times the jitted SPMD train step of the flagship Whisper-Flamingo model
(whisper large-v2 + AV-HuBERT-large video encoder, gated cross-attention
— the reference's /root/reference/config/ami_whisper_flamingo_large.yaml
envelope) on one chip:

* the reference's own configuration: batch 1 x grad-accum 16, 30 s
  segments, bf16 compute + bf16 resident params (the reference trains
  Lightning precision 16, YAML :31-36), flamingo freeze regime (gated
  x-attn + video projection trainable, reference :642-651), gradient
  checkpointing on every transformer block;
* a throughput-oriented configuration (batch 4 x accum 1, 10 s segments)
  showing what the same chip sustains when the batch is packed.

Inputs and parameters are CREATED ON DEVICE (jit init / jit random) — no
host->device parameter upload, so the measurement is independent of the
tunnel's transfer-budget state.

MFU: model matmul FLOPs per step / wall time / chip bf16 peak. FLOPs
come from XLA's compiled cost analysis when the backend provides one,
else from an analytic 2*P*T matmul estimate (fwd) x3 (bwd) x(4/3 remat).

Prints ONE JSON line (consumed by bench.py as the "train_step" object).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

# v5e bf16 peak (jax-ml.github.io/scaling-book hardware tables)
PEAK_BF16 = {
    "TPU v5e": 197e12,
    "TPU v5 lite": 197e12,
    "TPU v4": 275e12,
    "TPU v6e": 918e12,
}


class _Cfg:
    learning_rate = 1e-5   # reference YAML lr
    warmup_steps = 2
    weight_decay = 0.01
    adam_epsilon = 1e-8
    add_gated_x_attn = 1
    video_projection_train_only = False
    freeze_video_model = True


def _analytic_flops_per_step(tokens_by_tower, accum_micro):
    """Matmul-FLOPs estimate: fwd ~ 2 * P_tower * T_tower per tower, times
    a per-tower multiplier (1.0 = forward-only for frozen towers whose
    backward XLA dead-code-eliminates; 3 x 4/3 = fwd+bwd+remat-reforward
    for towers the backward traverses), x microbatches."""
    import jax

    def count(tree):
        return sum(
            int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves(tree)
            if hasattr(l, "shape") and len(getattr(l, "shape", ())) >= 2
        )

    total = 0.0
    for tower, tokens, mult in tokens_by_tower:
        total += 2.0 * count(tower) * tokens * mult
    return total * accum_micro


def measure(model_name: str, envelope: str) -> dict:
    import jax
    import jax.numpy as jnp

    from avsl_tpu.core.mesh import make_mesh
    from avsl_tpu.models.factory import build_whisper_flamingo
    from avsl_tpu.train import TrainState, make_train_step
    from avsl_tpu.train.objectives import flamingo_loss_fn
    from avsl_tpu.train.optim import select_optimizer

    # remat variant knob: "block" (whole-block checkpointing), "dots"
    # (save GEMM outputs, recompute attention internals/elementwise),
    # "none" (no rematerialization — at micro-batch 1 the activations
    # fit easily, so the backward skips the re-forward entirely)
    remat_mode = os.environ.get("AVSL_BENCH_TRAIN_REMAT", "block")
    model, cfg = build_whisper_flamingo(
        model_name, add_gated_x_attn=1, dtype="bfloat16",
        remat=remat_mode != "none",
        remat_policy=remat_mode if remat_mode != "none" else "block",
    )
    if envelope == "reference":
        # the YAML's own envelope: batch 1 x accum 16 AND the 10 s audio
        # cap (audio_max_length/dataset_audio_max_length: 160000 samples,
        # max_duration_filter_seconds: 10.0 — ami_whisper_flamingo_large
        # .yaml:11-17,31-36)
        accum, micro, seconds, label_len = 16, 1, 10, 120
    else:  # throughput
        accum, micro, seconds, label_len = 1, 4, 10, 48
    if model_name == "test":  # CI smoke shapes
        accum, micro, seconds, label_len = min(accum, 2), micro, 1, 8
    t_mel = min(seconds * 100, cfg.n_audio_ctx * 2)
    t_vid = seconds * 25

    dev = jax.devices()[0]
    log = (lambda m: print(m, file=sys.stderr, flush=True)) \
        if os.environ.get("AVSL_BENCH_PROFILE") else (lambda m: None)

    # ---- device-created inputs & state --------------------------------
    def batch_shape(*s):
        return (accum, micro, *s) if accum > 1 else (micro, *s)

    @jax.jit
    def make_batch(key):
        k1, k2, k3 = jax.random.split(key, 3)
        mel = 0.1 * jax.random.normal(
            k1, batch_shape(cfg.n_mels, t_mel), jnp.float32
        )
        # video rides WITHOUT the trailing singleton channel and in bf16:
        # a bf16[1,750,88,88,1] tensor picks a layout whose tiled minor
        # dims are (batch=1, channel=1) and pads 256x (2.77 GB for an
        # 11 MB tensor — measured OOM at the large-v2 envelope). The
        # ResNet3D frontend expands the channel dim internally, inside
        # its remat boundary, so the saved residual stays 4D.
        video = jax.random.normal(
            k2, batch_shape(t_vid, 88, 88), jnp.bfloat16
        )
        dec = jax.random.randint(
            k3, batch_shape(label_len), 0, cfg.n_vocab - 2
        ).astype(jnp.int32)
        labels = jnp.concatenate(
            [dec[..., 1:],
             jnp.full(batch_shape(1)[:-1] + (1,), cfg.n_vocab - 1, jnp.int32)],
            axis=-1,
        )
        return {"input_ids": mel, "dec_input_ids": dec, "labels": labels,
                "video": video}

    t0 = time.perf_counter()
    batch = make_batch(jax.random.PRNGKey(0))
    one = jax.tree_util.tree_map(
        lambda x: x[0] if accum > 1 else x, batch
    )
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(1), one["input_ids"], one["dec_input_ids"],
        video=one["video"],
    )
    # bf16 resident params — the reference trains mixed precision 16.
    # batch_stats stay fp32: the BN update emits fp32 running stats and a
    # bf16 carry would break the grad-accum scan's type invariance
    variables = dict(variables)
    variables["params"] = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        variables["params"],
    )
    variables = jax.device_put(variables)
    jax.block_until_ready(variables)
    log(f"init: {time.perf_counter() - t0:.1f}s")

    params = variables["params"]
    n_params = sum(
        int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params)
    )
    tx, labels_tree = select_optimizer(params, _Cfg(), t_total=100)
    n_trainable = sum(
        int(np.prod(l.shape))
        for l, lab in zip(
            jax.tree_util.tree_leaves(params),
            jax.tree_util.tree_leaves(labels_tree),
        )
        if lab == "train"
    )
    # freeze_video_bn_stats mirrors the reference flagship regime
    # (freeze_video_batch_norm_stats: true, whisper_flamingo_ft_ami.py:
    # 508-509) — also required by the tower hoist (batched BN forward
    # must read running stats, not per-micro-step updates)
    loss_fn = flamingo_loss_fn(model, train=True, freeze_video_bn_stats=True)
    # param_labels => only the trainable subtree is differentiated — the
    # reference's requires_grad=False freeze as torch actually executes
    # it (no backward through the frozen AV-HuBERT trunk / whisper body).
    # AVSL_BENCH_TRAIN_HOIST=0 disables the frozen-tower hoist (the
    # default mirrors production: cli/finetune.py enables it whenever the
    # regime freezes both towers — flamingo_projection does). The hoist
    # always runs split (its own program): the fused form hit the
    # tunnel's pathological-compile class (>30 min, vs ~4 min unhoisted),
    # and per-program cost analysis keeps the FLOPs attribution honest —
    # the scan-body x accum correction must not scale the towers.
    hoist = os.environ.get("AVSL_BENCH_TRAIN_HOIST", "1") == "1" and accum > 1
    precompute = None
    if hoist:
        from avsl_tpu.train.objectives import flamingo_tower_precompute

        precompute = flamingo_tower_precompute(
            model, train=True, freeze_video_bn_stats=True
        )
    mesh1 = make_mesh(1, devices=[dev])
    pre = None
    if hoist:
        step, pre = make_train_step(
            loss_fn, tx, mesh=mesh1,
            grad_accum_steps=accum, donate=True, param_labels=labels_tree,
            precompute_fn=precompute, split_precompute=True,
        )
    else:
        step = make_train_step(
            loss_fn, tx, mesh=mesh1,
            grad_accum_steps=accum, donate=True, param_labels=labels_tree,
        )
    state = TrainState.create(
        params, tx, batch_stats=variables.get("batch_stats")
    )

    # ---- compile + FLOPs ----------------------------------------------
    def _ca_flops(compiled):
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) if ca else 0.0

    flops = None
    flops_source = "analytic"
    call = step
    compile_s = None
    t0 = time.perf_counter()
    # the try covers ONLY lower()/compile() (AOT availability): a failure
    # in the first compiled EXECUTION (e.g. runtime HBM OOM) must
    # propagate, not be mislabeled "AOT unavailable" and trigger a second
    # multi-minute compile of the same doomed program via step()
    try:
        pre_flops = 0.0
        if pre is not None:
            compiled_pre = pre.lower(state, batch).compile()
            log(f"pre compile: {time.perf_counter() - t0:.1f}s")
            try:
                pre_flops = _ca_flops(compiled_pre)
            except Exception:
                pre_flops = 0.0
            ctx0 = compiled_pre(state, batch)
            compiled_step = step.lower(state, batch, ctx0).compile()
            call = lambda s, b: compiled_step(s, b, compiled_pre(s, b))  # noqa: E731
        else:
            compiled_step = step.lower(state, batch).compile()
            call = compiled_step  # re-calling the jit fn would RE-compile
        compile_s = time.perf_counter() - t0
        try:
            step_flops = _ca_flops(compiled_step)
            if step_flops > 0:
                flops = step_flops
                flops_source = "xla_cost_analysis"
                if accum > 1:
                    # XLA cost analysis counts a lax.scan body ONCE, not
                    # x trip-count (verified: the accum-16 program reports
                    # 2.1e12 while the scan-free micro-4 program reports
                    # 1.59e12 PER SEGMENT at the same dims). The grad-accum
                    # scan dominates the STEP program; scale by its trip
                    # count. The hoisted tower program (pre) runs once per
                    # step and is added unscaled.
                    flops *= accum
                    flops_source = "xla_cost_analysis*accum(scan_body)"
                if pre_flops > 0:
                    flops += pre_flops
                    flops_source += "+pre"
        except Exception:
            pass
    except Exception:
        # AOT lowering/compile unavailable on this backend — the plain
        # jit call below compiles instead
        if pre is not None:
            call = lambda s, b: step(s, b, pre(s, b))  # noqa: E731
        else:
            call = step
    state, metrics = call(state, batch)
    if compile_s is None:
        compile_s = time.perf_counter() - t0
    float(metrics["loss"])  # sync
    log(f"train-step compile+first: {compile_s:.1f}s")

    if flops is None:
        # flamingo freeze: encoder + video tower are forward-only (their
        # params are frozen and no trainable param needs a cotangent
        # through them); the decoder backward runs (gated x-attn params
        # are interleaved in it)
        towers = [
            (params.get("encoder", {}), micro * t_mel // 2, 1.0),
            (params.get("decoder", {}), micro * label_len, 3.0 * 4.0 / 3.0),
            (params.get("video_model", {}), micro * t_vid, 1.0),
        ]
        flops = _analytic_flops_per_step(towers, accum)

    # ---- timed steps ---------------------------------------------------
    n_steps = int(os.environ.get("AVSL_BENCH_TRAIN_STEPS", "4"))
    times = []
    t_loop = time.perf_counter()
    for i in range(n_steps):
        ti = time.perf_counter()
        state, metrics = call(state, batch)
        loss = float(metrics["loss"])  # d2h sync anchors each step
        times.append(time.perf_counter() - ti)
        log(f"step {i}: {times[-1]:.3f}s loss={loss:.3f}")
    total = time.perf_counter() - t_loop
    step_s = float(np.median(times))

    segs = accum * micro
    kind = getattr(dev, "device_kind", "unknown")
    peak = next((v for k, v in PEAK_BF16.items() if k in str(kind)), None)
    out = {
        "envelope": envelope,
        "model": model_name,
        "accum": accum,
        "micro_batch": micro,
        "segment_seconds": seconds,
        "label_len": label_len,
        "n_params": n_params,
        "n_trainable": n_trainable,
        "freeze_regime": "flamingo_projection",
        # measured identical across block/dots/none at this envelope: the
        # frozen towers run forward-only and the decoder is not remat'd,
        # so no recompute exists for the policy to remove
        "remat": remat_mode,
        "tower_hoist": hoist,
        "param_dtype": "bfloat16",
        "step_time_s": round(step_s, 4),
        "steps_per_sec": round(1.0 / step_s, 4),
        "segments_per_sec": round(segs / step_s, 3),
        "audio_seconds_per_sec": round(segs * seconds / step_s, 1),
        "tokens_per_sec": round(segs * label_len / step_s, 1),
        "sustained_steps_per_sec": round(n_steps / total, 4),
        "compile_s": round(compile_s, 1),
        "flops_per_step": flops,
        "flops_source": flops_source,
        "device_kind": str(kind),
    }
    if peak:
        out["mfu"] = round(flops / step_s / peak, 4)
        out["peak_bf16_flops"] = peak
    return out


def main() -> None:
    model_name = os.environ.get("AVSL_BENCH_TRAIN_MODEL", "large-v2")
    envelopes = os.environ.get(
        "AVSL_BENCH_TRAIN_ENVELOPES", "reference,throughput"
    ).split(",")
    result = {}
    for envelope in envelopes:
        try:
            result[envelope.strip()] = measure(model_name, envelope.strip())
        except Exception as e:  # noqa: BLE001 — record, don't die
            result[envelope.strip()] = {"error": f"{type(e).__name__}: {e}"}
        # each envelope's JSON lands even if a later one hangs past the
        # parent's timeout
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
