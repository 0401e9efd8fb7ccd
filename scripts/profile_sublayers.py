"""RTT-free sublayer attribution for the large-v2 train envelope.

The tunneled axon backend has a ~27 ms host<->device round trip per
d2h pull and `block_until_ready` acks at dispatch, so single-shot
timings are useless below ~100 ms. This script times each sublayer as
K serial applications inside ONE jitted `lax.fori_loop` program (the
loop body's output feeds the next iteration through a runtime-epsilon
data dependency so XLA cannot hoist or CSE the body), pulls one f32
scalar at the end, and divides by K. Components are the large-v2
Whisper-Flamingo step's constituents at the reference envelope shapes
(config/ami_whisper_flamingo_large.yaml: 10 s audio -> mel [1,80,1000]
-> enc seq 500; video 250 frames @ 88x88; dec 120 tokens).

Prints one JSON line per component to stdout (cumulative dict).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = int(os.environ.get("PROF_K", "192"))
ITERS = 5


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    results: dict = {"device": str(jax.devices()[0].device_kind), "K": K}

    # ---- null RTT ------------------------------------------------------
    @jax.jit
    def null_prog(x):
        return x * 1.0

    x0 = jnp.float32(1.0)
    float(null_prog(x0)); float(null_prog(x0))
    rtts = []
    for _ in range(8):
        t0 = time.perf_counter(); float(null_prog(x0))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    results["rtt_s"] = round(rtt, 5)
    print(f"rtt: {rtt*1000:.1f} ms", file=sys.stderr, flush=True)

    def scalarize(tree):
        tot = jnp.float32(0)
        for leaf in jax.tree_util.tree_leaves(tree):
            if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.number):
                tot = tot + jnp.sum(leaf.astype(jnp.float32))
        return tot

    def measure(name, f, x, flops_1x=None):
        """f: x -> anything. Times K serial applications of f."""

        @jax.jit
        def prog(x, eps):
            def body(_, carry):
                out = f(carry)
                s = scalarize(out)
                # eps is a runtime zero: the add is unfoldable, keeps the
                # loop serial, and costs one scalar broadcast per iter.
                return carry * (1.0 + eps * s).astype(carry.dtype)

            return scalarize(lax.fori_loop(0, K, body, x))

        eps = jnp.float32(0.0)
        try:
            if flops_1x is None:
                c = jax.jit(lambda y: scalarize(f(y))).lower(x).compile()
                ca = c.cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                flops_1x = float(ca.get("flops", 0.0)) if ca else 0.0
        except Exception:
            flops_1x = 0.0
        float(prog(x, eps)); float(prog(x, eps))
        ts = []
        for _ in range(ITERS):
            t0 = time.perf_counter(); float(prog(x, eps))
            ts.append(time.perf_counter() - t0)
        t = (float(np.median(ts)) - rtt) / K
        results[name] = {
            "time_ms": round(t * 1e3, 3),
            "gflop": round(flops_1x / 1e9, 2),
            "tflops_per_s": round(flops_1x / t / 1e12, 1) if flops_1x else None,
        }
        print(f"{name}: {t*1e3:.2f} ms, {flops_1x/1e9:.1f} GFLOP, "
              f"{(flops_1x/t/1e12 if flops_1x else 0):.1f} TFLOP/s",
              file=sys.stderr, flush=True)
        print(json.dumps(results), flush=True)

    from avsl_tpu.models.layers import MLP, MultiHeadAttention, TransformerBlock
    from avsl_tpu.models.resnet3d import ResNet3DFrontend

    rng = jax.random.PRNGKey(0)
    bf16 = jnp.bfloat16

    # ---- whisper encoder sublayers (d=1280 h=20 ffn=5120, seq 500) -----
    x_enc = jax.random.normal(rng, (1, 500, 1280), bf16) * 0.02

    blk = TransformerBlock(1280, 20, 5120, dtype=bf16)
    v_blk = blk.init(rng, x_enc, deterministic=True)
    measure("enc_block", lambda x: blk.apply(v_blk, x, deterministic=True), x_enc)

    attn = MultiHeadAttention(1280, 20, dtype=bf16)
    v_attn = attn.init(rng, x_enc)
    measure("enc_self_attn", lambda x: attn.apply(v_attn, x), x_enc)

    mlp = MLP(1280, 5120, dtype=bf16)
    v_mlp = mlp.init(rng, x_enc)
    measure("enc_mlp", lambda x: mlp.apply(v_mlp, x), x_enc)

    from avsl_tpu.models.layers import LayerNormF32

    ln = LayerNormF32()
    v_ln = ln.init(rng, x_enc)
    measure("enc_layernorm", lambda x: ln.apply(v_ln, x), x_enc)

    # ---- AV-HuBERT trunk block (d=1024 h=16 ffn=4096, seq 250) ---------
    x_av = jax.random.normal(rng, (1, 250, 1024), bf16) * 0.02
    blk_av = TransformerBlock(1024, 16, 4096, dtype=bf16)
    v_av = blk_av.init(rng, x_av, deterministic=True)
    measure("av_trunk_block", lambda x: blk_av.apply(v_av, x, deterministic=True), x_av)

    # ---- decoder block (q=120, self causal + cross to 500) -------------
    x_dec = jax.random.normal(rng, (1, 120, 1280), bf16) * 0.02
    feats = jax.random.normal(rng, (1, 500, 1280), bf16) * 0.02
    blk_dec = TransformerBlock(1280, 20, 5120, has_cross_attn=True,
                               causal_self_attn=True, dtype=bf16)
    v_dec = blk_dec.init(rng, x_dec, enc=feats, deterministic=True)
    measure("dec_block", lambda x: blk_dec.apply(v_dec, x, enc=feats,
                                                 deterministic=True), x_dec)

    # ---- ResNet-3D video tower ([1,250,88,88,1]) ------------------------
    video = jax.random.normal(rng, (1, 250, 88, 88, 1), bf16) * 0.1
    fe = ResNet3DFrontend(dtype=bf16)
    v_fe = fe.init(rng, video)

    def run_fe(x):
        return fe.apply(v_fe, x)

    measure("video_tower", run_fe, video)

    # ---- whisper audio conv frontend ([1,80,1000]) ----------------------
    import flax.linen as nn

    class _Convs(nn.Module):
        @nn.compact
        def __call__(self, mel):
            x = mel.transpose(0, 2, 1).astype(bf16)
            x = nn.Conv(1280, (3,), padding=1, dtype=bf16)(x)
            x = nn.gelu(x)
            x = nn.Conv(1280, (3,), strides=(2,), padding=1, dtype=bf16)(x)
            return nn.gelu(x)

    mel = jax.random.normal(rng, (1, 80, 1000), bf16)
    convs = _Convs()
    v_c = convs.init(rng, mel)
    measure("audio_conv_frontend", lambda x: convs.apply(v_c, x), mel)

    # ---- wav2vec2-style audio frontend if used ---------------------------
    # (AV-HuBERT audio path consumes 104-dim stacked fbank: cheap; skip)

    # ---- backward of the encoder block ----------------------------------
    def enc_block_grad(x):
        return jax.grad(
            lambda y: jnp.sum(blk.apply(v_blk, y, deterministic=True)[0]
                              .astype(jnp.float32)))(x)

    measure("enc_block_fwd_bwd", enc_block_grad, x_enc)

    def dec_block_grad(x):
        return jax.grad(
            lambda y: jnp.sum(blk_dec.apply(v_dec, y, enc=feats,
                                            deterministic=True)[0]
                              .astype(jnp.float32)))(x)

    measure("dec_block_fwd_bwd", dec_block_grad, x_dec)

    def video_tower_grad(x):
        return jax.grad(
            lambda y: jnp.sum(run_fe(y).astype(jnp.float32)))(x)

    measure("video_tower_fwd_bwd", video_tower_grad, video)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
