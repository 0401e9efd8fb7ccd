"""MoE FFN (models/moe.py) + expert parallelism (the "ep" mesh axis).

The reference's AV-HuBERT/Whisper stacks are dense (no MoE anywhere in
/root/reference); MoEFFN is a TPU-native scaling addition completing the
framework's parallelism set (dp x tp x sp x pp x ep). Correctness anchors:

* dense-dispatch routing equals a per-token brute-force top-k mixture
  when capacity admits every token;
* capacity overflow yields a zero FFN delta (residual passthrough, the
  Switch/GShard convention);
* the Switch auxiliary loss is 1.0 at perfect balance;
* expert-parallel execution over an 8-device (data, expert) mesh is
  numerically identical to the replicated run, with the expert blocks
  actually sharded (not silently replicated).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from avsl_tpu.core.mesh import activation_sharding_scope, make_mesh
from avsl_tpu.core.partitioning import describe_shardings, spec_for, state_shardings
from avsl_tpu.models.layers import TransformerBlock
from avsl_tpu.models.moe import EXPERT_AXIS, MoEFFN, make_ep_mesh, moe_aux_loss


def _init_moe(E, K, cf, D=8, F=16, B=2, T=6, seed=0, dtype=jnp.float32):
    moe = MoEFFN(D, F, E, top_k=K, capacity_factor=cf, dtype=dtype)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    params = moe.init(jax.random.PRNGKey(seed), x)["params"]
    return moe, params, x


def _brute_force_topk(params, x, K):
    """Per-token reference: route to top-k experts, combine with gates
    normalized over the top-k (raw prob for K=1)."""
    B, T, D = x.shape
    xt = np.asarray(x, np.float64).reshape(-1, D)
    router = np.asarray(params["router"], np.float64)
    logits = xt @ router
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    w_in = np.asarray(params["w_in"], np.float64)
    b_in = np.asarray(params["b_in"], np.float64)
    w_out = np.asarray(params["w_out"], np.float64)
    b_out = np.asarray(params["b_out"], np.float64)

    import math

    erf = np.vectorize(math.erf)
    y = np.zeros_like(xt)
    for n in range(xt.shape[0]):
        order = np.argsort(-probs[n])[:K]
        gates = probs[n][order]
        denom = gates.sum() if K > 1 else 1.0
        for e, g in zip(order, gates):
            h = xt[n] @ w_in[e] + b_in[e]
            h = 0.5 * h * (1.0 + erf(h / np.sqrt(2.0)))
            y[n] += (g / denom) * (h @ w_out[e] + b_out[e])
    return y.reshape(B, T, D)


@pytest.mark.parametrize("K", [1, 2])
def test_moe_matches_brute_force_topk(K):
    E = 4
    # capacity_factor=E makes C = K*N: no token can overflow even if the
    # router sends everything to one expert.
    moe, params, x = _init_moe(E, K, cf=float(E))
    y = moe.apply({"params": params}, x)
    want = _brute_force_topk(params, x, K)
    np.testing.assert_allclose(np.asarray(y, np.float64), want, atol=1e-4)


def test_moe_capacity_overflow_is_zero_delta():
    E, K = 2, 1
    moe, params, x = _init_moe(E, K, cf=0.01, B=1, T=8)
    # force every token onto expert 0 (positive inputs x a positive-vs-
    # negative router column): C = max(1, ...) = 1 slot
    x = jnp.abs(x) + 0.1
    params = dict(params)
    params["router"] = jnp.zeros_like(params["router"]).at[:, 0].set(1.0).at[
        :, 1
    ].set(-1.0)
    y = np.asarray(moe.apply({"params": params}, x))
    flat = y.reshape(-1, y.shape[-1])
    # exactly one token (the first) got a slot; the rest are zero
    nonzero = np.abs(flat).sum(-1) > 1e-9
    assert nonzero[0]
    assert not nonzero[1:].any()


def test_moe_aux_loss_is_one_at_balance():
    # uniform router => mean prob 1/E for every expert => aux = E * sum_e
    # f_e / E = 1.0 regardless of how argmax ties break
    E = 4
    moe, params, x = _init_moe(E, 2, cf=2.0)
    params = dict(params)
    params["router"] = jnp.zeros_like(params["router"])
    _, inter = moe.apply({"params": params}, x, mutable=["intermediates"])
    aux = moe_aux_loss(inter["intermediates"])
    assert float(aux) == pytest.approx(1.0, abs=1e-5)


def test_moe_router_gets_gradient():
    for K in (1, 2):
        moe, params, x = _init_moe(4, K, cf=4.0)

        def loss(p):
            return jnp.sum(moe.apply({"params": p}, x) ** 2)

        g = jax.grad(loss)(params)
        assert float(jnp.abs(g["router"]).max()) > 0.0, f"K={K}"


def test_transformer_block_moe_wiring():
    block = TransformerBlock(
        d_model=16, n_heads=2, d_ff=32, n_experts=4, dtype=jnp.float32
    )
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 6, 16)), jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x)
    p = variables["params"]
    assert set(p["mlp"].keys()) == {"router", "w_in", "b_in", "w_out", "b_out"}
    (y, _), state = block.apply(variables, x, mutable=["intermediates"])
    assert y.shape == x.shape
    assert float(moe_aux_loss(state["intermediates"])) > 0.0


def test_expert_partitioning_rules(eight_devices):
    mesh = make_ep_mesh(8, experts_parallel=4)
    assert spec_for("enc/layer_0/mlp/w_in", (4, 16, 32), mesh) == P("expert", None, None)
    assert spec_for("enc/layer_0/mlp/w_out", (4, 32, 16), mesh) == P("expert", None, None)
    assert spec_for("enc/layer_0/mlp/router", (16, 4), mesh) == P()
    # ep x tp mesh: expert dim on "expert", hidden dim on "model"
    from jax.sharding import Mesh

    devs = np.array(eight_devices[:8]).reshape(2, 2, 2)
    mesh3 = Mesh(devs, ("data", EXPERT_AXIS, "model"))
    assert spec_for("x/mlp/w_in", (2, 16, 32), mesh3) == P("expert", None, "model")
    assert spec_for("x/mlp/w_out", (2, 32, 16), mesh3) == P("expert", "model", None)
    # non-divisible expert count -> that axis drops, others survive
    assert spec_for("x/mlp/w_in", (3, 16, 32), mesh3) == P(None, None, "model")


def test_flamingo_loss_collects_moe_aux_from_video_trunk():
    """A MoE AV trunk inside the Whisper-Flamingo flagship feeds its
    Switch balance loss through flamingo_loss_fn (sown intermediates are
    collected across the encode boundary); a dense trunk reports none."""
    import flax.linen as nn
    import optax

    from avsl_tpu.core.config import AVHuBERTConfig, WhisperConfig
    from avsl_tpu.models import Whisper
    from avsl_tpu.models.avhubert import AVHuBERTModel
    from avsl_tpu.train.loop import TrainState, make_train_step
    from avsl_tpu.train.objectives import flamingo_loss_fn

    def build(n_experts):
        av_cfg = AVHuBERTConfig.tiny_test(
            dtype="float32", use_audio=False, modality_fuse="add",
            n_experts=n_experts,
        )

        class VideoEncoder(nn.Module):
            @nn.compact
            def __call__(self, video, mask=None, deterministic=True,
                         use_running_average=None):
                return AVHuBERTModel(av_cfg, name="av_hubert")(
                    video=video, padding_mask=mask,
                    deterministic=deterministic,
                    use_running_average=use_running_average,
                )

        w_cfg = WhisperConfig.tiny_test(
            add_gated_x_attn=1, video_state=av_cfg.hidden_size,
            dtype="float32",
        )
        return Whisper(w_cfg, video_model=VideoEncoder()), w_cfg

    rng = np.random.default_rng(0)
    results = {}
    for n_experts in (2, 0):
        model, w_cfg = build(n_experts)
        mel = jnp.asarray(rng.normal(size=(2, w_cfg.n_mels, 64)), jnp.float32)
        video = jnp.asarray(rng.normal(size=(2, 8, 24, 24, 1)), jnp.float32)
        dec = jnp.asarray(rng.integers(0, 200, (2, 5)), jnp.int32)
        labels = jnp.concatenate([dec[:, 1:], jnp.full((2, 1), 3)], axis=1)
        batch = {"input_ids": mel, "dec_input_ids": dec, "labels": labels,
                 "video": video}
        variables = model.init(jax.random.PRNGKey(0), mel, dec, video=video)
        tx = optax.adam(1e-3)
        step = make_train_step(flamingo_loss_fn(model, train=True), tx,
                               donate=False)
        state = TrainState.create(
            variables["params"], tx, batch_stats=variables.get("batch_stats")
        )
        _, m = step(state, batch)
        results[n_experts] = m
        assert np.isfinite(float(m["loss"]))
    assert float(results[2]["moe_aux"]) > 0.5
    assert "moe_aux" not in results[0]


def test_avhubert_ft_cli_moe_ep(eight_devices):
    """The ep axis is user-reachable: --n_experts + --experts_parallel on
    the AV-HuBERT fine-tune CLI trains a MoE encoder on a (data, expert)
    mesh with the expert blocks sharded."""
    from avsl_tpu.cli.avhubert_ft import main

    res = main(["--smoke", "--n_experts", "4", "--experts_parallel", "4"])
    assert res["n_experts"] == 4
    assert res["mesh"] == {"data": 2, "expert": 4}
    assert res["sharded_params"] >= 8
    assert res["last_loss"] < res["first_loss"]


def test_avhubert_ft_cli_ctc_moe_tp(eight_devices):
    """CTC head + MoE on a tensor-parallel mesh: the expert axis drops
    (no `expert` axis in the mesh) but hidden dims still shard on
    `model`, and the aux loss flows through the CLI's CTC closure."""
    from avsl_tpu.cli.avhubert_ft import main

    res = main(["--smoke", "--head", "ctc", "--n_experts", "2",
                "--model_parallel", "2"])
    assert res["mesh"] == {"data": 4, "model": 2}
    assert res["sharded_params"] > 0
    assert np.isfinite(res["last_loss"])


def test_ep_matches_replicated(eight_devices):
    """Expert-parallel block output and gradients equal the replicated
    run — XLA inserts the dispatch all-to-all from the sharding
    constraints; layout must not change numerics."""
    block = TransformerBlock(
        d_model=16, n_heads=2, d_ff=32, n_experts=4, moe_top_k=2,
        dtype=jnp.float32,
    )
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 8, 16)), jnp.float32)
    variables = block.init(jax.random.PRNGKey(1), x)
    params = variables["params"]

    def loss(p, xin):
        (y, _), state = block.apply(
            {"params": p}, xin, mutable=["intermediates"]
        )
        return jnp.sum(y**2) + 0.01 * moe_aux_loss(state["intermediates"])

    want_l, want_g = jax.jit(jax.value_and_grad(loss))(params, x)

    mesh = make_ep_mesh(8, experts_parallel=4)
    shardings = state_shardings(params, mesh)
    sharded = [
        (p, s) for p, _, s in describe_shardings(params, mesh)
        if EXPERT_AXIS in str(s)
    ]
    assert len(sharded) >= 4, f"expert params not sharded: {sharded}"
    p_ep = jax.tree_util.tree_map(jax.device_put, params, shardings)
    x_ep = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    with activation_sharding_scope(mesh):
        got_l, got_g = jax.jit(
            jax.value_and_grad(loss),
            in_shardings=(shardings, NamedSharding(mesh, P("data", None, None))),
        )(p_ep, x_ep)

    assert float(got_l) == pytest.approx(float(want_l), rel=1e-5)
    for path, gw in jax.tree_util.tree_flatten_with_path(want_g)[0]:
        gg = got_g
        for k in path:
            gg = gg[k.key]
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(gw), atol=5e-4,
            err_msg=str(path),
        )


def test_moe_padding_mask_invariance():
    """Appending padded positions (with `valid` marking them) must leave
    real-token outputs bit-identical and give pads a zero FFN delta —
    pads must not claim capacity or shift the balance statistics."""
    E, K, D = 4, 2, 8
    moe, params, x = _init_moe(E, K, cf=float(E), T=6)
    B, T, _ = x.shape

    y_ref, inter_ref = moe.apply(
        {"params": params}, x, mutable=["intermediates"]
    )

    pad = 3
    xp = jnp.concatenate([x, jnp.zeros((B, pad, D), x.dtype)], axis=1)
    valid = jnp.concatenate(
        [jnp.ones((B, T)), jnp.zeros((B, pad))], axis=1
    )
    y_pad, inter_pad = moe.apply(
        {"params": params}, xp, valid=valid, mutable=["intermediates"]
    )

    np.testing.assert_allclose(
        np.asarray(y_pad[:, :T]), np.asarray(y_ref), atol=1e-6
    )
    # pad positions: zero delta (residual passthrough at the block level)
    assert float(jnp.abs(y_pad[:, T:]).max()) == 0.0
    # balance statistics computed over real tokens only
    np.testing.assert_allclose(
        float(moe_aux_loss(inter_pad["intermediates"])),
        float(moe_aux_loss(inter_ref["intermediates"])),
        atol=1e-6,
    )


def test_transformer_block_moe_padding_via_kv_lengths():
    """The block derives the MoE `valid` mask from the same kv_lengths
    that mask self-attention: real-position outputs are invariant to
    suffix padding through the WHOLE block (attention + MoE FFN)."""
    block = TransformerBlock(
        d_model=16, n_heads=2, d_ff=32, n_experts=4,
        moe_capacity_factor=4.0, dtype=jnp.float32,
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 5, 16)), jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x)

    lengths = jnp.asarray([5, 5], jnp.int32)
    y_ref, _ = block.apply(variables, x, kv_lengths=lengths)

    xp = jnp.concatenate([x, jnp.zeros((2, 4, 16), x.dtype)], axis=1)
    y_pad, _ = block.apply(variables, xp, kv_lengths=lengths)
    np.testing.assert_allclose(
        np.asarray(y_pad[:, :5]), np.asarray(y_ref), atol=1e-5
    )
