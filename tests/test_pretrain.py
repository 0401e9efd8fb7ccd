"""AV-HuBERT masked-cluster pretraining head (models/pretrain.py).

The reference repo fine-tunes fairseq-pretrained checkpoints and cannot
pretrain from scratch (the criterion lives in external fairseq); these
tests pin the from-scratch objective's semantics:

* logits geometry (per-group codebook matmul, cosine bound / logit_temp)
* masked-vs-unmasked CE selection honours the drawn span mask + padding
* skip_masked / skip_nomask gates
* untied multi-group projection slicing
* end-to-end learnability: masked prediction of input-derived cluster ids
  beats chance by a wide margin after a few dozen Adam steps
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from avsl_tpu.core.config import AVHuBERTConfig
from avsl_tpu.models.pretrain import AVHuBERTForPretraining, pretrain_loss
from avsl_tpu.train.loop import TrainState, make_train_step
from avsl_tpu.train.objectives import avhubert_pretrain_loss_fn

B, T, N_CLS = 2, 32, 11


def _audio_cfg(**kw):
    return AVHuBERTConfig.tiny_test(
        dtype="float32", use_visual=False, modality_fuse="add",
        mask_prob_audio=0.5, mask_length_audio=4, **kw
    )


def _init_and_forward(cfg, num_classes=(N_CLS,), seed=0):
    model = AVHuBERTForPretraining(cfg, num_classes=num_classes)
    rng = np.random.default_rng(seed)
    audio = jnp.asarray(rng.normal(size=(B, T, cfg.audio_feat_dim)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, min(num_classes), (B, T)), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(seed), "mask": jax.random.PRNGKey(seed + 1)},
        audio=audio, targets=targets, deterministic=True,
    )
    return model, variables, audio, targets


def test_forward_shapes_and_cosine_bound():
    cfg = _audio_cfg()
    model, variables, audio, targets = _init_and_forward(cfg)
    out = model.apply(
        variables, audio=audio, targets=targets,
        rngs={"mask": jax.random.PRNGKey(7)}, deterministic=True,
    )
    (logits,) = out["logits"]
    assert logits.shape == (B, T, N_CLS)
    assert out["mask"].shape == (B, T) and out["mask"].dtype == bool
    # some frames masked at prob 0.5, but not all
    frac = float(jnp.mean(out["mask"]))
    assert 0.1 < frac < 0.9
    # cosine similarity / logit_temp is bounded
    assert float(jnp.max(jnp.abs(logits))) <= 1.0 / cfg.logit_temp + 1e-4
    loss, metrics = pretrain_loss(out, cfg)
    assert np.isfinite(float(loss))
    for k in ("loss_m", "loss_u", "acc_m", "acc_u"):
        assert np.isfinite(float(metrics[k]))


def test_padding_excluded_from_mask_and_loss():
    cfg = _audio_cfg()
    model, variables, audio, targets = _init_and_forward(cfg)
    padding = jnp.zeros((B, T), jnp.float32).at[:, : T // 2].set(1.0)
    out = model.apply(
        variables, audio=audio, targets=targets, padding_mask=padding,
        rngs={"mask": jax.random.PRNGKey(3)}, deterministic=True,
    )
    # span_mask ANDs with padding: no masked frames inside padding
    assert not bool(jnp.any(out["mask"][:, T // 2:]))
    # loss is invariant to target values at padded positions
    loss_a, _ = pretrain_loss(out, cfg)
    out2 = dict(out)
    tgt2 = out["targets"].at[:, T // 2:, :].set(
        (out["targets"][:, T // 2:, :] + 1) % N_CLS
    )
    out2["targets"] = tgt2
    loss_b, _ = pretrain_loss(out2, cfg)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)


def test_skip_gates_zero_their_terms():
    base = _audio_cfg()
    model, variables, audio, targets = _init_and_forward(base)
    out = model.apply(
        variables, audio=audio, targets=targets,
        rngs={"mask": jax.random.PRNGKey(5)}, deterministic=True,
    )
    _, m_full = pretrain_loss(out, base)
    _, m_skip_m = pretrain_loss(out, _audio_cfg(skip_masked=True))
    _, m_skip_u = pretrain_loss(out, _audio_cfg(skip_nomask=True))
    assert float(m_skip_m["loss_m"]) == 0.0
    assert float(m_skip_u["loss_u"]) == 0.0
    np.testing.assert_allclose(
        float(m_skip_m["loss_u"]), float(m_full["loss_u"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(m_skip_u["loss_m"]), float(m_full["loss_m"]), rtol=1e-6
    )


def test_untied_multi_group_projection():
    cfg = _audio_cfg(untie_final_proj=True)
    groups = (N_CLS, 5)
    model, variables, audio, _ = _init_and_forward(cfg, num_classes=groups)
    rng = np.random.default_rng(1)
    targets = jnp.stack(
        [jnp.asarray(rng.integers(0, g, (B, T)), jnp.int32) for g in groups],
        axis=-1,
    )
    out = model.apply(
        variables, audio=audio, targets=targets,
        rngs={"mask": jax.random.PRNGKey(9)}, deterministic=True,
    )
    assert len(out["logits"]) == 2
    assert out["logits"][0].shape == (B, T, groups[0])
    assert out["logits"][1].shape == (B, T, groups[1])
    # untied: final_proj output is final_dim per group
    kernel = variables["params"]["final_proj"]["kernel"]
    assert kernel.shape[-1] == cfg.final_dim * 2
    # label embedding codebook is the concat over groups
    assert variables["params"]["label_embs"].shape == (sum(groups), cfg.final_dim)
    loss, _ = pretrain_loss(out, cfg)
    assert np.isfinite(float(loss))


def test_dot_sim_type():
    cfg = _audio_cfg(sim_type="dot")
    model, variables, audio, targets = _init_and_forward(cfg)
    out = model.apply(
        variables, audio=audio, targets=targets,
        rngs={"mask": jax.random.PRNGKey(2)}, deterministic=True,
    )
    loss, _ = pretrain_loss(out, cfg)
    assert np.isfinite(float(loss))


def test_pretrain_learnability_audio_only():
    """Masked cluster prediction on input-derived targets becomes far
    better than chance within a few dozen steps (gradient flows through
    the mask embedding, the codebook, and the encoder)."""
    cfg = _audio_cfg(
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        dropout_input=0.0, dropout_features=0.0, modality_dropout=0.0,
        layerdrop=0.0, feature_grad_mult=1.0,
    )
    model = AVHuBERTForPretraining(cfg, num_classes=(4,))
    rng = np.random.default_rng(0)
    # cluster id is a simple function of the frame content: which quadrant
    # of feature-space the frame's two channel-block means fall in
    audio = np.asarray(rng.normal(size=(4, T, cfg.audio_feat_dim)), np.float32)
    half = cfg.audio_feat_dim // 2
    tid = (audio[..., :half].mean(-1) > 0).astype(np.int32) * 2 + (
        audio[..., half:].mean(-1) > 0
    ).astype(np.int32)
    batch = {
        "audio": jnp.asarray(audio),
        "targets": jnp.asarray(tid),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        audio=batch["audio"], targets=batch["targets"], deterministic=True,
    )
    tx = optax.adam(3e-3)
    loss_fn = avhubert_pretrain_loss_fn(model, train=True)
    step = make_train_step(loss_fn, tx, donate=False)
    state = TrainState.create(variables["params"], tx)
    first = None
    for i in range(60):
        state, metrics = step(state, batch)
        loss = float(metrics["loss"])
        assert np.isfinite(loss), f"NaN at step {i}"
        if first is None:
            first = loss
    # evaluate masked accuracy with the trained params
    eval_fn = avhubert_pretrain_loss_fn(model, train=False)
    _, (m, _) = eval_fn(state.params, None, batch, jax.random.PRNGKey(42))
    assert float(m["acc_m"]) > 0.6, f"masked acc {float(m['acc_m'])} (chance 0.25)"
    assert loss < first


def test_objective_reports_feature_penalty():
    cfg = _audio_cfg()
    model, variables, audio, targets = _init_and_forward(cfg)
    batch = {"audio": audio, "targets": targets}
    loss_fn = avhubert_pretrain_loss_fn(model, train=False)
    loss, (metrics, _) = loss_fn(variables["params"], None, batch,
                                 jax.random.PRNGKey(0))
    assert "features_pen" in metrics and np.isfinite(float(metrics["features_pen"]))
    # penalty contributes: weight-0 loss is strictly smaller
    loss0, _ = avhubert_pretrain_loss_fn(model, train=False,
                                         feature_pen_weight=0.0)(
        variables["params"], None, batch, jax.random.PRNGKey(0)
    )
    assert float(loss) > float(loss0)


def test_pretrained_encoder_loads_into_finetune_heads():
    """The pretraining handoff: AVHuBERTForPretraining's encoder subtree
    ('avhubert/...') is name- and shape-compatible with the fine-tune
    heads, so partial_load transfers every encoder leaf (the fairseq
    'load pretrained AV-HuBERT then fine-tune' flow, reference
    avsl/modules/av_hubert_model.py:154-233, without fairseq)."""
    from avsl_tpu.models.avhubert import AVHuBERTForCTC
    from avsl_tpu.train.checkpoints import partial_load

    cfg = _audio_cfg()
    _, pre_vars, audio, targets = _init_and_forward(cfg)

    def flatten(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            key = f"{prefix}{k}"
            if isinstance(v, dict):
                out.update(flatten(v, key + "/"))
            else:
                out[key] = np.asarray(v)
        return out

    pre_flat = flatten(pre_vars["params"])

    ctc = AVHuBERTForCTC(cfg)
    ctc_vars = ctc.init(jax.random.PRNGKey(1), audio=audio)
    new_params, report = partial_load(ctc_vars["params"], pre_flat)

    n_encoder = sum(1 for k in pre_flat if k.startswith("avhubert/"))
    assert n_encoder > 0
    loaded_enc = [k for k in report["loaded"] if k.startswith("avhubert/")]
    assert len(loaded_enc) == n_encoder, (
        f"{len(loaded_enc)}/{n_encoder} encoder leaves transferred; "
        f"missing={report['missing'][:5]}"
    )
    # head-only leaves are the expected triage remainder
    assert all(k.startswith(("final_proj", "label_embs"))
               for k in report["unexpected"])
    assert all(k.startswith("ctc_head") for k in report["missing"])
    # a transferred leaf actually changed the target tree
    k0 = loaded_enc[0]
    parts = k0.split("/")
    node = new_params
    for piece in parts:
        node = node[piece]
    np.testing.assert_array_equal(np.asarray(node), pre_flat[k0])


def test_output_layer_tap_semantics():
    """fairseq extract_features(output_layer=k): 1-indexed intermediate
    tap, same shape as the full pass, per-layer distinct, and skipping the
    final LayerNorm (layer_norm_first stacks)."""
    from avsl_tpu.models.avhubert import AVHuBERTModel

    cfg = _audio_cfg()
    m = AVHuBERTModel(cfg)
    aud = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 16, cfg.audio_feat_dim)),
        jnp.float32,
    )
    v = m.init(jax.random.PRNGKey(0), audio=aud)
    full = np.asarray(m.apply(v, audio=aud, deterministic=True))
    l1 = np.asarray(m.apply(v, audio=aud, deterministic=True, output_layer=1))
    l2 = np.asarray(m.apply(v, audio=aud, deterministic=True, output_layer=2))
    assert full.shape == l1.shape == l2.shape
    assert not np.allclose(l1, l2)
    assert not np.allclose(l2, full)  # tap skips ln_post
    # extract_features alias exposes the same tap
    alias = np.asarray(m.apply(v, audio=aud, method=m.extract_features,
                               output_layer=1))
    np.testing.assert_allclose(alias, l1, rtol=1e-6)


def test_extract_layer_features_helper():
    cfg = _audio_cfg()
    model, variables, audio, targets = _init_and_forward(cfg)
    from avsl_tpu.models.pretrain import extract_layer_features

    feats = extract_layer_features(model, variables, 1, audio=audio)
    assert feats.shape == (B, T, cfg.hidden_size)
    assert np.isfinite(np.asarray(feats)).all()
    # deterministic + unmasked: two calls agree
    feats2 = extract_layer_features(model, variables, 1, audio=audio)
    np.testing.assert_array_equal(np.asarray(feats), np.asarray(feats2))
