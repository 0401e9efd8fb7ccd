"""Structural parameter freezing in the train step.

The reference freezes via ``requires_grad=False``
(whisper_flamingo_ft_ami.py:506-517), which in torch autograd means NO
backward graph is built through frozen-only subgraphs. The TPU-native
equivalent: ``make_train_step(param_labels=...)`` differentiates only the
trainable subtree (train/loop.py split_trainable), so XLA dead-code
eliminates e.g. the whole AV-HuBERT frontend backward under the flamingo
regime. These tests pin that the structural path takes the SAME training
trajectory as the label-less step (whose optimizer zeroes frozen updates).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsl_tpu.models.factory import build_whisper_flamingo
from avsl_tpu.train import TrainState, make_train_step
from avsl_tpu.train.loop import merge_trainable, split_trainable
from avsl_tpu.train.objectives import flamingo_loss_fn
from avsl_tpu.train.optim import FROZEN, TRAIN, select_optimizer


class _Cfg:
    learning_rate = 1e-3
    warmup_steps = 1
    weight_decay = 0.01
    adam_epsilon = 1e-8
    add_gated_x_attn = 1
    video_projection_train_only = False
    freeze_video_model = True


def _setup(accum=1, micro=2, t_mel=8, t_vid=2, label_len=4):
    model, cfg = build_whisper_flamingo("test", add_gated_x_attn=1,
                                        dtype="float32")
    shape = (lambda *s: (accum, micro, *s)) if accum > 1 \
        else (lambda *s: (micro, *s))
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    batch = {
        "input_ids": 0.1 * jax.random.normal(k1, shape(cfg.n_mels, t_mel)),
        "video": jax.random.normal(k2, shape(t_vid, 88, 88, 1)),
        "dec_input_ids": jax.random.randint(
            k3, shape(label_len), 0, cfg.n_vocab - 2
        ).astype(jnp.int32),
    }
    batch["labels"] = jnp.concatenate(
        [batch["dec_input_ids"][..., 1:],
         jnp.full(shape(label_len)[:-1] + (1,), cfg.n_vocab - 1, jnp.int32)],
        axis=-1,
    )
    one = jax.tree_util.tree_map(lambda x: x[0] if accum > 1 else x, batch)
    variables = model.init(
        jax.random.PRNGKey(1), one["input_ids"], one["dec_input_ids"],
        video=one["video"],
    )
    params = variables["params"]
    tx, labels = select_optimizer(params, _Cfg(), t_total=10)
    loss_fn = flamingo_loss_fn(model, train=False)
    state = TrainState.create(
        params, tx, batch_stats=variables.get("batch_stats")
    )
    return loss_fn, tx, labels, state, batch


def test_split_merge_roundtrip():
    params = {"a": {"w": jnp.ones((2, 2)), "b": jnp.zeros(3)},
              "c": jnp.arange(4.0)}
    labels = {"a": {"w": TRAIN, "b": FROZEN}, "c": FROZEN}
    tr, fr = split_trainable(params, labels)
    assert tr["a"]["b"] is None and tr["c"] is None
    assert fr["a"]["w"] is None
    merged = merge_trainable(tr, fr)
    assert jax.tree_util.tree_structure(merged) == \
        jax.tree_util.tree_structure(params)
    for a, b in zip(jax.tree_util.tree_leaves(merged),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("accum", [1, 2])
def test_structural_freeze_matches_masked_step(accum):
    loss_fn, tx, labels, state0, batch = _setup(accum=accum)
    step_masked = make_train_step(loss_fn, tx, grad_accum_steps=accum,
                                  donate=False)
    step_struct = make_train_step(loss_fn, tx, grad_accum_steps=accum,
                                  donate=False, param_labels=labels)

    s_m, m_m = step_masked(state0, batch)
    s_s, m_s = step_struct(state0, batch)

    np.testing.assert_allclose(
        float(m_m["loss"]), float(m_s["loss"]), rtol=1e-6)
    # the structural step's grad_norm counts ONLY trainable grads (frozen
    # ones are never computed); the masked step's includes the frozen
    # grads it computes and then discards
    assert float(m_s["grad_norm"]) <= float(m_m["grad_norm"]) + 1e-6

    flat_m = jax.tree_util.tree_leaves_with_path(s_m.params)
    flat_s = dict(jax.tree_util.tree_leaves_with_path(s_s.params))
    flat_0 = dict(jax.tree_util.tree_leaves_with_path(state0.params))
    flat_l = dict(jax.tree_util.tree_leaves_with_path(labels))
    n_train = n_frozen = 0
    for path, leaf_m in flat_m:
        leaf_s, leaf_0 = flat_s[path], flat_0[path]
        np.testing.assert_allclose(
            np.asarray(leaf_m), np.asarray(leaf_s), rtol=1e-5, atol=1e-7,
            err_msg=f"{path} diverged between masked and structural steps",
        )
        if flat_l[path] == FROZEN:
            np.testing.assert_array_equal(
                np.asarray(leaf_s), np.asarray(leaf_0),
                err_msg=f"frozen {path} changed",
            )
            n_frozen += 1
        else:
            n_train += 1
    assert n_train > 0 and n_frozen > 0


def test_structural_freeze_trains_trainable():
    loss_fn, tx, labels, state0, batch = _setup()
    step = make_train_step(loss_fn, tx, donate=False, param_labels=labels)
    s1, _ = step(state0, batch)
    s1, _ = step(s1, batch)  # step 0 is inside the lr warmup (lr == 0)
    flat_0 = dict(jax.tree_util.tree_leaves_with_path(state0.params))
    flat_l = dict(jax.tree_util.tree_leaves_with_path(labels))
    changed = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(s1.params):
        if flat_l[path] == TRAIN and not np.allclose(
            np.asarray(leaf), np.asarray(flat_0[path])
        ):
            changed += 1
    assert changed > 0, "no trainable parameter moved"


def test_frontend_accepts_4d_video():
    """[B,T,H,W] and [B,T,H,W,1] video produce identical features (the 4D
    wire format exists to avoid a 256x-padded 5D remat residual)."""
    from avsl_tpu.core.config import AVHuBERTConfig
    from avsl_tpu.models.resnet3d import ResNet3DFrontend

    fe = ResNet3DFrontend(frontend_channels=8, backbone_channels=16,
                          dtype=jnp.float32)
    v5 = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 32, 32, 1))
    variables = fe.init(jax.random.PRNGKey(1), v5, True)
    out5 = fe.apply(variables, v5, True)
    out4 = fe.apply(variables, v5[..., 0], True)
    np.testing.assert_allclose(np.asarray(out5), np.asarray(out4))

    # end-to-end through the flamingo model
    model, cfg = build_whisper_flamingo("test", add_gated_x_attn=1,
                                        dtype="float32")
    mel = 0.1 * jax.random.normal(jax.random.PRNGKey(2), (1, cfg.n_mels, 8))
    dec = jnp.zeros((1, 4), jnp.int32)
    vid = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 88, 88, 1))
    variables = model.init(jax.random.PRNGKey(4), mel, dec, video=vid)
    l5 = model.apply(variables, mel, dec, video=vid)
    l4 = model.apply(variables, mel, dec, video=vid[..., 0])
    np.testing.assert_allclose(np.asarray(l5), np.asarray(l4))
