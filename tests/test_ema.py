"""Parameter EMA + checkpoint averaging (train/ema.py, cli.avg_ckpt).

The reference keeps only raw Lightning top-k checkpoints; these are the
weight-averaging tools it lacks. Tests: exact EMA arithmetic, uniform
soup math, orbax round-trip through the CLI, and step/opt-state
provenance from the newest contributor.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from avsl_tpu.train.ema import average_checkpoint_steps, ema_update, tree_average


def test_ema_update_exact():
    ema = {"w": jnp.ones((3,)), "step": jnp.asarray(0, jnp.int32)}
    new = {"w": jnp.full((3,), 3.0), "step": jnp.asarray(7, jnp.int32)}
    out = ema_update(ema, new, decay=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 1.0 * 0.9 + 3.0 * 0.1)
    assert int(out["step"]) == 7  # int leaves pass through from new


def test_ema_converges_to_constant_target():
    ema = {"w": jnp.zeros(())}
    tgt = {"w": jnp.asarray(5.0)}
    for _ in range(300):
        ema = ema_update(ema, tgt, decay=0.95)
    assert abs(float(ema["w"]) - 5.0) < 1e-4


def test_tree_average_math_and_dtype():
    trees = [
        {"a": jnp.asarray([1.0, 2.0], jnp.bfloat16), "n": jnp.asarray(3)},
        {"a": jnp.asarray([3.0, 6.0], jnp.bfloat16), "n": jnp.asarray(9)},
    ]
    avg = tree_average(trees)
    np.testing.assert_allclose(
        np.asarray(avg["a"], np.float32), [2.0, 4.0]
    )
    assert avg["a"].dtype == jnp.bfloat16  # accumulated f32, cast back
    assert int(avg["n"]) == 3  # non-float: first tree
    with pytest.raises(ValueError):
        tree_average([])


def test_average_checkpoint_steps_roundtrip(tmp_path):
    from avsl_tpu.train.checkpoints import save_checkpoint
    from avsl_tpu.train.loop import TrainState

    def mk(val, step):
        params = {"dense": {"kernel": jnp.full((4, 2), val)}}
        st = TrainState.create(params, optax.adam(1e-3))
        return st.replace(step=step)

    d = str(tmp_path / "ckpt")
    for val, step in [(1.0, 10), (2.0, 20), (6.0, 30)]:
        save_checkpoint(d, mk(val, step), step=step)

    template = mk(0.0, 0)
    soup, used = average_checkpoint_steps(d, template)
    np.testing.assert_allclose(
        np.asarray(soup.params["dense"]["kernel"]), 3.0
    )
    assert int(soup.step) == 30  # provenance: newest contributor
    assert used == [10, 20, 30]

    soup2, _ = average_checkpoint_steps(d, template, steps=[10, 30])
    np.testing.assert_allclose(
        np.asarray(soup2.params["dense"]["kernel"]), 3.5
    )
    soup3, used3 = average_checkpoint_steps(d, template, last_k=2)
    np.testing.assert_allclose(
        np.asarray(soup3.params["dense"]["kernel"]), 4.0
    )
    with pytest.raises(ValueError, match="not in"):
        average_checkpoint_steps(d, template, steps=[10, 99])


@pytest.mark.slow
def test_avg_ckpt_cli_smoke(tmp_path):
    """CLI end-to-end on the tiny flamingo state: save two perturbed
    checkpoints with the CLI's own template builder, average, verify the
    written soup restores to the exact mean."""
    from avsl_tpu.cli.avg_ckpt import build_state, main
    from avsl_tpu.core.config import FlamingoTrainConfig
    from avsl_tpu.train.checkpoints import restore_checkpoint, save_checkpoint

    cfg = FlamingoTrainConfig()
    cfg.model_name = "test"
    cfg.audio_max_length = 16000
    base = build_state(cfg, smoke=True)
    d = str(tmp_path / "ckpt")
    for delta, step in [(0.0, 1), (0.5, 2)]:
        st = base.replace(
            params=jax.tree_util.tree_map(lambda x: x + delta, base.params),
            step=step,
        )
        save_checkpoint(d, st, step=step)
    out = str(tmp_path / "soup")
    main(["--ckpt_dir", d, "--output", out, "--smoke"])
    restored = restore_checkpoint(out, base, step=2)
    expect = jax.tree_util.tree_map(lambda x: x + 0.25, base.params)
    flat_r = jax.tree_util.tree_leaves(restored.params)
    flat_e = jax.tree_util.tree_leaves(expect)
    for r, e in zip(flat_r, flat_e):
        np.testing.assert_allclose(
            np.asarray(r, np.float32), np.asarray(e, np.float32),
            rtol=1e-5, atol=1e-5,
        )


def test_runner_validates_and_pins_best_with_ema(tmp_path):
    """With cfg.ema_decay set: (a) validation sees the EMA weights (raw
    params have left the good region, the lagging EMA has not -> WER
    stays 0), (b) the pinned best checkpoint carries the EMA tree while
    the rolling checkpoint keeps the raw iterate."""
    from avsl_tpu.train.checkpoints import restore_checkpoint
    from avsl_tpu.train.loop import TrainState
    from avsl_tpu.train.runner import TrainerRunner

    class Tok:
        eot = 9
        special_token_set = {9}

        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    class Cfg:
        gradient_accumulation_steps = 1
        early_stop_patience = 0
        resume_training = False
        ema_decay = 0.98

    VOCAB = 10

    def loss_fn(params, batch_stats, batch, rng):
        # pulls w toward 1.0 quickly (adam, lr 0.2)
        return jnp.mean((params["w"] - batch["x"]) ** 2), ({}, batch_stats)

    def eval_logits(state, batch):
        # good predictions only while the EVALUATED weights stay near 0:
        # the raw iterate crosses 0.5 in a few steps, the EMA must not
        labels = batch["labels"]
        good = jax.nn.one_hot(labels, VOCAB) * 10.0
        bad = jax.nn.one_hot((labels + 3) % 8, VOCAB) * 10.0
        return jnp.where(state.params["w"] < 0.5, good, bad)

    tx = optax.adam(0.2)
    state = TrainState.create({"w": jnp.zeros(())}, tx)
    runner = TrainerRunner(
        loss_fn, eval_logits, tx, state, Tok(), Cfg(),
        log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "ckpt"),
    )

    def train_batches(epoch=0):
        def it():
            for _ in range(100):
                yield {"x": np.ones((4,), np.float32)}
        return it()

    def val_batches():
        return iter([{"labels": np.asarray([[1, 2, 3, 9]]),
                      "x": np.ones((1,), np.float32)}])

    result = runner.fit(
        train_batches=train_batches, val_batches=val_batches,
        num_steps=8, validate_every=8,
    )
    raw_w = float(runner.state.params["w"])
    ema_w = float(runner._ema_params["w"])
    assert raw_w > 0.5 and ema_w < 0.5, (raw_w, ema_w)
    assert result["best_wer"] == 0.0  # validation saw the EMA weights

    best = restore_checkpoint(
        str(tmp_path / "ckpt" / "best"), runner.state, step=8
    )
    np.testing.assert_allclose(float(best.params["w"]), ema_w, rtol=1e-6)
    rolling = restore_checkpoint(str(tmp_path / "ckpt"), runner.state, step=8)
    np.testing.assert_allclose(float(rolling.params["w"]), raw_w, rtol=1e-6)


def test_restore_params_only_ignores_optimizer_structure(tmp_path):
    """Tooling CLIs restore checkpoints written with arbitrary optimizers
    (adamw here) without reconstructing the opt_state tree."""
    from avsl_tpu.train.checkpoints import restore_params_only, save_checkpoint
    from avsl_tpu.train.loop import TrainState

    params = {"dense": {"kernel": jnp.full((3, 2), 2.5)}}
    st = TrainState.create(params, optax.adamw(1e-3))
    d = str(tmp_path / "ck")
    save_checkpoint(d, st, step=4)
    out = restore_params_only(d)
    np.testing.assert_allclose(
        np.asarray(out["params"]["dense"]["kernel"]), 2.5
    )
    assert "opt_state" not in out
    assert restore_params_only(str(tmp_path / "nothing")) is None
