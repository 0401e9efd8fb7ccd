"""TrainerRunner behavior tests: early stopping on a plateaued
``val/wer_av`` and best-checkpoint reload for the final test evaluation.

Reference semantics: EarlyStoppingCallback patience 5 (whisper_ft.py:427)
and ``trainer.test`` on the best checkpoint
(whisper_flamingo_ft_ami.py:1027-1034)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from avsl_tpu.train import TrainState
from avsl_tpu.train.runner import TrainerRunner


class FakeTokenizer:
    eot = 9
    special_token_set = {9}

    def decode(self, ids):
        return " ".join(str(i) for i in ids)


class Cfg:
    gradient_accumulation_steps = 1
    early_stop_patience = 2
    resume_training = False


GOOD_UNTIL = 2  # eval is perfect while state.step <= this, garbage after
VOCAB = 10


def _runner(tmp_path):
    def loss_fn(params, batch_stats, batch, rng):
        loss = jnp.mean((params["w"] - batch["x"]) ** 2)
        return loss, ({}, batch_stats)

    # eval quality is a function of the evaluated STATE's step counter:
    # restoring an earlier checkpoint therefore visibly restores the
    # earlier (better) eval behavior.
    def eval_logits(state, batch):
        labels = batch["labels"]
        good = jax.nn.one_hot(labels, VOCAB) * 10.0
        bad = jax.nn.one_hot((labels + 3) % 8, VOCAB) * 10.0
        return jnp.where(state.step <= GOOD_UNTIL, good, bad)

    tx = optax.adam(0.1)
    state = TrainState.create({"w": jnp.zeros(())}, tx)
    return TrainerRunner(
        loss_fn, eval_logits, tx, state, FakeTokenizer(), Cfg(),
        log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "ckpt"),
    )


def _train_batches(epoch=0):
    def it():
        for _ in range(100):
            yield {"x": np.ones((4,), np.float32)}
    return it()


def _val_batches():
    return iter([{"labels": np.asarray([[1, 2, 3, 9]]),
                  "x": np.ones((1,), np.float32)}])


def test_early_stop_and_best_ckpt_reload(tmp_path):
    runner = _runner(tmp_path)
    result = runner.fit(
        train_batches=_train_batches,
        val_batches=_val_batches,
        num_steps=20,
        validate_every=1,
    )
    # evals: step 1 wer=0 (best), step 2 wer=0 (no improvement, count 1),
    # step 3 wer=1 (count 2 == patience) -> stop well before num_steps
    assert result["final_step"] < 20
    assert result["best_wer"] == pytest.approx(0.0)
    assert result["best_step"] == 1
    # the in-memory (stopped) state is past GOOD_UNTIL -> its eval is bad
    live = runner.eval_logits_fn(runner.state, next(_val_batches()))
    assert int(runner.state.step) > GOOD_UNTIL

    # test_best must evaluate the BEST step's weights, not the live ones
    m = runner.test_best(_val_batches)
    assert m["test/wer_av"] == pytest.approx(0.0)
    assert m["test/cer_av"] == pytest.approx(0.0)


def test_best_ckpt_survives_rolling_gc(tmp_path):
    """The rolling checkpoint dir keeps only max_to_keep=3 steps; with
    patience larger than that, the best step is garbage-collected from it
    before early stopping fires. test_best must still restore the best
    weights (pinned in ckpt_dir/best), not silently fall back to the
    stopped state."""
    runner = _runner(tmp_path)
    runner.early_stop_patience = 5
    result = runner.fit(
        train_batches=_train_batches,
        val_batches=_val_batches,
        num_steps=20,
        validate_every=1,
    )
    # evals at steps 1..7: best at 1, then 1 same + 5 worse -> stop at 7;
    # rolling dir retains only the last 3 steps, so step 1 is GC'd there
    assert result["best_step"] == 1
    assert result["final_step"] >= 6
    from avsl_tpu.train.checkpoints import latest_step

    assert latest_step(str(tmp_path / "ckpt")) > 3

    m = runner.test_best(_val_batches)
    assert m["test/wer_av"] == pytest.approx(0.0)  # best (step-1) behavior


def test_no_early_stop_when_disabled(tmp_path):
    runner = _runner(tmp_path)
    runner.early_stop_patience = 0
    result = runner.fit(
        train_batches=_train_batches,
        val_batches=_val_batches,
        num_steps=8,
        validate_every=1,
    )
    assert result["final_step"] == 8


def test_runner_with_ctc_predictions_fn(tmp_path):
    """evaluate_wer/TrainerRunner accept a pluggable predictions_fn (CTC
    best-path): ragged decoded rows flow through WER computation."""
    from avsl_tpu.decode import ctc_best_path
    from avsl_tpu.train.runner import evaluate_wer

    V, BLANK = 10, 0

    def predict_logits(batch):
        # frame-level peaked logits spelling each label with repeats/blanks
        b = batch["labels"].shape[0]
        frames = []
        for i in range(b):
            row = []
            for t in [int(x) for x in batch["labels"][i] if x >= 0]:
                row += [t, t, BLANK]
            frames.append(row)
        T = max(len(r) for r in frames)
        logits = np.full((b, T, V), -5.0, np.float32)
        for i, row in enumerate(frames):
            for t, c in enumerate(row):
                logits[i, t, c] = 5.0
        return logits

    labels = np.asarray([[1, 2, 3, 9], [4, 5, 9, -100]])
    m = evaluate_wer(
        predict_logits,
        iter([{"labels": labels}]),
        FakeTokenizer(),
        predictions_fn=lambda lg: ctc_best_path(lg, blank_id=BLANK),
    )
    assert m["val/wer_av"] == pytest.approx(0.0)


def test_runner_enters_sp_scope_on_model_parallel_mesh(tmp_path):
    """ADVICE round-2: a step first traced outside the activation-sharding
    scope silently runs without sequence parallelism forever. Round 4 made
    the scope part of the traced step body (make_train_step), so the
    runner's FIRST train_step call (the tracing one) must see the scope
    active whenever the mesh has a model axis > 1 — regardless of the
    caller's context."""
    from avsl_tpu.core import mesh as mesh_mod
    from avsl_tpu.core.mesh import make_mesh

    seen = []

    def loss_fn(params, batch_stats, batch, rng):
        # records whether the scope was active while this traced
        seen.append(mesh_mod._ACTIVATION_MESH is not None)
        return jnp.mean((params["w"] - batch["x"]) ** 2), ({}, batch_stats)

    tx = optax.adam(0.1)
    state = TrainState.create({"w": jnp.zeros(())}, tx)
    mesh = make_mesh(4, model_parallel=2)
    runner = TrainerRunner(
        loss_fn, lambda s, b: jnp.zeros((1, 1, VOCAB)), tx, state,
        FakeTokenizer(), Cfg(), mesh=mesh,
        log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "ckpt"),
    )
    runner.fit(lambda e: _train_batches(e), None, num_steps=1)
    assert seen and seen[0], "first trace happened outside the SP scope"

    # dp-only mesh: scope must NOT be entered (module global untouched)
    seen.clear()
    runner2 = TrainerRunner(
        loss_fn, lambda s, b: jnp.zeros((1, 1, VOCAB)), tx,
        TrainState.create({"w": jnp.zeros(())}, tx),
        FakeTokenizer(), Cfg(), mesh=make_mesh(4, model_parallel=1),
        log_dir=str(tmp_path / "logs2"), ckpt_dir=str(tmp_path / "ckpt2"),
    )
    runner2.fit(lambda e: _train_batches(e), None, num_steps=1)
    assert seen and not seen[0]


def test_preemption_checkpoint_and_resume(tmp_path):
    """SIGTERM mid-training must checkpoint at the next step boundary,
    exit cleanly with preempted=True, and the run must resume from that
    step (reference parity target: Lightning's last.ckpt cadence loses up
    to a validation interval; here at most one step)."""
    import os
    import signal

    calls = {"n": 0}

    def loss_fn(params, batch_stats, batch, rng):
        return jnp.mean((params["w"] - batch["x"]) ** 2), ({}, batch_stats)

    tx = optax.adam(0.1)
    runner = TrainerRunner(
        loss_fn, lambda s, b: jnp.zeros((1, 1, VOCAB)), tx,
        TrainState.create({"w": jnp.zeros(())}, tx),
        FakeTokenizer(), Cfg(),
        log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "ckpt"),
    )

    def batches(epoch=0):
        def it():
            for i in range(100):
                calls["n"] += 1
                if calls["n"] == 3:  # deliver SIGTERM mid-run
                    os.kill(os.getpid(), signal.SIGTERM)
                yield {"x": np.ones((4,), np.float32)}
        return it()

    out = runner.fit(batches, None, num_steps=50)
    assert out["preempted"] is True
    assert 0 < out["final_step"] < 50

    # resume picks up from the checkpointed step
    class ResumeCfg(Cfg):
        resume_training = True

    runner2 = TrainerRunner(
        loss_fn, lambda s, b: jnp.zeros((1, 1, VOCAB)), tx,
        TrainState.create({"w": jnp.zeros(())}, tx),
        FakeTokenizer(), ResumeCfg(),
        log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "ckpt"),
    )
    assert runner2.maybe_resume() == out["final_step"]
    # the handler must have been removed after fit()
    import signal as _s
    assert _s.getsignal(_s.SIGTERM) in (_s.SIG_DFL, _s.default_int_handler)


def test_runner_partitioned_state_trains_and_resumes_elastic(tmp_path, eight_devices):
    """partitioned_state=True must (a) train numerically identically to the
    replicated runner, (b) keep TP-ruled params actually sharded over the
    "model" axis across steps, and (c) resume through restore_sharded onto a
    DIFFERENT topology than the one that saved (elastic resume — the
    capability the reference's rank-0 Lightning ckpts cannot express,
    whisper_flamingo_ft_ami.py:1000-1020)."""
    from avsl_tpu.core.mesh import make_mesh
    from jax.sharding import PartitionSpec as P

    def loss_fn(params, batch_stats, batch, rng):
        pred = batch["x"] @ params["enc"]["q_proj"]["kernel"]
        return jnp.mean((pred - batch["y"]) ** 2), ({}, batch_stats)

    def make_state(tx):
        k = jax.random.normal(jax.random.PRNGKey(0), (8, 8)) * 0.1
        return TrainState.create({"enc": {"q_proj": {"kernel": k}}}, tx)

    def batches(epoch=0):
        rng = np.random.RandomState(17 + epoch)
        def it():
            for _ in range(10):
                x = rng.randn(8, 8).astype(np.float32)
                yield {"x": x, "y": (x @ np.eye(8, dtype=np.float32))}
        return it()

    class ResumeCfg(Cfg):
        resume_training = True

    dummy_eval = lambda s, b: jnp.zeros((1, 1, VOCAB))

    # (a)+(b): partitioned dp=4 x tp=2 vs replicated, same data
    tx = optax.adam(0.05)
    part = TrainerRunner(
        loss_fn, dummy_eval, tx, make_state(tx), FakeTokenizer(), Cfg(),
        mesh=make_mesh(8, model_parallel=2), partitioned_state=True,
        log_dir=str(tmp_path / "lp"), ckpt_dir=str(tmp_path / "ckpt"),
    )
    out = part.fit(batches, None, num_steps=3)
    kernel = part.state.params["enc"]["q_proj"]["kernel"]
    assert kernel.sharding.spec == P(None, "model")
    assert kernel.addressable_shards[0].data.shape == (8, 4)

    tx2 = optax.adam(0.05)
    repl = TrainerRunner(
        loss_fn, dummy_eval, tx2, make_state(tx2), FakeTokenizer(), Cfg(),
        log_dir=str(tmp_path / "lr"), ckpt_dir=str(tmp_path / "ckpt_r"),
    )
    repl.fit(batches, None, num_steps=3)
    np.testing.assert_allclose(
        np.asarray(kernel),
        np.asarray(repl.state.params["enc"]["q_proj"]["kernel"]),
        rtol=2e-5, atol=2e-6,
    )

    # (c): resume the dp=4 x tp=2 checkpoint onto dp=2 x tp=4
    tx3 = optax.adam(0.05)
    resumed = TrainerRunner(
        loss_fn, dummy_eval, tx3, make_state(tx3), FakeTokenizer(), ResumeCfg(),
        mesh=make_mesh(8, model_parallel=4), partitioned_state=True,
        log_dir=str(tmp_path / "le"), ckpt_dir=str(tmp_path / "ckpt"),
    )
    assert resumed.maybe_resume() == out["final_step"]
    rk = resumed.state.params["enc"]["q_proj"]["kernel"]
    assert rk.sharding.spec == P(None, "model")
    assert rk.addressable_shards[0].data.shape == (8, 2)
    np.testing.assert_array_equal(np.asarray(rk), np.asarray(kernel))
    # adam state came back sharded too
    mu = resumed.state.opt_state[0].mu["enc"]["q_proj"]["kernel"]
    assert mu.sharding.spec == P(None, "model")
