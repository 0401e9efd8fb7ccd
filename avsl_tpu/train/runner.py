"""High-level training runner: the Lightning-Trainer role, TPU-native.

Drives the SPMD train step (train/loop.py) with: YAML-config semantics of
the reference trainer (avsl/whisper_flamingo_ft_ami.py:705-1034 in
/root/reference) — step budget, warmup, grad accumulation, periodic
teacher-forced validation with jiwer-normalized WER/CER, best-checkpoint
tracking on ``val/wer_av``, last-checkpoint resume — expressed as a plain
Python loop around jit-compiled steps. Metrics go to TensorBoard via
tf.summary when TensorFlow is importable, else to a JSONL file.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Dict, Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from avsl_tpu.decode.greedy import teacher_forced_predictions
from avsl_tpu.decode.text_norm import normalize_text, wer_cer
from avsl_tpu.train.checkpoints import (
    latest_step,
    restore_checkpoint,
    restore_sharded,
    save_checkpoint,
)
from avsl_tpu.train.loop import TrainState, make_train_step


class MetricLogger:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._tb = None
        try:
            import tensorflow as tf  # noqa: F401

            self._tb = tf.summary.create_file_writer(log_dir)
        except Exception:
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(k, float(v), step=step)
                self._tb.flush()
        else:
            self._jsonl.write(json.dumps({"step": step, **{k: float(v) for k, v in metrics.items()}}) + "\n")
            self._jsonl.flush()


def setup_logging_and_checkpoint(
    log_dir: str, ckpt_dir: str, name: str, run_id: str, monitor: str = "val/wer_av"
):
    """(logger, ckpt_dir, monitor) wiring — the external fork's
    setup_logging_and_checkpoint contract (SURVEY.md §2.7; call site
    whisper_flamingo_ft_ami.py:762-766)."""
    full_log = os.path.join(log_dir, name, run_id)
    full_ckpt = os.path.join(ckpt_dir, name, run_id)
    os.makedirs(full_ckpt, exist_ok=True)
    return MetricLogger(full_log), full_ckpt, monitor


def evaluate_wer(
    predict_logits: Callable[[Dict[str, Any]], jnp.ndarray],
    batches: Iterable[Dict[str, Any]],
    tokenizer,
    max_batches: Optional[int] = None,
    prefix: str = "val",
    predictions_fn: Optional[Callable[[Any], Any]] = None,
) -> Dict[str, float]:
    """Teacher-forced argmax eval with EOT masking + corpus WER/CER
    (reference validation semantics, whisper_flamingo_ft_ami.py:558-634).

    ``predictions_fn(logits) -> token rows`` overrides the seq2seq
    teacher-forced argmax (e.g. ``decode.ctc_best_path`` for the CTC
    head, whose rows may be ragged lists)."""
    hyps, refs = [], []
    losses = []
    special = tokenizer.special_token_set
    for bi, batch in enumerate(batches):
        if max_batches is not None and bi >= max_batches:
            break
        logits = predict_logits(batch)
        if predictions_fn is not None:
            tokens = predictions_fn(logits)
        else:
            tokens = np.asarray(
                teacher_forced_predictions(logits, tokenizer.eot)
            )
            # true validation loss: teacher-forced CE over the non-pad
            # label positions (labels < 0 are padding). Only meaningful
            # on the seq2seq path where logits align with labels.
            lab = np.asarray(batch["labels"])
            lg = np.asarray(logits, np.float32)
            if lg.ndim == 3 and lg.shape[:2] == lab.shape:
                m = lab >= 0
                if m.any():
                    row = lg - lg.max(-1, keepdims=True)
                    lse = row - np.log(np.exp(row).sum(-1, keepdims=True))
                    ll = np.take_along_axis(
                        lse, np.maximum(lab, 0)[..., None], -1
                    )[..., 0]
                    losses.append(float(-(ll * m).sum() / m.sum()))
        labels = np.asarray(batch["labels"])
        for o_row, l_row in zip(tokens, labels):
            o_ids = [int(t) for t in o_row if int(t) >= 0 and int(t) not in special]
            l_ids = [int(t) for t in l_row if int(t) >= 0 and int(t) not in special]
            hyps.append(normalize_text(tokenizer.decode(o_ids)))
            refs.append(normalize_text(tokenizer.decode(l_ids)))
    pairs = [(h, r) for h, r in zip(hyps, refs) if h.strip() or r.strip()]
    if not pairs:
        out = {f"{prefix}/wer_av": 1.0, f"{prefix}/cer_av": 1.0}
    else:
        wer, cer = wer_cer([h for h, _ in pairs], [r for _, r in pairs])
        out = {f"{prefix}/wer_av": wer, f"{prefix}/cer_av": cer}
    if losses:
        out[f"{prefix}/loss"] = float(np.mean(losses))
    return out


class TrainerRunner:
    """Step-budgeted training with periodic validation + checkpointing."""

    def __init__(
        self,
        loss_fn,
        eval_logits_fn: Callable[[Any, Dict[str, Any]], jnp.ndarray],
        tx,
        init_state: TrainState,
        tokenizer,
        cfg,
        mesh=None,
        log_dir: str = "output/train",
        ckpt_dir: str = "checkpoints/run",
        grad_accum_steps: Optional[int] = None,
        predictions_fn=None,
        partitioned_state: bool = False,
        zero1: bool = False,
        fsdp: bool = False,
        param_labels=None,
        precompute_fn=None,
    ):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.mesh = mesh
        # tensor/expert-parallel state: the init state is device_put into
        # the core.partitioning rule layout, the train step propagates
        # those input shardings (no forced replication), and every
        # checkpoint restore goes through restore_sharded so a resumed run
        # lands directly in the mesh layout — including on a DIFFERENT
        # topology than the one that saved (elastic resume).
        # zero1=True additionally splits the fp32 optimizer mirrors over
        # the data axis (core.partitioning.state_shardings) — ZeRO stage 1.
        # fsdp=True shards params AND mirrors over the data axis — ZeRO
        # stage 3 / fully-sharded data parallelism (subsumes zero1).
        self.fsdp = bool(fsdp) and mesh is not None
        self.zero1 = bool(zero1) and mesh is not None and not self.fsdp
        self.partitioned = (
            bool(partitioned_state) or self.zero1 or self.fsdp
        ) and mesh is not None
        # grad_accum_steps=1 + an optax.MultiSteps-wrapped tx accumulates
        # ACROSS successive batches (required for variable-size bucketed
        # batches); the default reshapes one big batch into micro-batches
        # and scans inside the jit (fixed-size batches only)
        self.accum = (
            int(grad_accum_steps)
            if grad_accum_steps is not None
            else int(getattr(cfg, "gradient_accumulation_steps", 1))
        )
        constraint_fn = None
        if self.zero1 or self.fsdp:
            from avsl_tpu.core.partitioning import state_shardings

            constraint_fn = lambda st: state_shardings(  # noqa: E731
                st, mesh, zero1=self.zero1, fsdp=self.fsdp
            )
        # param_labels (TRAIN/FROZEN tree from select_optimizer): the step
        # differentiates only the trainable subtree, so XLA never builds a
        # backward through frozen-only towers — the reference's
        # requires_grad=False freeze as torch actually executes it
        # precompute_fn (objectives.flamingo_tower_precompute): hoists the
        # FROZEN tower forwards out of the grad-accumulation scan, batched
        # over all micro-steps — callers gate it on the freeze regime
        # (cli/finetune.py checks the param_labels tree). Compiled as its
        # own program (split_precompute): numerically identical to fusing
        # it into the step, but two smaller programs compile predictably
        # (one giant hoisted step hit multi-10-minute pathological
        # compiles on tunneled backends) at one extra dispatch per step.
        if precompute_fn is not None:
            _step, _pre = make_train_step(
                loss_fn, tx, mesh=mesh, grad_accum_steps=self.accum,
                donate=False, partitioned_state=self.partitioned,
                state_constraint_fn=constraint_fn,
                param_labels=param_labels,
                precompute_fn=precompute_fn, split_precompute=True,
            )
            self.train_step = lambda s, b: _step(s, b, _pre(s, b))
        else:
            self.train_step = make_train_step(
                loss_fn, tx, mesh=mesh, grad_accum_steps=self.accum,
                donate=False, partitioned_state=self.partitioned,
                state_constraint_fn=constraint_fn,
                param_labels=param_labels,
            )
        if self.partitioned:
            from avsl_tpu.core.partitioning import shard_state

            init_state = shard_state(
                init_state, mesh, zero1=self.zero1, fsdp=self.fsdp
            )
        # sequence parallelism is part of the step functions themselves
        # (make_train_step enters the activation-sharding scope inside the
        # traced body) — the runner no longer wraps step calls
        self.eval_logits_fn = eval_logits_fn
        # logits -> token rows; None = seq2seq teacher-forced argmax.
        # Pass decode.ctc_best_path (wrapped) for the CTC head.
        self.predictions_fn = predictions_fn
        self.state = init_state
        # parameter EMA (cfg.ema_decay > 0, train/ema.py): validation and
        # the pinned best checkpoint use the averaged weights — typically
        # better than the raw iterate late in training — while the
        # ROLLING checkpoints keep the raw state so resume continues the
        # true trajectory. On resume the EMA restarts from the restored
        # raw params (the EMA tree itself is not checkpointed).
        self.ema_decay = float(getattr(cfg, "ema_decay", 0.0) or 0.0)
        self._ema_params = None
        if self.ema_decay > 0.0:
            import jax as _jax

            from avsl_tpu.train.ema import ema_update

            self._ema_params = init_state.params
            self._ema_step = _jax.jit(
                lambda e, p: ema_update(e, p, self.ema_decay)
            )
        self.logger = MetricLogger(log_dir)
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        self._best_dir = os.path.join(self.ckpt_dir, "best")
        self.best_wer = float("inf")
        self.best_step = -1
        # early stopping on the monitored metric (reference whisper_ft.py
        # uses EarlyStoppingCallback with patience 5); 0 disables
        self.early_stop_patience = int(getattr(cfg, "early_stop_patience", 0) or 0)
        self._evals_since_best = 0

    def _install_preemption_handler(self):
        """SIGTERM-safe training: TPU pods are preempted with SIGTERM; the
        reference relies on Lightning's last.ckpt cadence and loses up to
        a validation interval of work. Here the handler marks a flag, the
        step loop checkpoints at the next step boundary and exits cleanly
        (resumable via ``resume_training``). Returns a restore callable.
        No-op outside the main thread (signals only deliver there)."""
        import signal
        import threading

        self._preempted = False
        if threading.current_thread() is not threading.main_thread():
            return lambda: None

        def on_term(signum, frame):
            self._preempted = True

        prev = signal.signal(signal.SIGTERM, on_term)

        def restore():
            signal.signal(signal.SIGTERM, prev)

        return restore

    def _restore(self, directory: str, step: Optional[int]) -> TrainState:
        if self.partitioned:
            return restore_sharded(
                directory, self.state, self.mesh, step=step,
                zero1=self.zero1, fsdp=self.fsdp,
            )
        return restore_checkpoint(directory, self.state, step)

    def _reset_ema(self):
        if self._ema_params is not None:
            self._ema_params = self.state.params

    def maybe_resume(self) -> int:
        step = latest_step(self.ckpt_dir)
        if step is not None and getattr(self.cfg, "resume_training", False):
            self.state = self._restore(self.ckpt_dir, step)
            self._reset_ema()
            return step
        return 0

    def _reshape_accum(
        self, batch: Dict[str, np.ndarray]
    ) -> Optional[Dict[str, np.ndarray]]:
        """[B, ...] -> [accum, B//accum, ...] for the in-jit scan. A batch
        smaller than ``accum`` cannot form even one micro-batch — return
        None so fit() SKIPS it (drop_last semantics): passing it through
        unreshaped would feed the scan single samples with the batch dim
        stripped. Non-divisible batches drop the tail remainder."""
        if self.accum <= 1:
            return batch
        b = next(iter(batch.values())).shape[0]
        micro = b // self.accum
        if micro == 0:
            return None
        return {
            k: v[: micro * self.accum].reshape(self.accum, micro, *v.shape[1:])
            for k, v in batch.items()
        }

    def fit(
        self,
        train_batches: Callable[[int], Iterator[Dict[str, np.ndarray]]],
        val_batches: Optional[Callable[[], Iterator[Dict[str, np.ndarray]]]] = None,
        num_steps: Optional[int] = None,
        validate_every: Optional[int] = None,
        sanity_val_steps: int = 0,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        num_steps = num_steps or int(getattr(cfg, "num_train_steps", 1000))
        validate_every = validate_every or int(
            getattr(cfg, "validate_every_n_batches", 1000)
        )

        if sanity_val_steps and val_batches is not None:
            m = evaluate_wer(
                lambda b: self.eval_logits_fn(self.state, b),
                val_batches(), self.tokenizer, max_batches=sanity_val_steps,
                predictions_fn=self.predictions_fn,
            )
            self.logger.log(0, m)

        step = self.maybe_resume()
        epoch = 0
        it = train_batches(epoch)
        t0 = time.time()
        last_logged_step = step
        history = []
        restore_signal = self._install_preemption_handler()
        try:
            return self._fit_loop(
                it, train_batches, val_batches, step, epoch, num_steps,
                validate_every, t0, last_logged_step, history,
            )
        finally:
            # always reinstate the previous SIGTERM handler — leaking it
            # would keep this runner's closure (the full TrainState)
            # alive and shadow any embedding process's own handler
            restore_signal()

    def _fit_loop(self, it, train_batches, val_batches, step, epoch,
                  num_steps, validate_every, t0, last_logged_step, history):
        while step < num_steps:
            if self._preempted:
                save_checkpoint(self.ckpt_dir, self.state, step)
                self.logger.log(step, {"train/preempted": 1.0})
                break
            try:
                batch = next(it)
            except StopIteration:
                epoch += 1
                it = train_batches(epoch)
                continue
            reshaped = self._reshape_accum(batch)
            if reshaped is None:  # tail batch smaller than accum: drop_last
                continue
            self.state, metrics = self.train_step(self.state, reshaped)
            if self._ema_params is not None:
                self._ema_params = self._ema_step(
                    self._ema_params, self.state.params
                )
            step += 1
            if step % 10 == 0 or step == num_steps:
                logd = {f"train/{k}": float(v) for k, v in metrics.items()}
                logd["train/steps_per_sec"] = (
                    (step - last_logged_step) / max(time.time() - t0, 1e-6)
                )
                t0 = time.time()
                last_logged_step = step
                self.logger.log(step, logd)
                history.append((step, float(metrics["loss"])))
            if val_batches is not None and step % validate_every == 0:
                eval_state = (
                    self.state if self._ema_params is None
                    else self.state.replace(params=self._ema_params)
                )
                m = evaluate_wer(
                    lambda b: self.eval_logits_fn(eval_state, b),
                    val_batches(), self.tokenizer,
                    predictions_fn=self.predictions_fn,
                )
                m["val/train_loss"] = float(metrics["loss"])
                self.logger.log(step, m)
                wer = m.get("val/wer_av", 1.0)
                save_checkpoint(self.ckpt_dir, self.state, step)
                if wer < self.best_wer:
                    self.best_wer = wer
                    self.best_step = step
                    # pin the best step in its own directory: the rolling
                    # ckpt_dir keeps only max_to_keep steps, so by the
                    # time early stopping fires the best step would have
                    # been garbage-collected from it. With EMA active the
                    # pinned artifact carries the EVALUATED (averaged)
                    # weights — what you serve is what you validated.
                    save_checkpoint(self._best_dir, eval_state, step)
                    self._evals_since_best = 0
                else:
                    self._evals_since_best += 1
                    if (
                        self.early_stop_patience
                        and self._evals_since_best >= self.early_stop_patience
                    ):
                        break
        save_checkpoint(self.ckpt_dir, self.state, step)
        return {
            "final_step": step,
            "best_wer": self.best_wer,
            "best_step": self.best_step,
            "history": history,
            "preempted": self._preempted,
        }

    def test_best(
        self,
        test_batches: Callable[[], Iterator[Dict[str, np.ndarray]]],
        prefix: str = "test",
        max_batches: Optional[int] = None,
    ) -> Dict[str, float]:
        """Evaluate the BEST checkpoint (by monitored ``val/wer_av``) on a
        held-out split — the reference's ``trainer.test(ckpt_path='best')``
        flow (whisper_flamingo_ft_ami.py:1027-1034). Falls back to the
        latest checkpoint when no validation ever selected a best step,
        and to the in-memory state when no checkpoint exists at all."""
        step = self.best_step if self.best_step >= 0 else latest_step(self.ckpt_dir)
        state = self.state
        if step is not None and step >= 0:
            # the best step lives in its own pinned directory (the rolling
            # dir garbage-collects old steps); fall back to the rolling
            # dir for the plain latest-step case
            for directory in (self._best_dir, self.ckpt_dir):
                try:
                    state = self._restore(directory, step)
                    break
                except Exception:
                    continue
            else:
                print(f"warning: checkpoint for step {step} not restorable; "
                      "evaluating the in-memory (final) state instead")
                step = None
        m = evaluate_wer(
            lambda b: self.eval_logits_fn(state, b),
            test_batches(), self.tokenizer, max_batches=max_batches, prefix=prefix,
            predictions_fn=self.predictions_fn,
        )
        self.logger.log(step or 0, m)
        return m
