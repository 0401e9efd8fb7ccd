"""Distill a speculative-decoding draft model from a trained target.

    python -m avsl_tpu.cli.distill --input segs/ --config cfg.yaml \
        --ckpt_dir ckpts/flagship --draft_model tiny \
        --output ckpts/draft --steps 2000

Self-labeling distillation (train/distill.py): the target greedy-decodes
the input audio and the draft learns the target's teacher-forced
next-token distributions along those trajectories — exactly what
speculative decoding queries the draft on. The resulting checkpoint
loads via ``--draft_ckpt`` on cli.transcribe / cli.serve. No reference
equivalent (the reference has neither speculative decoding nor
distillation).
"""

from __future__ import annotations

import argparse
import json
from typing import List, Optional


def main(argv: Optional[List[str]] = None) -> dict:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--input", required=True, help="segment dir or CSV (audio)")
    p.add_argument("--config", default=None)
    p.add_argument("--ckpt_dir", default=None, help="target checkpoint")
    p.add_argument("--draft_model", default="tiny")
    p.add_argument("--output", required=True, help="draft checkpoint dir")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_new_tokens", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--hard_weight", type=float, default=0.5)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--smoke", action="store_true",
                   help="random target weights, test-size models")
    args = p.parse_args(argv)

    import jax
    import numpy as np
    import optax

    from avsl_tpu.cli.transcribe import collect_items
    from avsl_tpu.core.config import FlamingoTrainConfig
    from avsl_tpu.data.audio_segments import load_wav
    from avsl_tpu.data.tokenizer import get_tokenizer
    from avsl_tpu.kernels.logmel import pad_or_trim
    from avsl_tpu.models.factory import build_whisper_flamingo
    from avsl_tpu.train.checkpoints import (
        latest_step,
        restore_checkpoint,
        save_checkpoint,
    )
    from avsl_tpu.train.distill import make_distill_step, make_label_fn
    from avsl_tpu.train.loop import TrainState
    from avsl_tpu.train.optim import select_optimizer

    cfg = FlamingoTrainConfig.from_yaml(args.config) if args.config else FlamingoTrainConfig()
    smoke = bool(args.smoke)
    if smoke:
        cfg.model_name = "test"
        cfg.audio_max_length = 16000  # the test preset's audio context
    tokenizer = get_tokenizer(getattr(cfg, "download_root", None), cfg.lang)
    vocab = tokenizer.add_tokens(["<laugh>"])

    # target: audio-only labeling (a Flamingo target still works — encode
    # runs with video=None, the gated sublayers are skipped without xv,
    # matching how the draft is queried at serve time)
    t_name = "test" if smoke else cfg.model_name
    target_model, t_cfg = build_whisper_flamingo(
        t_name, vocab_size=vocab, add_gated_x_attn=False,
        dtype="float32" if smoke else "bfloat16",
    )
    b = args.batch_size
    audio_max = int(cfg.audio_max_length)
    t_vars = jax.jit(target_model.init)(
        jax.random.PRNGKey(0),
        np.zeros((b, t_cfg.n_mels, audio_max // 160), np.float32),
        np.zeros((b, 4), np.int32),
    )
    if args.ckpt_dir:
        if latest_step(args.ckpt_dir) is None:
            raise SystemExit(f"no checkpoint under {args.ckpt_dir!r}")
        tx_probe, _ = select_optimizer(t_vars["params"], cfg, 1)
        t_state = TrainState.create(
            t_vars["params"], tx_probe, batch_stats=t_vars.get("batch_stats")
        )
        t_state = restore_checkpoint(args.ckpt_dir, t_state)
        t_vars = {"params": t_state.params}
        if t_state.batch_stats is not None:
            t_vars["batch_stats"] = t_state.batch_stats
    elif not smoke:
        raise SystemExit("--ckpt_dir required (or --smoke): distilling from "
                         "random target weights produces a useless draft")

    d_name = "test" if smoke else args.draft_model
    draft_model, d_cfg = build_whisper_flamingo(
        d_name, vocab_size=vocab, add_gated_x_attn=False,
        dtype="float32" if smoke else "bfloat16",
    )
    d_vars = jax.jit(draft_model.init)(
        jax.random.PRNGKey(1),
        np.zeros((b, d_cfg.n_mels, audio_max // 160), np.float32),
        np.zeros((b, 4), np.int32),
    )

    items = [it for it in collect_items(args.input) if it.get("audio")]
    if not items:
        raise SystemExit("no audio items found")
    clips = np.stack([
        np.asarray(
            pad_or_trim(np.asarray(load_wav(it["audio"]), np.float32), audio_max)
        )
        for it in items
    ])

    prompt = np.tile(
        np.asarray(tokenizer.sot_sequence(cfg.lang), np.int32)[None], (b, 1)
    )
    label_fn = make_label_fn(
        target_model, t_vars, args.max_new_tokens, tokenizer.eot
    )
    tx = optax.adamw(args.lr, weight_decay=0.01)
    state = TrainState.create(
        d_vars["params"], tx, batch_stats=d_vars.get("batch_stats")
    )
    step_fn = make_distill_step(draft_model, tx, hard_weight=args.hard_weight)

    rng = np.random.default_rng(0)
    history = []
    metrics = {}
    for step in range(args.steps):
        idx = rng.integers(0, len(clips), size=b)
        audio = clips[idx]
        tokens, t_logprob, valid = label_fn(audio, prompt)
        state, metrics = step_fn(state, audio, tokens, t_logprob, valid)
        if step % max(args.log_every, 1) == 0 or step == args.steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            history.append({"step": step, **m})
            print(f"step {step}: " + " ".join(
                f"{k}={v:.4f}" for k, v in m.items()))

    save_checkpoint(args.output, state, int(state.step))
    summary = {
        "steps": args.steps,
        "final": {k: float(v) for k, v in metrics.items()},
        "output": args.output,
        "draft_model": d_name,
        "history": history,
    }
    with open(f"{args.output}/distill_summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    return summary


if __name__ == "__main__":
    main()
