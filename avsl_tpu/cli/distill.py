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

    from avsl_tpu.cli._serving_common import build_target_model
    from avsl_tpu.cli.transcribe import collect_items
    from avsl_tpu.core.config import FlamingoTrainConfig
    from avsl_tpu.data.audio_segments import load_wav
    from avsl_tpu.data.tokenizer import get_tokenizer
    from avsl_tpu.kernels.logmel import pad_or_trim
    from avsl_tpu.models.factory import build_whisper_flamingo
    from avsl_tpu.train.checkpoints import save_checkpoint
    from avsl_tpu.train.distill import (
        make_greedy_label_fn,
        make_online_distill_step,
    )
    from avsl_tpu.train.loop import TrainState

    cfg = FlamingoTrainConfig.from_yaml(args.config) if args.config else FlamingoTrainConfig()
    smoke = bool(args.smoke)
    if smoke:
        cfg.model_name = "test"
        cfg.audio_max_length = 16000  # the test preset's audio context
    if not smoke and not args.ckpt_dir:
        raise SystemExit("--ckpt_dir required (or --smoke): distilling from "
                         "random target weights produces a useless draft")
    tokenizer = get_tokenizer(getattr(cfg, "download_root", None), cfg.lang)

    # target: built + restored EXACTLY as trained (same shared builder the
    # serving CLIs use — a Flamingo/AV checkpoint restores into a matching
    # template); labeling then runs encode with video=None, so the gated
    # sublayers are skipped, matching how the draft is queried at serve
    # time (audio-only)
    b = args.batch_size
    audio_max = int(cfg.audio_max_length)
    target_model, t_cfg, t_vars, _ = build_target_model(
        cfg, tokenizer, b, smoke, args.ckpt_dir
    )
    vocab = t_cfg.n_vocab

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
    # ---- label pass: ONE greedy decode per corpus clip, tokens cached
    # on the host (the expensive target decode loop never runs again; the
    # train step recomputes the target distribution in a single forward)
    label_fn = make_greedy_label_fn(
        target_model, t_vars, args.max_new_tokens, tokenizer.eot
    )
    n = len(clips)
    labels = np.zeros((n, prompt.shape[1] + args.max_new_tokens), np.int32)
    for start in range(0, n, b):
        idx = np.arange(start, start + b) % n  # wrap the tail batch
        labels[idx] = np.asarray(label_fn(clips[idx], prompt))
    print(f"labeled {n} clips", flush=True)

    tx = optax.adamw(args.lr, weight_decay=0.01)
    state = TrainState.create(
        d_vars["params"], tx, batch_stats=d_vars.get("batch_stats")
    )
    step_fn = make_online_distill_step(
        target_model, t_vars, draft_model, tx,
        prompt_len=prompt.shape[1], eot_id=tokenizer.eot,
        hard_weight=args.hard_weight,
    )

    rng = np.random.default_rng(0)
    history = []
    metrics = {}
    for step in range(args.steps):
        idx = rng.integers(0, n, size=b)
        state, metrics = step_fn(state, clips[idx], labels[idx])
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
