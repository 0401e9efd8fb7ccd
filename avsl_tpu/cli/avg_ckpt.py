"""Checkpoint averaging CLI ("model soup"):

``python -m avsl_tpu.cli.avg_ckpt --ckpt_dir runs/ckpt [--config cfg.yaml]
[--steps 400,500,600 | --last_k 3] --output runs/soup``

Uniformly averages the params (and batch_stats) of the selected saved
steps (train/ema.py) and writes the result as a NEW orbax checkpoint at
the newest contributing step number — directly loadable by
`cli.serve --ckpt_dir`, `cli.transcribe`, or as a fine-tune resume
point. The reference has no weight-averaging tooling.
"""

from __future__ import annotations

import argparse
from typing import List, Optional


def build_state(cfg, smoke: bool = False):
    """The SAME TrainState skeleton the finetune runner checkpoints —
    model per config, optimizer per the freeze-regime selection — so
    orbax restore sees a structurally identical template."""
    import jax
    import numpy as np

    from avsl_tpu.data.tokenizer import get_tokenizer
    from avsl_tpu.models.factory import build_whisper_flamingo
    from avsl_tpu.train.loop import TrainState
    from avsl_tpu.train.optim import select_optimizer

    tokenizer = get_tokenizer(getattr(cfg, "download_root", None), cfg.lang)
    vocab = tokenizer.add_tokens(["<laugh>"])
    model, w_cfg = build_whisper_flamingo(
        cfg.model_name, vocab_size=vocab,
        add_gated_x_attn=cfg.add_gated_x_attn,
        use_av_hubert_encoder=cfg.use_av_hubert_encoder,
        dtype="float32" if smoke else "bfloat16",
    )
    video_frames = min(int(round(cfg.audio_max_length / 16000 * 25)), 250)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        np.zeros((1, w_cfg.n_mels, cfg.audio_max_length // 160), np.float32),
        np.zeros((1, 4), np.int32),
        **(dict(video=np.zeros((1, video_frames, 88, 88, 1), np.float32))
           if cfg.add_gated_x_attn else {}),
    )
    tx, _ = select_optimizer(variables["params"], cfg, 1)
    return TrainState.create(
        variables["params"], tx, batch_stats=variables.get("batch_stats")
    )


def main(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_dir", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--steps", default=None, help="comma list; default all")
    p.add_argument("--last_k", type=int, default=None)
    p.add_argument("--smoke", action="store_true",
                   help="tiny model preset (tests)")
    args = p.parse_args(argv)

    from avsl_tpu.core.config import FlamingoTrainConfig
    from avsl_tpu.train.checkpoints import save_checkpoint
    from avsl_tpu.train.ema import average_checkpoint_steps

    cfg = (FlamingoTrainConfig.from_yaml(args.config) if args.config
           else FlamingoTrainConfig())
    if args.smoke:
        cfg.model_name = "test"
        cfg.audio_max_length = 16000

    template = build_state(cfg, smoke=args.smoke)
    steps = ([int(s) for s in args.steps.split(",") if s]
             if args.steps else None)
    soup, used = average_checkpoint_steps(
        args.ckpt_dir, template, steps=steps, last_k=args.last_k
    )
    out_step = max(used)
    save_checkpoint(args.output, soup, step=out_step)
    print(f"averaged steps {used} -> {args.output} @ step {out_step}")
    return soup


if __name__ == "__main__":
    main()
