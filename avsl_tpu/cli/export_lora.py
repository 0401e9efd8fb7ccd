"""LoRA merged-export CLI: adapters + base -> plain serving checkpoint.

``python -m avsl_tpu.cli.export_lora --config train.yaml
--adapter_ckpt runs/lora_ckpt [--base_ckpt runs/base_ckpt]
--output runs/merged``

A LoRA fine-tune checkpoints ONLY the adapter tree (cli.finetune with
``lora_rank > 0``); this merges ``W + (alpha/rank) * A @ B`` once on the
host (models/lora.py) and writes a full-parameter orbax checkpoint that
`cli.serve` / `cli.transcribe` / a full fine-tune load exactly like any
other — the served program is byte-identical to training's merged
forward (tests/test_lora.py asserts the equality).
"""

from __future__ import annotations

import argparse
from typing import List, Optional


def main(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None,
                   help="the LoRA training YAML (lora_rank/alpha/targets)")
    p.add_argument("--adapter_ckpt", required=True)
    p.add_argument("--base_ckpt", default=None,
                   help="orbax dir of the frozen base (default: config init)")
    p.add_argument("--output", required=True)
    p.add_argument("--smoke", action="store_true", help="tiny preset (tests)")
    args = p.parse_args(argv)

    import jax

    from avsl_tpu.cli.avg_ckpt import build_state
    from avsl_tpu.core.config import FlamingoTrainConfig
    from avsl_tpu.models import lora as lora_mod
    from avsl_tpu.train.checkpoints import (
        latest_step,
        restore_checkpoint,
        save_checkpoint,
    )
    from avsl_tpu.train.loop import TrainState
    from avsl_tpu.train.optim import lora_optimizer

    cfg = (FlamingoTrainConfig.from_yaml(args.config) if args.config
           else FlamingoTrainConfig())
    if args.smoke:
        cfg.model_name = "test"
        cfg.audio_max_length = 16000
    rank = int(getattr(cfg, "lora_rank", 0) or 0)
    if rank <= 0:
        raise SystemExit("config has lora_rank=0 — nothing to export")
    alpha = float(getattr(cfg, "lora_alpha", 16.0) or 16.0)
    targets = (tuple(cfg.lora_targets) if getattr(cfg, "lora_targets", None)
               else lora_mod.DEFAULT_TARGETS)

    base_state = build_state(cfg, smoke=args.smoke)
    if args.base_ckpt:
        if latest_step(args.base_ckpt) is None:
            # never fall back silently to random base weights — the
            # merged artifact would be servable-looking garbage
            raise SystemExit(f"no base checkpoint under {args.base_ckpt!r}")
        base_state = restore_checkpoint(args.base_ckpt, base_state)

    adapters = lora_mod.init_lora(
        jax.random.PRNGKey(1), base_state.params, rank, targets
    )
    tx, _ = lora_optimizer(adapters, cfg, 1)
    a_state = TrainState.create(adapters, tx)
    step = latest_step(args.adapter_ckpt)
    if step is None:
        raise SystemExit(f"no adapter checkpoint under {args.adapter_ckpt!r}")
    a_state = restore_checkpoint(args.adapter_ckpt, a_state)

    merged = lora_mod.merge_lora(base_state.params, a_state.params, alpha, rank)
    out_state = base_state.replace(params=merged, step=step)
    save_checkpoint(args.output, out_state, step=step)
    summary = lora_mod.lora_summary(base_state.params, a_state.params)
    print(f"merged rank={rank} alpha={alpha} "
          f"adapters={summary['n_adapters']} "
          f"({100 * summary['trainable_fraction']:.3f}% of base) "
          f"-> {args.output} @ step {step}")
    return out_state


if __name__ == "__main__":
    main()
