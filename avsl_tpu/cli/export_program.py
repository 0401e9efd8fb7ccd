"""Export the serving decode program as a self-contained StableHLO
artifact (infer/export.py).

    python -m avsl_tpu.cli.export_program --config cfg.yaml \
        --ckpt_dir ckpts/flagship --output serving/model.stablehlo \
        --platforms tpu

The artifact embeds the weights and the whole mel->encode->decode
computation; `avsl_tpu.infer.load_exported` (or any StableHLO runtime)
replays it without model code. `--platforms tpu` cross-exports for TPU
from a CPU host. No reference equivalent (the reference deploys Python +
torch checkpoints).
"""

from __future__ import annotations

import argparse
from typing import List, Optional


def main(argv: Optional[List[str]] = None) -> dict:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--config", default=None)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--output", required=True)
    p.add_argument("--platforms", default=None,
                   help="comma list, e.g. 'tpu' or 'cpu,tpu'; default: "
                   "current backend")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_new_tokens", type=int, default=64)
    p.add_argument("--beam", type=int, default=1)
    p.add_argument("--quantize", default=None, choices=["int8"])
    p.add_argument("--kv_int8", action="store_true")
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args(argv)

    from avsl_tpu.cli._serving_common import build_transcriber
    from avsl_tpu.core.config import FlamingoTrainConfig
    from avsl_tpu.infer.export import export_serving_program

    cfg = FlamingoTrainConfig.from_yaml(args.config) if args.config else FlamingoTrainConfig()
    if args.smoke:
        cfg.model_name = "test"
        cfg.audio_max_length = 16000
    if not args.smoke and not args.ckpt_dir:
        raise SystemExit("--ckpt_dir required (or --smoke): an exported "
                         "program freezes its weights")

    transcriber = build_transcriber(args, cfg)
    platforms = (
        [s.strip() for s in args.platforms.split(",") if s.strip()]
        if args.platforms
        else None
    )
    manifest = export_serving_program(transcriber, args.output, platforms)
    print(f"exported {manifest['bytes'] / 1e6:.1f} MB "
          f"for platforms={manifest['platforms']} -> {args.output}")
    return manifest


if __name__ == "__main__":
    main()
