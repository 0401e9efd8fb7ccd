"""Batch transcription CLI: directory of segments -> transcripts JSON.

Usage: ``python -m avsl_tpu.cli.transcribe --input <dir-or-csv>
[--config cfg.yaml] [--ckpt_dir ...] [--beam N] [--output out.json]``

The streaming-serving entry (BASELINE configs[4]): audio wavs with
optional lip mp4s, missing-modality robust, host decode overlapped with
device transcription (avsl_tpu.infer.StreamingTranscriber).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any, Dict, List, Optional


def collect_items(input_path: str) -> List[Dict[str, Any]]:
    items: List[Dict[str, Any]] = []
    if input_path.endswith(".csv"):
        import pandas as pd

        for row in pd.read_csv(input_path).to_dict("records"):
            items.append(
                {
                    "id": row.get("id", row.get("segment_id", len(items))),
                    "audio": row.get("audio", row.get("audio_abs")),
                    "lip_video": row.get("lip_video", row.get("lip_video_abs")),
                }
            )
        return items
    for fname in sorted(os.listdir(input_path)):
        if not fname.endswith(".wav"):
            continue
        stem = fname[: -len(".wav")]
        lip = os.path.join(input_path, f"{stem}-lip.mp4")
        item = {
            "id": stem,
            "audio": os.path.join(input_path, fname),
            "lip_video": lip if os.path.exists(lip) else None,
        }
        if item["lip_video"] is None:
            # raw closeup fallback: lip-cropped on device by the
            # transcriber's staged frontend
            for raw in (f"{stem}-video.mp4", f"{stem}.mp4"):
                p = os.path.join(input_path, raw)
                if os.path.exists(p):
                    item["video"] = p
                    break
        items.append(item)
    return items


def main(argv: Optional[List[str]] = None) -> List[Dict[str, Any]]:
    import jax

    from avsl_tpu.core.config import FlamingoTrainConfig
    from avsl_tpu.data.tokenizer import get_tokenizer
    from avsl_tpu.infer import StreamingTranscriber
    from avsl_tpu.models.factory import build_whisper_flamingo
    from avsl_tpu.train.checkpoints import latest_step, restore_checkpoint
    from avsl_tpu.train.loop import TrainState
    from avsl_tpu.train.optim import select_optimizer

    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="segment dir or CSV")
    p.add_argument("--config", default=None)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--beam", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_new_tokens", type=int, default=64)
    p.add_argument("--output", default=None)
    p.add_argument(
        "--quantize", default=None, choices=["int8"],
        help="weight-only int8 serving: halves HBM-resident weight bytes "
        "and the host->device upload (models/quant.py)",
    )
    p.add_argument("--temperature_fallback", default="",
                   help="comma list, e.g. 0.2,0.4")
    p.add_argument("--logprob_threshold", type=float, default=-1.0)
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args(argv)

    cfg = FlamingoTrainConfig.from_yaml(args.config) if args.config else FlamingoTrainConfig()
    if args.smoke:
        cfg.model_name = "test"
        cfg.audio_max_length = 16000

    tokenizer = get_tokenizer(getattr(cfg, "download_root", None), cfg.lang)
    vocab = tokenizer.add_tokens(["<laugh>"])
    model, w_cfg = build_whisper_flamingo(
        cfg.model_name, vocab_size=vocab,
        add_gated_x_attn=cfg.add_gated_x_attn,
        use_av_hubert_encoder=cfg.use_av_hubert_encoder,
        dtype="float32" if args.smoke else "bfloat16",
    )

    items = collect_items(args.input)
    if not items:
        print("no items found")
        return []

    # init / restore params
    import numpy as np

    b = args.batch_size
    mel_probe = np.zeros((b, w_cfg.n_mels, cfg.audio_max_length // 160), np.float32)
    video_frames = min(int(round(cfg.audio_max_length / 16000 * 25)), 250)
    video_probe = np.zeros((b, video_frames, 88, 88, 1), np.float32)
    tok_probe = np.zeros((b, 4), np.int32)
    init_kwargs = dict(video=video_probe) if cfg.add_gated_x_attn else {}
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), mel_probe, tok_probe, **init_kwargs
    )
    if args.ckpt_dir and latest_step(args.ckpt_dir) is not None:
        tx, _ = select_optimizer(variables["params"], cfg, 1)
        state = TrainState.create(
            variables["params"], tx, batch_stats=variables.get("batch_stats")
        )
        state = restore_checkpoint(args.ckpt_dir, state)
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats

    transcriber = StreamingTranscriber(
        model, variables, tokenizer,
        audio_max_length=int(cfg.audio_max_length),
        video_frames=video_frames,
        batch_size=b,
        max_new_tokens=args.max_new_tokens,
        beam_size=args.beam,
        lang=cfg.lang,
        quantize=args.quantize,
        temperature_fallback=tuple(
            float(t) for t in args.temperature_fallback.split(",") if t
        ),
        logprob_threshold=args.logprob_threshold,
    )
    results = transcriber.transcribe(items)
    out = [
        {"id": r.id, "text": r.text, "has_video": r.has_video,
         "avg_logprob": r.avg_logprob}
        for r in results
    ]
    if args.output:
        with open(args.output, "w") as f:
            json.dump(out, f, indent=2)
    for r in out[:10]:
        print(json.dumps(r))
    return out


if __name__ == "__main__":
    main()
