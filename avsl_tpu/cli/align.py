"""Forced-alignment CLI: transcripts -> word-level timestamps.

``python -m avsl_tpu.cli.align --audio seg.wav [--video seg-lip.mp4]
--text "..." [--config avhubert.yaml] [--ckpt_dir ...] [--output out.json]``
or ``--csv segments.csv`` (columns: id, audio, [video], text).

The reference has no aligner of any kind — transcript timing comes only
from the AMI annotations themselves. This runs the AV-HuBERT CTC head
over the segment's 104-dim stacked-logfbank (+ lip clip) features and
Viterbi-aligns the KNOWN transcript onto the 25 Hz CTC frames
(decode.ctc_forced_align), emitting word-level timestamps — AMI
re-segmentation, subtitle timing, `<laugh>` localization.

TPU shape discipline: items are padded to frame buckets (multiples of
``--bucket``) so the jitted forward compiles once per bucket, not once
per utterance length; the pad frames are excluded from the alignment on
the host (the DP runs on true frames only).
"""

from __future__ import annotations

import argparse
import json
from typing import Any, Dict, List, Optional


def _rows_from_args(args) -> List[Dict[str, Any]]:
    if args.csv:
        import csv as _csv

        with open(args.csv, newline="") as f:
            rows = list(_csv.DictReader(f))
        for i, r in enumerate(rows):
            r.setdefault("id", str(i))
        return rows
    if not (args.audio and args.text is not None):
        raise SystemExit("need --audio + --text, or --csv")
    row: Dict[str, Any] = {"id": args.id, "audio": args.audio, "text": args.text}
    if args.video:
        row["video"] = args.video
    return [row]


def main(argv: Optional[List[str]] = None) -> List[Dict[str, Any]]:
    p = argparse.ArgumentParser()
    p.add_argument("--audio", default=None)
    p.add_argument("--video", default=None)
    p.add_argument("--text", default=None)
    p.add_argument("--id", default="0")
    p.add_argument("--csv", default=None)
    p.add_argument("--config", default=None, help="AV-HuBERT model card YAML")
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--output", default=None)
    p.add_argument("--frame_rate", type=float, default=25.0)
    p.add_argument("--bucket", type=int, default=32,
                   help="frame-count bucket granularity (static shapes)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny_test model card (tests/CI)")
    p.add_argument("--smoke", action="store_true",
                   help="--tiny + synthetic audio (CI health check)")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from avsl_tpu.core.config import AVHuBERTConfig
    from avsl_tpu.data.tokenizer import get_tokenizer
    from avsl_tpu.decode import ctc_forced_align, word_alignments
    from avsl_tpu.kernels.fbank import avhubert_audio_features
    from avsl_tpu.models import AVHuBERTForCTC

    tokenizer = get_tokenizer(None, "en")
    if args.smoke or args.tiny:
        cfg = AVHuBERTConfig.tiny_test(vocab_size=tokenizer.vocab_size)
    elif args.config:
        cfg = AVHuBERTConfig.from_yaml(args.config)
    else:
        cfg = AVHuBERTConfig(vocab_size=tokenizer.vocab_size)
    if args.smoke:
        sr = 16000
        rows = [{
            "id": "smoke",
            "audio": (0.1 * np.sin(
                2 * np.pi * 300 * np.arange(sr) / sr
            )).astype(np.float32),
            "text": " hello world",
        }]
    else:
        rows = _rows_from_args(args)

    model = AVHuBERTForCTC(cfg)
    crop = 88
    params = None

    # one jitted forward per frame bucket; logit_pad masks the tail
    import jax.numpy as jnp

    @jax.jit
    def forward(variables, feats_a, feats_v):
        return model.apply(variables, audio=feats_a, video=feats_v)

    def log_softmax(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    results: List[Dict[str, Any]] = []
    for row in rows:
        from avsl_tpu.data.audio_segments import load_wav

        audio = row["audio"]
        audio = load_wav(audio) if isinstance(audio, str) else np.asarray(
            audio, np.float32
        )
        feats_a = np.asarray(avhubert_audio_features(audio))
        path = row.get("video")
        if path:
            from avsl_tpu.data.video_io import load_video_feats

            feats_v = load_video_feats(path, image_crop_size=crop)
            t = min(len(feats_a), len(feats_v))
            feats_a, feats_v = feats_a[:t], feats_v[:t]
        else:
            feats_v = np.zeros((len(feats_a), crop, crop, 1), np.float32)
        t = len(feats_a)
        tb = max(((t + args.bucket - 1) // args.bucket) * args.bucket,
                 args.bucket)
        pad_a = np.zeros((1, tb, feats_a.shape[-1]), np.float32)
        pad_a[0, :t] = feats_a
        pad_v = np.zeros((1, tb, crop, crop, 1), np.float32)
        pad_v[0, :t] = feats_v

        if params is None:
            params = model.init(
                jax.random.PRNGKey(0),
                audio=jnp.asarray(pad_a), video=jnp.asarray(pad_v),
            )
            if args.ckpt_dir:
                from avsl_tpu.train.checkpoints import (
                    latest_step,
                    restore_checkpoint,
                )

                if latest_step(args.ckpt_dir) is not None:
                    from avsl_tpu.train.loop import TrainState
                    import optax

                    state = TrainState.create(
                        params["params"], optax.sgd(0.0),
                        batch_stats=params.get("batch_stats"),
                    )
                    state = restore_checkpoint(args.ckpt_dir, state)
                    params = {"params": state.params}
                    if state.batch_stats is not None:
                        params["batch_stats"] = state.batch_stats

        logits = np.asarray(forward(params, pad_a, pad_v))[0, :t]
        tokens = tokenizer.encode(row["text"])
        lp = log_softmax(logits.astype(np.float64))
        try:
            spans, score = ctc_forced_align(
                lp, tokens, blank_id=cfg.pad_token_id
            )
        except ValueError as e:  # more tokens than frames
            results.append({"id": row["id"], "error": str(e)})
            continue
        words = word_alignments(
            tokens, spans, tokenizer, frame_rate_hz=args.frame_rate
        )
        results.append({
            "id": row["id"],
            "score": round(score, 3),
            "n_frames": t,
            "words": words,
        })

    if args.output:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)
    for r in results[:10]:
        print(json.dumps(r))
    return results


if __name__ == "__main__":
    main()
