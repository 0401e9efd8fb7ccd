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
the host (the DP runs on true frames only). Infeasible rows (more
emission slots than frames) are reported per-row, never aborting the
batch. Checkpoint restore is optimizer-agnostic
(checkpoints.restore_params_only).
"""

from __future__ import annotations

import argparse
import json
from typing import Any, Dict, List, Optional


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
    import jax.numpy as jnp
    import numpy as np

    from avsl_tpu.cli._avh_common import (
        load_row_features,
        maybe_restore_variables,
        rows_from_args,
    )
    from avsl_tpu.core.config import AVHuBERTConfig
    from avsl_tpu.data.tokenizer import get_tokenizer
    from avsl_tpu.decode import ctc_forced_align, word_alignments
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
        rows = rows_from_args(args)
        if args.text is not None and not args.csv:
            rows[0]["text"] = args.text

    model = AVHuBERTForCTC(cfg)
    params = None

    @jax.jit
    def forward(variables, feats_a, feats_v):
        return model.apply(variables, audio=feats_a, video=feats_v)

    def log_softmax(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    results: List[Dict[str, Any]] = []
    for row in rows:
        if not row.get("text"):
            results.append({"id": row.get("id", "?"),
                            "error": "missing transcript text"})
            continue
        pad_a, pad_v, t = load_row_features(row, args.bucket)
        if params is None:
            params = model.init(
                jax.random.PRNGKey(0),
                audio=jnp.asarray(pad_a), video=jnp.asarray(pad_v),
            )
            params = maybe_restore_variables(args.ckpt_dir, params)

        logits = np.asarray(forward(params, pad_a, pad_v))[0, :t]
        tokens = tokenizer.encode(row["text"])
        lp = log_softmax(logits.astype(np.float64))
        try:
            spans, score = ctc_forced_align(
                lp, tokens, blank_id=cfg.pad_token_id
            )
        except ValueError as e:  # infeasible: too many tokens for frames
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
