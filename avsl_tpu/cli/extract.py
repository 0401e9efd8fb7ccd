"""Feature-extraction CLI: media -> AV-HuBERT encoder features (.npy).

``python -m avsl_tpu.cli.extract --csv segs.csv --output feats/
[--layer K] [--config card.yaml] [--ckpt_dir ...]`` or single-item
``--audio seg.wav [--video seg-lip.mp4]``.

The fairseq ecosystem's ``dump_hubert_feature`` counterpart (the
reference consumes such dumps for clustering but ships no extractor):
runs the 104-dim stacked-logfbank (+ lip clip) frontends and the fusion
encoder, writing one ``[T, hidden]`` float32 array per segment —
downstream diarization, k-means target generation (the in-tree
``cli.pretrain`` uses the same ``extract_features`` tap), retrieval, or
probing. ``--layer K`` taps transformer layer K (1-indexed, skips the
final LayerNorm — fairseq ``extract_features(output_layer=k)``
semantics, models/avhubert.py); default taps the full encoder output.

Host prep and the optimizer-agnostic checkpoint restore are shared with
``cli.align`` (cli/_avh_common.py). Frame counts are bucketed
(``--bucket``) so the jitted forward compiles once per bucket; padding
is stripped on the host before writing.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any, Dict, List, Optional


def main(argv: Optional[List[str]] = None) -> List[Dict[str, Any]]:
    p = argparse.ArgumentParser()
    p.add_argument("--audio", default=None)
    p.add_argument("--video", default=None)
    p.add_argument("--id", default="0")
    p.add_argument("--csv", default=None)
    p.add_argument("--config", default=None, help="AV-HuBERT model card YAML")
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--output", required=True, help="directory for {id}.npy")
    p.add_argument("--layer", type=int, default=None,
                   help="1-indexed transformer tap; default: encoder output")
    p.add_argument("--bucket", type=int, default=32)
    p.add_argument("--tiny", action="store_true", help="tiny_test card (CI)")
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
    from avsl_tpu.models import AVHuBERTModel

    rows = rows_from_args(args)
    if args.tiny:
        cfg = AVHuBERTConfig.tiny_test()
    elif args.config:
        cfg = AVHuBERTConfig.from_yaml(args.config)
    else:
        cfg = AVHuBERTConfig()
    model = AVHuBERTModel(cfg)
    params = None

    @jax.jit
    def forward(variables, feats_a, feats_v):
        return model.apply(
            variables, audio=feats_a, video=feats_v,
            output_layer=args.layer, method=model.extract_features,
        )

    os.makedirs(args.output, exist_ok=True)
    results: List[Dict[str, Any]] = []
    for row in rows:
        pad_a, pad_v, t = load_row_features(row, args.bucket)
        if params is None:
            params = model.init(
                jax.random.PRNGKey(0),
                audio=jnp.asarray(pad_a), video=jnp.asarray(pad_v),
            )
            params = maybe_restore_variables(args.ckpt_dir, params)

        feats = np.asarray(forward(params, pad_a, pad_v))[0, :t]
        out_path = os.path.join(args.output, f"{row['id']}.npy")
        np.save(out_path, feats.astype(np.float32))
        results.append({
            "id": row["id"], "path": out_path,
            "shape": list(feats.shape),
        })

    print(json.dumps({
        "n": len(results),
        "hidden": results[0]["shape"][1] if results else 0,
        "layer": args.layer,
        "output": args.output,
    }))
    return results


if __name__ == "__main__":
    main()
