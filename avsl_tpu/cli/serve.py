"""Serving daemon CLI: ``python -m avsl_tpu.cli.serve [--config cfg.yaml]
[--ckpt_dir ...] [--port 8080] [--quantize int8] [--max_wait_ms 30]``.

Starts the dynamic-batching HTTP transcription server
(avsl_tpu.infer.TranscriptionServer) on the flagship Whisper-Flamingo
model. The reference has no serving entry point (its inference surface
is the Lightning validation loop); this is the production counterpart.
``--smoke`` boots the tiny model preset and exits after binding — the CI
health check.
"""

from __future__ import annotations

import argparse
import json
from typing import List, Optional


from avsl_tpu.cli._serving_common import build_transcriber  # noqa: F401,E402


def main(argv: Optional[List[str]] = None):
    from avsl_tpu.core.config import FlamingoTrainConfig
    from avsl_tpu.infer import TranscriptionServer

    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_new_tokens", type=int, default=64)
    p.add_argument("--beam", type=int, default=1)
    p.add_argument("--max_wait_ms", type=float, default=30.0)
    p.add_argument("--quantize", default=None, choices=["int8"])
    p.add_argument("--kv_int8", action="store_true",
                   help="int8 cross-attn/xv KV cache (quantize_kv_cache)")
    p.add_argument("--temperature_fallback", default="",
                   help="comma list, e.g. 0.2,0.4")
    p.add_argument("--logprob_threshold", type=float, default=-1.0)
    p.add_argument("--word_timestamps", action="store_true",
                   help="attach cross-attention DTW word times to replies")
    # multi-chip serving: weights tp-sharded (Megatron col/row rules),
    # batch dp-sharded; mutually exclusive with --quantize
    p.add_argument("--draft_model", default=None,
                   help="draft Whisper for speculative decoding, e.g. tiny")
    p.add_argument("--draft_ckpt", default=None)
    p.add_argument("--spec_k", type=int, default=4,
                   help="draft tokens per verify pass")
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--data_parallel", type=int, default=1)
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args(argv)

    cfg = FlamingoTrainConfig.from_yaml(args.config) if args.config else FlamingoTrainConfig()
    if args.smoke:
        cfg.model_name = "test"
        cfg.audio_max_length = 16000

    transcriber = build_transcriber(args, cfg)
    server = TranscriptionServer(
        transcriber, host=args.host, port=args.port,
        max_wait_ms=args.max_wait_ms,
    )
    if args.smoke:
        server.start()
        host, port = server.address
        print(json.dumps({"ok": True, "address": f"http://{host}:{port}"}))
        server.stop()
        return server
    host, port = server.address
    print(f"serving on http://{host}:{port}  "
          f"(batch={args.batch_size}, wait={args.max_wait_ms}ms, "
          f"quantize={args.quantize})")
    server.serve_forever()
    return server


if __name__ == "__main__":
    main()
