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


def build_transcriber(args, cfg):
    """Model + weights + StreamingTranscriber, shared with cli.transcribe."""
    import jax
    import numpy as np

    from avsl_tpu.data.tokenizer import get_tokenizer
    from avsl_tpu.infer import StreamingTranscriber
    from avsl_tpu.models.factory import build_whisper_flamingo
    from avsl_tpu.train.checkpoints import latest_step, restore_checkpoint
    from avsl_tpu.train.loop import TrainState
    from avsl_tpu.train.optim import select_optimizer

    tokenizer = get_tokenizer(getattr(cfg, "download_root", None), cfg.lang)
    vocab = tokenizer.add_tokens(["<laugh>"])
    model, w_cfg = build_whisper_flamingo(
        cfg.model_name, vocab_size=vocab,
        add_gated_x_attn=cfg.add_gated_x_attn,
        use_av_hubert_encoder=cfg.use_av_hubert_encoder,
        dtype="float32" if args.smoke else "bfloat16",
    )
    b = args.batch_size
    video_frames = min(int(round(cfg.audio_max_length / 16000 * 25)), 250)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        np.zeros((b, w_cfg.n_mels, cfg.audio_max_length // 160), np.float32),
        np.zeros((b, 4), np.int32),
        **(dict(video=np.zeros((b, video_frames, 88, 88, 1), np.float32))
           if cfg.add_gated_x_attn else {}),
    )
    mesh = None
    if args.model_parallel > 1 or args.data_parallel > 1:
        from avsl_tpu.core.mesh import make_mesh

        mesh = make_mesh(
            args.data_parallel * args.model_parallel,
            model_parallel=args.model_parallel,
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
    return StreamingTranscriber(
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
        word_timestamps=args.word_timestamps,
        mesh=mesh,
    )


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
    p.add_argument("--temperature_fallback", default="",
                   help="comma list, e.g. 0.2,0.4")
    p.add_argument("--logprob_threshold", type=float, default=-1.0)
    p.add_argument("--word_timestamps", action="store_true",
                   help="attach cross-attention DTW word times to replies")
    # multi-chip serving: weights tp-sharded (Megatron col/row rules),
    # batch dp-sharded; mutually exclusive with --quantize
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
