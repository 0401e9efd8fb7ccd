"""Evaluation entry point: WER/CER of a trained checkpoint on a dataset.

Usage: ``python -m avsl_tpu.cli.evaluate --config cfg.yaml
[--ckpt_dir ...] [--beam N] [--smoke]``

Provides both eval modes of the reference (SURVEY.md §3.5): the fused
teacher-forced argmax validation and true KV-cached batched beam decode.
(The reference advertises ``scripts/eval_whisper_flamingo.py`` in its
README but never shipped it — this module closes that gap.)
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any, Dict, List, Optional

import numpy as np


def main(argv: Optional[List[str]] = None) -> Dict[str, Any]:
    import jax

    from avsl_tpu.core.config import FlamingoTrainConfig
    from avsl_tpu.data.runtime import AmiVideoDataset, WhisperVideoCollator
    from avsl_tpu.data.tokenizer import get_tokenizer
    from avsl_tpu.decode import beam_search, normalize_text, wer_cer
    from avsl_tpu.models.factory import build_whisper_flamingo
    from avsl_tpu.train.checkpoints import latest_step, restore_checkpoint
    from avsl_tpu.train.loop import TrainState
    from avsl_tpu.train.optim import select_optimizer
    from avsl_tpu.train.runner import evaluate_wer

    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--beam", type=int, default=0, help="0 = teacher-forced only")
    p.add_argument("--max_new_tokens", type=int, default=64)
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args(argv)

    cfg = FlamingoTrainConfig.from_yaml(args.config) if args.config else FlamingoTrainConfig()
    if args.smoke:
        cfg.model_name = "test"
        cfg.audio_max_length = 16000
        cfg.eval_batch_size = 4

    tokenizer = get_tokenizer(getattr(cfg, "download_root", None), cfg.lang)
    vocab = tokenizer.add_tokens(["<laugh>"])
    model, w_cfg = build_whisper_flamingo(
        cfg.model_name, vocab_size=vocab,
        add_gated_x_attn=cfg.add_gated_x_attn,
        use_av_hubert_encoder=cfg.use_av_hubert_encoder,
        dtype="float32" if args.smoke else "bfloat16",
    )
    has_video = bool(cfg.add_gated_x_attn)

    if args.smoke:
        from avsl_tpu.cli.finetune import make_synthetic_dataset

        rows = make_synthetic_dataset(4)
    else:
        from avsl_tpu.cli.finetune import load_datasets

        _, _, rows = load_datasets(cfg)
        if rows is None:
            raise FileNotFoundError("no test dataset found")

    ds = AmiVideoDataset(
        rows, tokenizer, audio_max_length=int(cfg.audio_max_length),
        n_mels=w_cfg.n_mels, lang=cfg.lang, load_video=has_video,
    )
    collator = WhisperVideoCollator(
        eot_id=tokenizer.eot, max_label_len=w_cfg.n_text_ctx
    )

    def batches():
        bs = int(cfg.eval_batch_size)
        for i in range(0, len(ds) - bs + 1, bs):
            yield collator([ds[j] for j in range(i, i + bs)])

    probe = collator([ds[0]])
    init_kwargs = dict(video=probe.get("video")) if has_video else {}
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), probe["input_ids"], probe["dec_input_ids"],
        **init_kwargs,
    )
    params, batch_stats = variables["params"], variables.get("batch_stats")
    tx, _ = select_optimizer(params, cfg, 1)
    state = TrainState.create(params, tx, batch_stats=batch_stats)
    if args.ckpt_dir and latest_step(args.ckpt_dir) is not None:
        state = restore_checkpoint(args.ckpt_dir, state)
        print(f"restored checkpoint step {int(state.step)}")

    @jax.jit
    def eval_logits(state, batch):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        return model.apply(
            variables, batch["input_ids"], batch["dec_input_ids"],
            video=batch.get("video"), deterministic=True,
        )

    results = evaluate_wer(
        lambda b: eval_logits(state, b), batches(), tokenizer, prefix="test"
    )

    if args.beam > 0:
        special = tokenizer.special_token_set
        max_new = min(args.max_new_tokens, w_cfg.n_text_ctx - 6)

        @jax.jit
        def decode_batch(state, batch, prompt):
            variables = {"params": state.params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            feats, xv = model.apply(
                variables, batch["input_ids"], batch.get("video"),
                method=model.encode,
            )
            cache = model.apply(
                variables, feats, xv, max_new + 6, method=model.init_decode_cache
            )

            def step(tok, cache):
                # audio and video K/V ride the (beam-tiled) cache
                return model.apply(
                    variables, tok, None, None, cache, method=model.decode
                )

            return beam_search(step, cache, prompt, args.beam, max_new, tokenizer.eot)

        hyps, refs = [], []
        for batch in batches():
            prompt = np.tile(
                np.asarray(tokenizer.sot_sequence(cfg.lang))[None],
                (batch["input_ids"].shape[0], 1),
            )
            seqs, _ = decode_batch(state, batch, prompt)
            for o_row, l_row in zip(np.asarray(seqs), batch["labels"]):
                o_ids = [int(t) for t in o_row if int(t) not in special]
                l_ids = [int(t) for t in l_row if int(t) >= 0 and int(t) not in special]
                hyps.append(normalize_text(tokenizer.decode(o_ids)))
                refs.append(normalize_text(tokenizer.decode(l_ids)))
        wer, cer = wer_cer(hyps, refs)
        results["test/wer_beam"] = wer
        results["test/cer_beam"] = cer

    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
