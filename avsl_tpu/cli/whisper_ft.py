"""Audio-only Whisper fine-tuning entry point.

Usage: ``python -m avsl_tpu.cli.whisper_ft --config cfg.yaml --do_train
--do_eval`` (or ``--smoke``).

Capability parity with the reference's HF-Trainer path
(avsl/whisper_ft.py in /root/reference): ``<laugh>`` token add + embedding
resize, -100 label masking via the collator, WER metric, beam-search eval
(beam 4, max len 448), last-checkpoint resume, results.json. Expressed
through this framework's runner instead of transformers.Seq2SeqTrainer.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any, Dict, Iterator, List, Optional

import numpy as np


def main(argv: Optional[List[str]] = None) -> Dict[str, Any]:
    import jax

    from avsl_tpu.core.config import FlamingoTrainConfig
    from avsl_tpu.data.runtime import AmiVideoDataset, WhisperVideoCollator
    from avsl_tpu.data.tokenizer import get_tokenizer
    from avsl_tpu.decode import beam_search, normalize_text, wer_cer
    from avsl_tpu.models.factory import build_whisper_flamingo
    from avsl_tpu.train.loop import TrainState
    from avsl_tpu.train.objectives import flamingo_loss_fn
    from avsl_tpu.train.optim import whisper_optimizer
    from avsl_tpu.train.runner import TrainerRunner

    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None)
    p.add_argument("--do_train", action="store_true")
    p.add_argument("--do_eval", action="store_true")
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--num_beams", type=int, default=4)
    p.add_argument("--max_eval_tokens", type=int, default=448)
    p.add_argument("--output_dir", default="output/whisper_ft")
    args = p.parse_args(argv)

    cfg = FlamingoTrainConfig.from_yaml(args.config) if args.config else FlamingoTrainConfig()
    cfg.add_gated_x_attn = 0  # audio-only
    cfg.use_av_hubert_encoder = False
    if getattr(cfg, "early_stop_patience", None) is None:
        # reference default when the YAML doesn't set it:
        # EarlyStoppingCallback(early_stopping_patience=5) (whisper_ft.py:427);
        # an explicit 0 in the YAML disables early stopping
        cfg.early_stop_patience = 5
    if args.smoke:
        args.do_train = args.do_eval = True
        cfg.model_name = "test"
        cfg.num_train_steps = 4
        cfg.validate_every_n_batches = 100
        cfg.gradient_accumulation_steps = 1
        cfg.batch_size = 4
        cfg.audio_max_length = 16000
        cfg.warmup_steps = 1

    tokenizer = get_tokenizer(getattr(cfg, "download_root", None), cfg.lang)
    vocab = tokenizer.add_tokens(["<laugh>"])

    model, w_cfg = build_whisper_flamingo(
        cfg.model_name, vocab_size=vocab, add_gated_x_attn=0,
        use_av_hubert_encoder=False, dropout_rate=cfg.dropout_rate,
        dtype="float32" if args.smoke else "bfloat16",
    )

    if args.smoke:
        from avsl_tpu.cli.finetune import make_synthetic_dataset

        train_rows, eval_rows = make_synthetic_dataset(8), make_synthetic_dataset(4)
    else:
        from avsl_tpu.cli.finetune import load_datasets

        train_rows, eval_rows, _ = load_datasets(cfg)

    mk = lambda rows, tr: AmiVideoDataset(  # noqa: E731
        rows, tokenizer, audio_max_length=int(cfg.audio_max_length),
        n_mels=w_cfg.n_mels, lang=cfg.lang, load_video=False, train=tr,
    )
    train_ds, eval_ds = mk(train_rows, True), mk(eval_rows, False)
    collator = WhisperVideoCollator(
        eot_id=tokenizer.eot,
        max_label_len=min(args.max_eval_tokens, w_cfg.n_text_ctx),
    )

    def batches(ds, bs, shuffle, epoch=0) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(ds))
        if shuffle:
            order = np.random.default_rng(epoch).permutation(order)
        for i in range(0, len(order) - bs + 1, bs):
            yield collator([ds[int(j)] for j in order[i : i + bs]])

    probe = collator([train_ds[0]])
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), probe["input_ids"], probe["dec_input_ids"]
    )
    params = variables["params"]
    tx, _ = whisper_optimizer(params, cfg, int(cfg.num_train_steps))
    state = TrainState.create(params, tx)

    results: Dict[str, Any] = {}
    os.makedirs(args.output_dir, exist_ok=True)

    @jax.jit
    def eval_logits(state, batch):
        return model.apply(
            {"params": state.params}, batch["input_ids"], batch["dec_input_ids"],
            deterministic=True,
        )

    if args.do_train:
        runner = TrainerRunner(
            flamingo_loss_fn(model, train=True), eval_logits, tx, state,
            tokenizer, cfg,
            log_dir=os.path.join(args.output_dir, "logs"),
            ckpt_dir=os.path.join(args.output_dir, "ckpt"),
        )
        fit = runner.fit(
            train_batches=lambda e: batches(train_ds, int(cfg.batch_size), True, e),
            val_batches=lambda: batches(eval_ds, int(cfg.eval_batch_size), False),
            num_steps=int(cfg.num_train_steps),
            validate_every=int(cfg.validate_every_n_batches),
        )
        state = runner.state
        results["train"] = {
            "final_step": fit["final_step"],
            "best_wer": None if fit["best_wer"] == float("inf") else fit["best_wer"],
            "best_step": fit["best_step"],
        }

    if args.do_eval:
        # beam-search decode eval (reference: beam 4 / max length 448)
        max_new = min(args.max_eval_tokens, w_cfg.n_text_ctx) - 5

        @jax.jit
        def decode_batch(state, mel, prompt):
            feats, _ = model.apply({"params": state.params}, mel, method=model.encode)
            cache = model.apply(
                {"params": state.params}, feats, None, max_new + 5,
                method=model.init_decode_cache,
            )

            def step(tok, cache):
                return model.apply(
                    {"params": state.params}, tok, feats, None, cache,
                    method=model.decode,
                )

            return beam_search(
                step, cache, prompt, beam_size=args.num_beams,
                max_new_tokens=max_new, eot_id=tokenizer.eot,
            )

        hyps, refs = [], []
        special = tokenizer.special_token_set
        for batch in batches(eval_ds, int(cfg.eval_batch_size), False):
            prompt = np.tile(
                np.asarray(tokenizer.sot_sequence(cfg.lang))[None],
                (batch["input_ids"].shape[0], 1),
            )
            seqs, _scores = decode_batch(state, batch["input_ids"], prompt)
            for o_row, l_row in zip(np.asarray(seqs), batch["labels"]):
                o_ids = [int(t) for t in o_row if int(t) not in special]
                l_ids = [int(t) for t in l_row if int(t) >= 0 and int(t) not in special]
                hyps.append(normalize_text(tokenizer.decode(o_ids)))
                refs.append(normalize_text(tokenizer.decode(l_ids)))
        wer, cer = wer_cer(hyps, refs)
        results["eval"] = {"wer": wer, "cer": cer, "n": len(hyps)}

    with open(os.path.join(args.output_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
