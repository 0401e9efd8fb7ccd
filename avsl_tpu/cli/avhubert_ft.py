"""AV-HuBERT fine-tuning entry point (seq2seq or CTC head).

Usage: ``python -m avsl_tpu.cli.avhubert_ft --config avhubert.yaml
[--head seq2seq|ctc] [--smoke]``

Trains the in-tree AV-HuBERT stack (the reference ships the model classes
at avsl/modules/ but no training entry for them — its training entry is
the Whisper-Flamingo path; this CLI closes that gap): 104-dim stacked
log-fbank audio + 88x88 lip features through the fusion encoder, with a
label-smoothed seq2seq decoder or a CTC head, modality dropout, span
masking, and the same runner/checkpoint machinery as the other entries.
"""

from __future__ import annotations

import argparse
import json
from typing import Any, Dict, Iterator, List, Optional

import numpy as np


def make_synthetic_av_batchset(
    n: int, t: int = 24, feat_dim: int = 104, image: int = 24, vocab: int = 59,
    seed: int = 0,
):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        L = rng.integers(3, 8)
        labels = rng.integers(4, vocab - 1, L).tolist()
        rows.append(
            {
                "audio_feats": rng.normal(size=(t, feat_dim)).astype(np.float32),
                "video_feats": rng.normal(size=(t, image, image, 1)).astype(np.float32),
                "labels": labels,
            }
        )
    return rows


def collate_av(rows, pad_id: int, max_label_len: int = 16) -> Dict[str, np.ndarray]:
    b = len(rows)
    t = max(len(r["audio_feats"]) for r in rows)
    feat_dim = rows[0]["audio_feats"].shape[1]
    ih = rows[0]["video_feats"].shape[1]
    audio = np.zeros((b, t, feat_dim), np.float32)
    video = np.zeros((b, t, ih, ih, 1), np.float32)
    pad_mask = np.zeros((b, t), bool)
    lab_len = min(max(len(r["labels"]) + 1 for r in rows), max_label_len)
    labels = np.full((b, lab_len), -100, np.int64)
    dec = np.full((b, lab_len), pad_id, np.int64)
    for i, r in enumerate(rows):
        L = len(r["audio_feats"])
        audio[i, :L] = r["audio_feats"]
        video[i, :L] = r["video_feats"]
        pad_mask[i, :L] = True
        ids = (r["labels"] + [2])[:lab_len]  # eos terminated
        labels[i, : len(ids)] = ids
        dec[i, 0] = 0  # bos
        dec[i, 1 : len(ids)] = ids[:-1]  # shift-right teacher forcing
    return {
        "audio": audio,
        "video": video,
        "padding_mask": pad_mask,
        "labels": labels,
        "dec_input_ids": dec,
    }


def main(argv: Optional[List[str]] = None) -> Dict[str, Any]:
    import jax
    import jax.numpy as jnp
    import optax

    from avsl_tpu.core.config import AVHuBERTConfig
    from avsl_tpu.models.avhubert import (
        AVHuBERTForCTC,
        AVHuBERTForSpeech2Text,
        ctc_loss,
    )
    from avsl_tpu.train.loop import TrainState, make_train_step
    from avsl_tpu.train.objectives import avhubert_seq2seq_loss_fn
    from avsl_tpu.train.optim import linear_warmup_decay

    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None, help="fairseq-style model card YAML")
    p.add_argument("--head", choices=("seq2seq", "ctc"), default="seq2seq")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--smoke", action="store_true")
    # parallelism (beyond data-parallel): Megatron-style tensor parallelism
    # over a `model` mesh axis, or — with --n_experts — MoE expert
    # parallelism over an `expert` axis (models/moe.py). n_experts is also
    # accepted as a flat key in the --config YAML.
    p.add_argument("--n_experts", type=int, default=0,
                   help="swap encoder MLPs for a MoE FFN with N experts")
    p.add_argument("--moe_top_k", type=int, default=2)
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--experts_parallel", type=int, default=1)
    args = p.parse_args(argv)

    if args.smoke:
        cfg = AVHuBERTConfig.tiny_test(
            dtype="float32", modality_dropout=0.2, audio_dropout=0.5
        )
        args.steps = 6
    elif args.config:
        cfg = AVHuBERTConfig.from_yaml(args.config)
    else:
        cfg = AVHuBERTConfig()
    if args.n_experts > 0:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, n_experts=args.n_experts, moe_top_k=args.moe_top_k
        )

    rows = make_synthetic_av_batchset(
        4 * args.batch_size, image=cfg.image_crop_size if not args.smoke else 24,
        vocab=cfg.vocab_size,
    )

    def batches(epoch=0) -> Iterator[Dict[str, np.ndarray]]:
        order = np.random.default_rng(epoch).permutation(len(rows))
        for i in range(0, len(order) - args.batch_size + 1, args.batch_size):
            yield collate_av(
                [rows[j] for j in order[i : i + args.batch_size]], cfg.pad_token_id
            )

    probe = next(batches())
    if args.head == "seq2seq":
        model = AVHuBERTForSpeech2Text(cfg)
        variables = model.init(
            jax.random.PRNGKey(0),
            audio=probe["audio"], video=probe["video"],
            labels=probe["labels"], padding_mask=probe["padding_mask"],
        )
        loss_fn = avhubert_seq2seq_loss_fn(model, train=True)

        def eval_loss(params, batch_stats, batch):
            lf = avhubert_seq2seq_loss_fn(model, train=False)
            loss, _ = lf(params, batch_stats, batch, jax.random.PRNGKey(0))
            return loss
    else:
        model = AVHuBERTForCTC(cfg)
        variables = model.init(
            jax.random.PRNGKey(0),
            audio=probe["audio"], video=probe["video"],
            padding_mask=probe["padding_mask"],
        )

        def _ctc(params, batch_stats, batch, rng, train):
            var = {"params": params["params"] if "params" in params else params}
            if batch_stats is not None:
                var["batch_stats"] = batch_stats
            rngs = (
                {"dropout": rng, "modality": rng, "mask": rng} if train else None
            )
            mutable = ["batch_stats"] if (train and batch_stats is not None) else []
            if cfg.n_experts > 0:
                mutable = mutable + ["intermediates"]
            mutable = mutable or False
            out = model.apply(
                var, audio=batch["audio"], video=batch["video"],
                padding_mask=batch["padding_mask"], deterministic=not train,
                rngs=rngs, mutable=mutable,
            )
            if mutable:
                logits, upd = out
                new_stats = upd.get("batch_stats", batch_stats)
            else:
                logits, new_stats = out, batch_stats
            labels = jnp.where(batch["labels"] == -100, cfg.pad_token_id, batch["labels"])
            label_pad = (batch["labels"] == -100).astype(jnp.float32)
            logit_pad = 1.0 - batch["padding_mask"].astype(jnp.float32)
            loss = ctc_loss(logits, logit_pad, labels, label_pad, cfg.pad_token_id)
            if cfg.n_experts > 0:
                from avsl_tpu.models.moe import moe_aux_loss

                loss = loss + 0.01 * moe_aux_loss(upd.get("intermediates", {}))
            return loss, ({}, new_stats)

        loss_fn = lambda p, s, b, r: _ctc(p, s, b, r, True)  # noqa: E731

        eval_logits_cache: Dict[str, Any] = {}

        def eval_loss(params, batch_stats, batch):
            # one forward serves both the loss and the CTC decode below
            var = {"params": params["params"] if "params" in params else params}
            if batch_stats is not None:
                var["batch_stats"] = batch_stats
            logits = model.apply(
                var, audio=batch["audio"], video=batch["video"],
                padding_mask=batch["padding_mask"], deterministic=True,
            )
            eval_logits_cache["logits"] = logits
            labels = jnp.where(batch["labels"] == -100, cfg.pad_token_id, batch["labels"])
            label_pad = (batch["labels"] == -100).astype(jnp.float32)
            logit_pad = 1.0 - batch["padding_mask"].astype(jnp.float32)
            return ctc_loss(logits, logit_pad, labels, label_pad, cfg.pad_token_id)

    params, batch_stats = variables["params"], variables.get("batch_stats")
    tx = optax.chain(
        optax.clip_by_global_norm(10.0),  # reference clip_norm (avhubert card)
        optax.adamw(
            linear_warmup_decay(args.lr, max(args.steps // 10, 1), args.steps),
            b1=0.9, b2=0.98, eps=1e-6, weight_decay=0.01,
        ),
    )
    # optional tp / ep mesh (dp is implicit when a mesh exists: dim 0 of
    # every batch leaf shards over the leftover `data` axis)
    mesh = None
    n_sharded = 0
    if args.experts_parallel > 1 or args.model_parallel > 1:
        from avsl_tpu.core.mesh import make_mesh
        from avsl_tpu.core.partitioning import describe_shardings, shard_state

        if args.experts_parallel > 1:
            from avsl_tpu.models.moe import make_ep_mesh

            mesh = make_ep_mesh(
                len(jax.devices()), experts_parallel=args.experts_parallel
            )
        else:
            mesh = make_mesh(
                len(jax.devices()), model_parallel=args.model_parallel
            )
    step = make_train_step(
        loss_fn, tx, mesh=mesh, donate=False, partitioned_state=mesh is not None
    )
    state = TrainState.create(params, tx, batch_stats=batch_stats)
    if mesh is not None:
        state = shard_state(state, mesh)
        n_sharded = len(describe_shardings(state.params, mesh))

    import contextlib

    # sequence parallelism lives inside make_train_step's traced body now;
    # kept as a no-op so the training loop's shape is unchanged
    scope = contextlib.nullcontext()
    it = batches(0)
    epoch = 0
    losses = []
    with scope:
        for s in range(args.steps):
            try:
                batch = next(it)
            except StopIteration:
                epoch += 1
                it = batches(epoch)
                batch = next(it)
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))

    final_eval = float(eval_loss({"params": state.params}, state.batch_stats, probe))
    result = {
        "head": args.head,
        "steps": args.steps,
        "first_loss": losses[0],
        "last_loss": losses[-1],
        "eval_loss": final_eval,
    }
    if mesh is not None:
        result["mesh"] = {k: int(v) for k, v in mesh.shape.items()}
        result["sharded_params"] = n_sharded
    if args.n_experts > 0:
        result["n_experts"] = args.n_experts
    if args.head == "ctc":
        # best-path decode of the eval batch (collapse repeats, drop
        # blanks = pad id) + mean path log-prob as confidence; reuses the
        # logits the eval-loss forward already produced (_eval_logits is
        # stashed by eval_loss — one forward serves both)
        from avsl_tpu.decode import ctc_best_path_scores

        seqs, scores = ctc_best_path_scores(
            np.asarray(eval_logits_cache["logits"]), blank_id=cfg.pad_token_id,
            logit_pad=1.0 - probe["padding_mask"].astype(np.float32),
        )
        result["ctc_decoded_lens"] = [len(s) for s in seqs]
        result["ctc_mean_logprob"] = float(np.mean(scores))
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
