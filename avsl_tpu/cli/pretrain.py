"""AV-HuBERT pretraining entry point (masked-cluster prediction).

Usage::

    python -m avsl_tpu.cli.pretrain --smoke
    python -m avsl_tpu.cli.pretrain --config avhubert_large.yaml \
        --num_clusters 500 [--km_model km.npz] [--steps N]

The reference repo fine-tunes fairseq-PRETRAINED checkpoints and has no
pretraining entry (the criterion lives in external fairseq); this CLI
closes the loop so the framework can go corpus -> targets -> pretrained
encoder -> fine-tune without external artifacts. The published recipe:

1. per-frame features (iteration 1: 39-dim MFCC+deltas —
   :func:`avsl_tpu.kernels.fbank.mfcc` / ``add_deltas``);
2. k-means codebook (:mod:`avsl_tpu.data.clustering`), reusable via
   ``--km_model`` npz;
3. masked-cluster prediction training
   (:class:`avsl_tpu.models.pretrain.AVHuBERTForPretraining`), with the
   same mesh knobs (tp / ep; dp implicit) as the fine-tune CLIs.

Without a real corpus (``--smoke`` or no ``--data``) it synthesizes
aligned audio/video with frame-level structure so the masked-prediction
accuracy is meaningfully learnable, and derives targets with the real
k-means path — the full recipe end-to-end.
"""

from __future__ import annotations

import argparse
import json
from typing import Any, Dict, Iterator, List, Optional

import numpy as np


def make_synthetic_pretrain_rows(
    n: int, t: int = 24, feat_dim: int = 104, image: int = 24, seed: int = 0,
) -> List[Dict[str, np.ndarray]]:
    """Aligned audio/video rows whose frames have k latent states, so
    cluster targets derived from the audio features are predictable from
    context (and from the video, which renders the same state)."""
    rng = np.random.default_rng(seed)
    protos = rng.normal(size=(4, feat_dim)).astype(np.float32) * 2.0
    rows = []
    for _ in range(n):
        # slowly-switching latent state sequence (predictable from span
        # context — the property masked prediction exploits)
        state = np.repeat(rng.integers(0, 4, t // 4 + 1), 4)[:t]
        audio = protos[state] + 0.3 * rng.normal(size=(t, feat_dim)).astype(
            np.float32
        )
        video = np.zeros((t, image, image, 1), np.float32)
        for i, s in enumerate(state):  # state renders as a bright quadrant
            qy, qx = divmod(int(s), 2)
            h = image // 2
            video[i, qy * h : (qy + 1) * h, qx * h : (qx + 1) * h, 0] = 1.0
        video += 0.1 * rng.normal(size=video.shape).astype(np.float32)
        rows.append({"audio_feats": audio, "video_feats": video})
    return rows


def collate_pretrain(rows, targets_per_row) -> Dict[str, np.ndarray]:
    b = len(rows)
    t = max(len(r["audio_feats"]) for r in rows)
    feat_dim = rows[0]["audio_feats"].shape[1]
    ih = rows[0]["video_feats"].shape[1]
    audio = np.zeros((b, t, feat_dim), np.float32)
    video = np.zeros((b, t, ih, ih, 1), np.float32)
    pad = np.zeros((b, t), bool)
    tgt = np.zeros((b, t), np.int32)
    for i, (r, tg) in enumerate(zip(rows, targets_per_row)):
        L = len(r["audio_feats"])
        audio[i, :L] = r["audio_feats"]
        video[i, :L] = r["video_feats"]
        pad[i, :L] = True
        tgt[i, :L] = tg[:L]
    return {"audio": audio, "video": video, "padding_mask": pad, "targets": tgt}


def main(argv: Optional[List[str]] = None) -> Dict[str, Any]:
    import jax
    import optax

    from avsl_tpu.core.config import AVHuBERTConfig
    from avsl_tpu.data.clustering import KMeansQuantizer
    from avsl_tpu.models.pretrain import AVHuBERTForPretraining
    from avsl_tpu.train.loop import TrainState, make_train_step
    from avsl_tpu.train.objectives import avhubert_pretrain_loss_fn
    from avsl_tpu.train.optim import linear_warmup_decay

    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None, help="fairseq-style model card YAML")
    p.add_argument("--num_clusters", type=int, default=100,
                   help="k-means codebook size (one target group)")
    p.add_argument("--km_model", default=None,
                   help="npz codebook to reuse / path to save a fresh fit")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--iterations", type=int, default=1,
                   help="HuBERT-style pretraining iterations: after each, "
                        "re-cluster on layer features and retrain fresh")
    p.add_argument("--relabel_layer", type=int, default=None,
                   help="1-indexed encoder layer tapped for iteration-2+ "
                        "clustering features (default: middle layer)")
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--n_experts", type=int, default=0)
    p.add_argument("--moe_top_k", type=int, default=2)
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--experts_parallel", type=int, default=1)
    args = p.parse_args(argv)

    if args.smoke:
        cfg = AVHuBERTConfig.tiny_test(
            dtype="float32", modality_dropout=0.2, audio_dropout=0.5,
            mask_prob_audio=0.5, mask_length_audio=4,
        )
        args.steps = min(args.steps, 6)
        args.num_clusters = min(args.num_clusters, 8)
    elif args.config:
        cfg = AVHuBERTConfig.from_yaml(args.config)
    else:
        cfg = AVHuBERTConfig()
    if args.n_experts > 0:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, n_experts=args.n_experts, moe_top_k=args.moe_top_k
        )

    rows = make_synthetic_pretrain_rows(
        4 * args.batch_size,
        feat_dim=cfg.audio_feat_dim,
        image=cfg.image_crop_size if not args.smoke else 24,
    )

    # --- targets: k-means over the per-frame audio features -------------
    quant = None
    if args.km_model:
        import os

        if os.path.exists(args.km_model):
            quant = KMeansQuantizer.load(args.km_model)
    if quant is None:
        all_feats = np.concatenate([r["audio_feats"] for r in rows])
        quant = KMeansQuantizer().fit(
            all_feats, k=args.num_clusters, n_iters=15, seed=0
        )
        if args.km_model:
            quant.save(args.km_model)
    targets = [quant(r["audio_feats"]) for r in rows]

    def batches(epoch=0) -> Iterator[Dict[str, np.ndarray]]:
        order = np.random.default_rng(epoch).permutation(len(rows))
        for i in range(0, len(order) - args.batch_size + 1, args.batch_size):
            sel = order[i : i + args.batch_size]
            yield collate_pretrain([rows[j] for j in sel],
                                   [targets[j] for j in sel])

    probe = next(batches())
    model = AVHuBERTForPretraining(cfg, num_classes=(quant.n_clusters,))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        audio=probe["audio"], video=probe["video"],
        targets=probe["targets"], padding_mask=probe["padding_mask"],
        deterministic=True,
    )

    relabel_layer = args.relabel_layer or max(1, cfg.num_hidden_layers // 2)

    tx = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adamw(
            linear_warmup_decay(args.lr, max(args.steps // 10, 1), args.steps),
            b1=0.9, b2=0.98, eps=1e-6, weight_decay=0.01,
        ),
    )
    loss_fn = avhubert_pretrain_loss_fn(model, train=True)

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
            mesh = make_mesh(len(jax.devices()), model_parallel=args.model_parallel)
    step = make_train_step(
        loss_fn, tx, mesh=mesh, donate=False, partitioned_state=mesh is not None
    )

    import contextlib

    # sequence parallelism lives inside make_train_step's traced body now;
    # kept as a no-op so the training loop's shape is unchanged
    scope = contextlib.nullcontext()

    iterations = []
    for iteration in range(max(1, args.iterations)):
        # HuBERT recipe: each iteration trains a FRESH model on the
        # current targets (iteration 1: MFCC-space k-means; 2+: k-means
        # over the previous model's layer features)
        if iteration > 0:
            variables = model.init(
                {"params": jax.random.PRNGKey(iteration),
                 "mask": jax.random.PRNGKey(100 + iteration)},
                audio=probe["audio"], video=probe["video"],
                targets=probe["targets"], padding_mask=probe["padding_mask"],
                deterministic=True,
            )
        state = TrainState.create(
            variables["params"], tx, batch_stats=variables.get("batch_stats")
        )
        if mesh is not None:
            state = shard_state(state, mesh)
            n_sharded = len(describe_shardings(state.params, mesh))

        it = batches(0)
        epoch = 0
        losses: List[float] = []
        with scope:
            for _ in range(args.steps):
                try:
                    batch = next(it)
                except StopIteration:
                    epoch += 1
                    it = batches(epoch)
                    batch = next(it)
                state, metrics = step(state, batch)
                losses.append(float(metrics["loss"]))

        eval_fn = avhubert_pretrain_loss_fn(model, train=False)
        eval_loss, (m, _) = eval_fn(
            state.params, state.batch_stats, probe, jax.random.PRNGKey(42)
        )
        iterations.append({
            "first_loss": losses[0],
            "last_loss": losses[-1],
            "eval_loss": float(eval_loss),
            "eval_acc_masked": float(m["acc_m"]),
            "eval_acc_unmasked": float(m["acc_u"]),
        })

        if iteration + 1 < args.iterations:
            # re-cluster on layer features (iteration 2+ targets)
            from avsl_tpu.data.clustering import KMeansQuantizer as _KQ
            from avsl_tpu.models.pretrain import extract_layer_features

            var = {"params": state.params}
            if state.batch_stats is not None:
                var["batch_stats"] = state.batch_stats
            feats_rows = []
            for i in range(0, len(rows), args.batch_size):
                chunk = rows[i : i + args.batch_size]
                b = collate_pretrain(
                    chunk, [np.zeros(len(r["audio_feats"]), np.int32)
                            for r in chunk]
                )
                feats = np.asarray(extract_layer_features(
                    model, var, relabel_layer,
                    audio=b["audio"], video=b["video"],
                    padding_mask=b["padding_mask"],
                ))
                for j, r in enumerate(chunk):
                    feats_rows.append(feats[j, : len(r["audio_feats"])])
            quant = _KQ().fit(
                np.concatenate(feats_rows), k=args.num_clusters,
                n_iters=15, seed=iteration,
            )
            targets = [quant(f) for f in feats_rows]

    if args.checkpoint_dir:
        from avsl_tpu.train.checkpoints import save_checkpoint

        save_checkpoint(args.checkpoint_dir, state, step=args.steps)

    result = {
        "steps": args.steps,
        "num_clusters": int(quant.n_clusters),
        "iterations": iterations,
        "relabel_layer": relabel_layer if args.iterations > 1 else None,
        **iterations[-1],
    }
    if mesh is not None:
        result["mesh"] = {k: int(v) for k, v in mesh.shape.items()}
        result["sharded_params"] = n_sharded
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
