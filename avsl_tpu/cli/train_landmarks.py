"""Train the CNN landmark detector: synthetic faces + pseudo-labeled real footage.

Usage: ``python -m avsl_tpu.cli.train_landmarks [--steps 3000]
[--n_train 20000] [--pseudo_video CLIP.mp4 ...]
[--out avsl_tpu/data/assets/landmark_cnn.npz]``

Samples come from data/synthetic_faces.py (canonical 68-point layout
under random similarity transforms, rendered as intensity blobs with
structured backgrounds and occluders) plus — when ``--pseudo_video``
clips are given — real frames pseudo-labeled by the RefinedMouthTracker
(the golden-validated preprocessing default) under crop/scale/photometric
augmentation (synthetic_faces.pseudo_label_dataset). This is the
fine-tune the round-2 VERDICT asked for: the CNN learns real-face
appearance at real scales from the tracker's labels. Loss is L1 on
normalized coordinates with 3x weight on the mouth points 48..67 (the
crop consumer). Weights save as a flat .npz the CNNLandmarkDetector loads by
default.
"""

from __future__ import annotations

import argparse
import os

import time
from typing import List, Optional

import numpy as np


def main(argv: Optional[List[str]] = None) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from avsl_tpu.data.landmarks import DEFAULT_CNN_WEIGHTS, landmark_net, save_cnn_params
    from avsl_tpu.data.synthetic_faces import generate_dataset

    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--n_train", type=int, default=20000)
    p.add_argument("--n_val", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=DEFAULT_CNN_WEIGHTS)
    p.add_argument("--pseudo_video", action="append", default=[],
                   help="real clip(s) to pseudo-label with the refined "
                        "tracker and mix into training (repeatable)")
    p.add_argument("--pseudo_per_frame", type=int, default=8)
    p.add_argument("--pseudo_weight", type=float, default=0.5,
                   help="fraction of each batch drawn from pseudo samples")
    args = p.parse_args(argv)

    t0 = time.time()
    imgs, lms = generate_dataset(args.n_train, seed=args.seed)
    val_imgs, val_lms = generate_dataset(args.n_val, seed=args.seed + 1)
    print(f"generated {args.n_train}+{args.n_val} samples in {time.time()-t0:.0f}s")

    pseudo_imgs = pseudo_lms = None
    if args.pseudo_video:
        from avsl_tpu.data.synthetic_faces import pseudo_label_dataset

        t0 = time.time()
        pseudo_imgs, pseudo_lms = pseudo_label_dataset(
            args.pseudo_video, per_frame=args.pseudo_per_frame,
            seed=args.seed + 2,
        )
        print(f"pseudo-labeled {len(pseudo_imgs)} real samples from "
              f"{len(args.pseudo_video)} clip(s) in {time.time()-t0:.0f}s")
        if not len(pseudo_imgs):
            pseudo_imgs = pseudo_lms = None

    net = landmark_net()
    params = net.init(
        jax.random.PRNGKey(args.seed), jnp.zeros((1, 128, 128, 1), jnp.float32)
    )
    tx = optax.adamw(
        optax.warmup_cosine_decay_schedule(0.0, args.lr, 100, args.steps),
        weight_decay=1e-4,
    )
    opt_state = tx.init(params)

    weights = np.ones((68, 1), np.float32)
    weights[48:68] = 3.0  # the mouth drives the crop
    weights = jnp.asarray(weights / weights.mean())

    def loss_fn(params, x, y):
        pred = net.apply(params, x)
        return jnp.mean(jnp.abs(pred - y) * weights)

    @jax.jit
    def step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def val_err_px(params, x, y):
        pred = net.apply(params, x)
        return jnp.mean(jnp.abs(pred - y)) * 128, jnp.mean(
            jnp.abs(pred[:, 48:68] - y[:, 48:68])
        ) * 128

    rng = np.random.default_rng(args.seed)
    x_all = jnp.asarray(imgs[..., None] / 255.0)
    y_all = jnp.asarray(lms)
    xv = jnp.asarray(val_imgs[..., None] / 255.0)
    yv = jnp.asarray(val_lms)
    if pseudo_imgs is not None:
        xp = jnp.asarray(pseudo_imgs[..., None] / 255.0)
        yp = jnp.asarray(pseudo_lms)
        n_pseudo_batch = int(args.batch_size * args.pseudo_weight)

    t0 = time.time()
    loss = float("nan")
    for s in range(args.steps):
        idx = rng.integers(0, args.n_train, args.batch_size)
        xb, yb = x_all[idx], y_all[idx]
        if pseudo_imgs is not None and n_pseudo_batch:
            pidx = rng.integers(0, len(pseudo_imgs), n_pseudo_batch)
            xb = jnp.concatenate([xb[n_pseudo_batch:], xp[pidx]])
            yb = jnp.concatenate([yb[n_pseudo_batch:], yp[pidx]])
        params, opt_state, loss = step(params, opt_state, xb, yb)
        if (s + 1) % 500 == 0:
            err, mouth_err = val_err_px(params, xv[:256], yv[:256])
            print(
                f"step {s+1}: loss {float(loss):.4f} val {float(err):.2f}px "
                f"mouth {float(mouth_err):.2f}px ({(s+1)/(time.time()-t0):.1f} it/s)"
            )

    err, mouth_err = val_err_px(params, xv, yv)
    result = {
        "steps": args.steps,
        "final_loss": float(loss),
        "val_px_error": float(err),
        "val_mouth_px_error": float(mouth_err),
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    save_cnn_params(jax.device_get(params), args.out)
    print("saved", args.out, result)
    return result


if __name__ == "__main__":
    main()
