"""Loss closures binding models to the generic train step.

Batch layouts mirror the reference collator outputs
(WhisperVideoCollatorWithPadding contract, SURVEY.md §2.7): ``input_ids``
(mel), ``dec_input_ids``, ``labels`` (-100 padded), ``video``, and a
``padding_mask`` over video/audio frames."""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from avsl_tpu.models.avhubert import cross_entropy_loss


def _has_moe_aux(intermediates) -> bool:
    """True if the collection contains a sown ``moe_aux`` anywhere — the
    encoder wrapper also sows ``extracted_features`` (pretraining feature
    penalty), so a non-empty collection no longer implies MoE routers."""
    from collections.abc import Mapping

    def _walk(node):
        if isinstance(node, Mapping):
            return any(
                k == "moe_aux" or _walk(v) for k, v in node.items()
            )
        return False

    return _walk(intermediates)


def flamingo_loss_fn(model, train: bool = True, freeze_video_bn_stats: bool = False,
                     spec_augment: Optional[str] = None,
                     prob_av: float = 1.0, prob_a: float = 0.0,
                     moe_aux_coef: float = 0.01):
    """CE loss for Whisper(+Flamingo): encoder(mel, video) -> decoder(...).

    ``freeze_video_bn_stats`` mirrors the reference's
    freeze_video_batch_norm_stats regime (video BN uses running stats and
    never updates — whisper_flamingo_ft_ami.py:508-509).
    ``spec_augment``: "ls-basic" | "ls-double" applies on-device
    SpecAugment to the mel batch during training (the reference does it
    per item on the host — whisper_flamingo_ft_ami.py:216-226).
    ``prob_av``/``prob_a`` implement the external fork's train-time AV-mode
    mixing (``whisper.load_model(..., prob_av, prob_a)`` contract,
    whisper_flamingo_ft_ami.py:337-348; YAML keys ``prob_use_av`` /
    ``prob_use_a``). Per training step one mode is drawn: with probability
    ``prob_av`` both modalities are used as-is; with ``prob_a`` the
    *projected video features* are zeroed (audio-only — zeroing raw pixels
    instead puts a zero-variance batch through the video trunk's
    BatchNorms, whose backward scales by 1/sqrt(eps) per layer; measured
    grad explosion -> NaN within a few mixed-mode Adam steps); with the
    remainder the mel is zeroed (video-only — the Whisper encoder is
    LayerNorm-only, so a zero mel is numerically safe).
    Zero-multipliers keep shapes static — no retracing.

    The ``intermediates`` collection is always collected so a MoE AV trunk
    (``AVHuBERTConfig.n_experts > 0`` inside the video encoder) gets its
    Switch balance loss added (``moe_aux_coef``); with a dense trunk
    :func:`avsl_tpu.models.moe.moe_aux_loss` returns 0 and nothing
    changes."""

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params["params"] if "params" in params else params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        # split ONCE up front: the dropout/modality streams must not be
        # the same key later re-split for SpecAugment / AV-mode draws
        # (key reuse correlates the mechanisms), and an AV-HuBERT trunk
        # with modality_dropout > 0 calls make_rng('modality') in
        # training — omitting that stream is a flax InvalidRngError
        rng, drop_key, modal_key = jax.random.split(rng, 3)
        rngs = {"dropout": drop_key, "modality": modal_key} if train else None
        update_stats = train and batch_stats is not None and not freeze_video_bn_stats
        mutable = (["batch_stats"] if update_stats else []) + ["intermediates"]

        if "enc_features" in batch:
            # Hoisted-tower path: the FROZEN towers already ran, batched
            # over every accumulation micro-step in one program
            # (flamingo_tower_precompute via make_train_step's
            # precompute_fn) — SpecAugment and the AV-mode draw happened
            # there too. Only the trainable tail (video_projection +
            # gated x-attn decoder) runs under grad here. A frozen MoE
            # trunk's balance aux is skipped on this path: it carries no
            # gradient (router frozen), so the update is unchanged.
            logits = model.apply(
                variables,
                batch["dec_input_ids"],
                batch["enc_features"],
                video_feats=batch.get("video_feats"),
                video_feature_scale=batch.get("video_scale"),
                deterministic=not train,
                rngs=rngs,
                method="project_and_decode",
            )
            loss = cross_entropy_loss(
                logits, batch["labels"], label_smoothing=0.0
            )
            return loss, ({}, batch_stats)

        mel = batch["input_ids"]
        if train and spec_augment in ("ls-basic", "ls-double"):
            from avsl_tpu.kernels.specaugment import spec_augment_batch

            n = 1 if spec_augment == "ls-basic" else 2
            rng, sa_key = jax.random.split(rng)
            frames = batch.get(
                "audio_frames",
                jnp.full((mel.shape[0],), mel.shape[-1], jnp.int32),
            )
            # mel is [B, n_mels, T]; spec_augment wants time-major
            mel = spec_augment_batch(
                mel.transpose(0, 2, 1), sa_key, frames, n_freq_mask=n, n_time_mask=n
            ).transpose(0, 2, 1)

        video = batch.get("video")
        video_scale = None
        if train and video is not None and (prob_av < 1.0 or prob_a > 0.0):
            rng, mode_key = jax.random.split(rng)
            u = jax.random.uniform(mode_key, ())
            audio_only = (u >= prob_av) & (u < prob_av + prob_a)
            video_scale = jnp.where(audio_only, 0.0, 1.0)
            keep_audio = (u < prob_av + prob_a).astype(mel.dtype)
            mel = mel * keep_audio

        out = model.apply(
            variables,
            mel,
            batch["dec_input_ids"],
            video=video,
            video_mask=batch.get("video_mask"),
            video_feature_scale=video_scale,
            deterministic=not train,
            freeze_video_bn_stats=freeze_video_bn_stats,
            rngs=rngs,
            mutable=mutable,
        )
        logits, updates = out
        new_stats = updates.get("batch_stats", batch_stats)
        loss = cross_entropy_loss(logits, batch["labels"], label_smoothing=0.0)
        metrics = {}
        inter = updates.get("intermediates")
        if inter and _has_moe_aux(inter):
            from avsl_tpu.models.moe import moe_aux_loss

            aux = moe_aux_loss(inter)
            if train:  # eval loss stays pure CE (comparable across configs)
                loss = loss + moe_aux_coef * aux
            metrics["moe_aux"] = aux
        return loss, (metrics, new_stats)

    return loss_fn


def flamingo_tower_precompute(model, train: bool = True,
                              freeze_video_bn_stats: bool = True,
                              spec_augment: Optional[str] = None,
                              prob_av: float = 1.0, prob_a: float = 0.0):
    """Batched frozen-tower forward for :func:`flamingo_loss_fn`.

    Under the encoder-freezing regimes (reference
    whisper_flamingo_ft_ami.py:506-517 — ``video_projection`` /
    ``flamingo_projection``: Whisper encoder + AV-HuBERT tower frozen) the
    towers are forward-only; re-running them INSIDE the grad-accumulation
    scan wastes the MXU on accum-many B=1 forwards. This builds
    ``make_train_step``'s ``precompute_fn``: one program runs both towers
    over the whole stacked batch ([accum, micro, ...] -> one
    [accum*micro, ...] forward) and returns per-micro context the scan
    feeds back into the loss (keys ``enc_features``, ``video_feats``,
    ``video_scale``). Gradients are identical to the in-scan path — the
    towers have none under the freeze regime either way; the trainable
    ``video_projection`` stays inside the differentiated loss
    (``Whisper.project_and_decode``).

    The stochastic input transforms whose draws feed the towers move here
    with it: SpecAugment on the mel, and the per-micro-step AV-mode draw
    (``prob_av``/``prob_a``) — the mel zeroing applies before the encoder,
    while the drawn ``video_scale`` rides the context to the decoder tail.
    Key assignment differs from the in-scan path (one batched draw instead
    of accum chained draws), identical in distribution.

    Constraints (asserted by the caller, train/runner.py): every param the
    towers read must be frozen, video BN must use running stats
    (``freeze_video_bn_stats``), and tower LayerDrop must be 0 (a shared
    batched draw would correlate micro-steps).
    """

    def pre_fn(params, batch_stats, batch, rng):
        variables = {"params": params["params"] if "params" in params else params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats

        mel = batch["input_ids"]
        dec = batch["dec_input_ids"]
        stacked = dec.ndim == 3  # [accum, micro, L] vs [micro, L]
        a = mel.shape[0] if stacked else 1

        def flat(x):
            return x.reshape((-1,) + x.shape[2:]) if stacked and x is not None else x

        def unflat(x):
            return x.reshape((a, -1) + x.shape[1:]) if stacked and x is not None else x

        rng, drop_key, modal_key = jax.random.split(rng, 3)
        rngs = {"dropout": drop_key, "modality": modal_key} if train else None

        mel_f = flat(mel)
        if train and spec_augment in ("ls-basic", "ls-double"):
            from avsl_tpu.kernels.specaugment import spec_augment_batch

            n = 1 if spec_augment == "ls-basic" else 2
            rng, sa_key = jax.random.split(rng)
            frames = batch.get("audio_frames")
            frames = flat(frames) if frames is not None else jnp.full(
                (mel_f.shape[0],), mel_f.shape[-1], jnp.int32
            )
            mel_f = spec_augment_batch(
                mel_f.transpose(0, 2, 1), sa_key, frames,
                n_freq_mask=n, n_time_mask=n,
            ).transpose(0, 2, 1)

        video = batch.get("video")
        ctx = {}
        if train and video is not None and (prob_av < 1.0 or prob_a > 0.0):
            rng, mode_key = jax.random.split(rng)
            # one mode draw PER MICRO-STEP, exactly like the in-scan path
            u = jax.random.uniform(mode_key, (a,) if stacked else ())
            audio_only = (u >= prob_av) & (u < prob_av + prob_a)
            ctx["video_scale"] = jnp.where(audio_only, 0.0, 1.0)
            keep_audio = (u < prob_av + prob_a).astype(mel_f.dtype)
            if stacked:
                micro = mel_f.shape[0] // a
                keep_audio = jnp.repeat(keep_audio, micro)
            mel_f = mel_f * keep_audio[:, None, None]

        features, v = model.apply(
            variables,
            mel_f,
            video=flat(video),
            video_mask=flat(batch.get("video_mask")),
            deterministic=not train,
            freeze_video_bn_stats=freeze_video_bn_stats,
            rngs=rngs,
            method="encode_towers",
        )
        ctx["enc_features"] = unflat(features)
        if v is not None:
            ctx["video_feats"] = unflat(v)
        return ctx

    return pre_fn


def avhubert_seq2seq_loss_fn(model, train: bool = True, label_smoothing: Optional[float] = None,
                             moe_aux_coef: float = 0.01):
    """Label-smoothed CE for AVHuBERTForSpeech2Text.

    When ``cfg.n_experts > 0`` the encoder's MoE routers sow a Switch
    load-balance loss; it is added as ``moe_aux_coef * aux`` (Switch
    Transformer's alpha = 0.01) and reported in the metrics."""

    smoothing = model.cfg.label_smoothing if label_smoothing is None else label_smoothing
    moe_on = getattr(model.cfg, "n_experts", 0) > 0

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params["params"] if "params" in params else params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        r1, r2, r3 = jax.random.split(rng, 3)
        rngs = {"dropout": r1, "modality": r2, "mask": r3} if train else None
        mutable = ["batch_stats"] if (train and batch_stats is not None) else []
        if moe_on:
            mutable = mutable + ["intermediates"]
        mutable = mutable or False

        out = model.apply(
            variables,
            audio=batch.get("audio"),
            video=batch.get("video"),
            labels=None,
            decoder_input_ids=batch["dec_input_ids"],
            padding_mask=batch.get("padding_mask"),
            audio_present=batch.get("audio_present"),
            video_present=batch.get("video_present"),
            deterministic=not train,
            rngs=rngs,
            mutable=mutable,
        )
        if mutable:
            result, updates = out
            new_stats = updates.get("batch_stats", batch_stats)
        else:
            result, new_stats = out, batch_stats
        loss = cross_entropy_loss(
            result["logits"], batch["labels"], label_smoothing=smoothing
        )
        metrics = {}
        if moe_on:
            from avsl_tpu.models.moe import moe_aux_loss

            aux = moe_aux_loss(updates.get("intermediates", {}))
            if train:  # eval loss stays pure CE (comparable across configs)
                loss = loss + moe_aux_coef * aux
            metrics["moe_aux"] = aux
        return loss, (metrics, new_stats)

    return loss_fn


def avhubert_ctc_loss_fn(model, train: bool = True, moe_aux_coef: float = 0.01):
    """CTC loss for AVHuBERTForCTC (blank = pad id, zero-length guards —
    reference av_hubert_model.py:1022-1040).

    Batch keys: ``audio``/``video``, ``labels`` [B, L] token ids,
    ``label_padding`` [B, L] (1 = PAD), optional ``logit_padding`` [B, T']
    over DOWNSAMPLED encoder frames (replicates the reference's
    downsample-aware attention-mask recompute) — defaults to no padding.
    ``cfg.n_experts > 0`` adds the MoE Switch balance loss (see
    :func:`avhubert_seq2seq_loss_fn`)."""
    import jax.numpy as jnp

    from avsl_tpu.models.avhubert import ctc_loss

    moe_on = getattr(model.cfg, "n_experts", 0) > 0

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params["params"] if "params" in params else params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        r1, r2, r3 = jax.random.split(rng, 3)
        rngs = {"dropout": r1, "modality": r2, "mask": r3} if train else None
        mutable = ["batch_stats"] if (train and batch_stats is not None) else []
        if moe_on:
            mutable = mutable + ["intermediates"]
        mutable = mutable or False
        out = model.apply(
            variables,
            audio=batch.get("audio"),
            video=batch.get("video"),
            padding_mask=batch.get("padding_mask"),
            deterministic=not train,
            rngs=rngs,
            mutable=mutable,
        )
        if mutable:
            logits, updates = out
            new_stats = updates.get("batch_stats", batch_stats)
        else:
            logits, new_stats = out, batch_stats
        logit_padding = batch.get(
            "logit_padding", jnp.zeros(logits.shape[:2], jnp.float32)
        )
        loss = ctc_loss(
            logits, logit_padding, batch["labels"], batch["label_padding"],
            blank_id=model.cfg.pad_token_id,
        )
        metrics = {}
        if moe_on:
            from avsl_tpu.models.moe import moe_aux_loss

            aux = moe_aux_loss(updates.get("intermediates", {}))
            if train:  # eval loss stays pure CTC (comparable across configs)
                loss = loss + moe_aux_coef * aux
            metrics["moe_aux"] = aux
        return loss, (metrics, new_stats)

    return loss_fn


def avhubert_pretrain_loss_fn(model, train: bool = True,
                              masked_weight: float = 1.0,
                              nomask_weight: float = 1.0,
                              feature_pen_weight: float = 10.0,
                              moe_aux_coef: float = 0.01):
    """Masked-cluster prediction loss for AVHuBERTForPretraining.

    Batch keys: ``audio``/``video``, ``targets`` [B, T] (or [B, T, G])
    per-frame cluster ids, optional ``padding_mask`` [B, T] (1 = valid).
    fairseq HubertCriterion semantics: ``pred_masked_weight`` /
    ``pred_nomask_weight`` weighting, L2 feature penalty on the
    pre-projection fused features (``loss_weights=[10]`` default), the
    ``skip_masked``/``skip_nomask`` gates living on the model config.
    """
    from avsl_tpu.models.pretrain import extracted_features_from, pretrain_loss

    moe_on = getattr(model.cfg, "n_experts", 0) > 0

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params["params"] if "params" in params else params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        r1, r2, r3 = jax.random.split(rng, 3)
        # the mask stream is needed in eval too (validation of a
        # pretraining run measures MASKED prediction, like fairseq's)
        rngs = {"dropout": r1, "modality": r2, "mask": r3} if train else {"mask": r3}
        mutable = ["intermediates"] + (
            ["batch_stats"] if (train and batch_stats is not None) else []
        )
        out, updates = model.apply(
            variables,
            audio=batch.get("audio"),
            video=batch.get("video"),
            targets=batch["targets"],
            padding_mask=batch.get("padding_mask"),
            audio_present=batch.get("audio_present"),
            video_present=batch.get("video_present"),
            deterministic=not train,
            rngs=rngs,
            mutable=mutable,
        )
        new_stats = updates.get("batch_stats", batch_stats)
        loss, metrics = pretrain_loss(
            out,
            model.cfg,
            masked_weight=masked_weight,
            nomask_weight=nomask_weight,
            feature_pen=extracted_features_from(updates.get("intermediates", {})),
            feature_pen_weight=feature_pen_weight,
        )
        if moe_on:
            from avsl_tpu.models.moe import moe_aux_loss

            aux = moe_aux_loss(updates.get("intermediates", {}))
            if train:
                loss = loss + moe_aux_coef * aux
            metrics["moe_aux"] = aux
        return loss, (metrics, new_stats)

    return loss_fn
