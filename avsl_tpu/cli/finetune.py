"""Whisper-Flamingo fine-tuning entry point.

Usage: ``python -m avsl_tpu.cli.finetune <config.yaml> [--smoke]``

YAML keys match the reference's canonical training config
(config/ami_whisper_flamingo_large.yaml; entry point
avsl/whisper_flamingo_ft_ami.py:705-1034 in /root/reference): dataset
paths, model_name, freeze regime flags (add_gated_x_attn,
freeze_video_model, video_projection_train_only), step budget, grad
accumulation, validate_every_n_batches, monitor val/wer_av, resume.

``--smoke`` runs the whole pipeline on a synthetic miniature dataset and
the "test" model preset — the end-to-end health check used by CI and by
humans to validate an environment without AMI data.
"""

from __future__ import annotations

import os
import sys
from typing import Any, Dict, Iterator, List, Optional

import numpy as np


def load_datasets(cfg):
    """load_from_disk with the reference's fallback chain
    (whisper_flamingo_ft_ami.py:840-918): explicit split paths, else a
    root with train/val/test subdirs; duration filter applied."""
    import datasets

    def load_one(path):
        if path and os.path.isdir(path):
            return datasets.load_from_disk(path)
        return None

    train = load_one(cfg.train_data_path)
    val = load_one(cfg.val_data_path)
    test = load_one(cfg.test_data_path)
    if train is None and cfg.train_data_path:
        root = os.path.dirname(cfg.train_data_path.rstrip("/"))
        for name, cur in (("train", train), ("val", val), ("test", test)):
            if cur is None:
                cand = load_one(os.path.join(root, name))
                if name == "train":
                    train = cand
                elif name == "val":
                    val = cand
                else:
                    test = cand
    frac = float(getattr(cfg, "dataset_fraction", 0) or 0)
    if 0 < frac < 1:
        # the reference trains on a slice of the corpus
        # (whisper_flamingo_ft_ami.py:908-918 takes 20%)
        def take(ds):
            return ds.select(range(int(len(ds) * frac))) if ds is not None else ds

        train, val, test = take(train), take(val), take(test)

    max_dur = float(getattr(cfg, "max_duration_filter_seconds", 0) or 0)
    if max_dur > 0:
        def filt(ds):
            if ds is None or "duration" not in ds.column_names:
                return ds
            return ds.filter(lambda d: float(d) <= max_dur, input_columns="duration")

        train, val, test = filt(train), filt(val), filt(test)
    return train, val, test


def make_synthetic_dataset(n: int = 8, seconds: float = 1.0):
    """Miniature in-memory dataset for --smoke (no AMI data needed)."""
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        sr = 16000
        audio = (0.1 * rng.standard_normal(int(seconds * sr))).astype(np.float32)
        rows.append(
            {
                "audio": {"array": audio, "sampling_rate": sr},
                "transcript": f"synthetic utterance number {i}",
                "duration": seconds,
                "lip_video": None,
            }
        )
    return rows


def main(argv: Optional[List[str]] = None) -> Dict[str, Any]:
    import jax

    from avsl_tpu.core.config import FlamingoTrainConfig
    from avsl_tpu.core.mesh import make_mesh
    from avsl_tpu.data.runtime import AmiVideoDataset, WhisperVideoCollator
    from avsl_tpu.data.tokenizer import get_tokenizer
    from avsl_tpu.models.factory import build_whisper_flamingo
    from avsl_tpu.train.loop import TrainState
    from avsl_tpu.train.objectives import flamingo_loss_fn
    from avsl_tpu.train.optim import select_optimizer
    from avsl_tpu.train.runner import TrainerRunner

    argv = list(sys.argv[1:] if argv is None else argv)
    smoke = "--smoke" in argv
    if smoke:
        argv.remove("--smoke")
    cfg = (
        FlamingoTrainConfig.from_yaml(argv[0])
        if argv
        else FlamingoTrainConfig()
    )
    if smoke:
        cfg.model_name = "test"
        cfg.num_train_steps = 6
        cfg.validate_every_n_batches = 3
        # keep smoke fast, but let an explicit YAML accum (capped at 2)
        # through so the accumulation + frozen-tower-hoist path is
        # exercisable end-to-end under --smoke
        cfg.gradient_accumulation_steps = min(
            int(getattr(cfg, "gradient_accumulation_steps", 1) or 1), 2
        )
        cfg.batch_size = 4
        cfg.audio_max_length = 16000
        cfg.warmup_steps = 1

    tokenizer = get_tokenizer(getattr(cfg, "download_root", None), cfg.lang)
    vocab = tokenizer.add_tokens(["<laugh>"])  # reference :462-467

    model, w_cfg = build_whisper_flamingo(
        cfg.model_name,
        vocab_size=vocab,
        add_gated_x_attn=cfg.add_gated_x_attn,
        use_av_hubert_encoder=cfg.use_av_hubert_encoder,
        dropout_rate=cfg.dropout_rate,
        dtype="float32" if smoke else ("bfloat16" if cfg.precision in (16, "16", "bf16") else "float32"),
        remat=bool(getattr(cfg, "enable_gradient_checkpointing", False)),
    )

    # datasets
    if smoke:
        train_rows = make_synthetic_dataset(8)
        val_rows = make_synthetic_dataset(4)
        test_rows = None
    else:
        train_rows, val_rows, test_rows = load_datasets(cfg)
        if train_rows is None:
            raise FileNotFoundError(
                f"train dataset not found at {cfg.train_data_path!r}"
            )
    has_video = bool(cfg.add_gated_x_attn)
    mk_ds = lambda rows, train: AmiVideoDataset(  # noqa: E731
        rows, tokenizer,
        audio_max_length=int(cfg.audio_max_length),
        n_mels=w_cfg.n_mels, lang=cfg.lang, load_video=has_video, train=train,
    )
    train_ds, val_ds = mk_ds(train_rows, True), mk_ds(val_rows, False)
    # label_pad_len PINS the label length: without it every distinct
    # batch-max label length is a fresh XLA compile of the train step
    label_len = min(int(getattr(cfg, "text_max_length", 350)), w_cfg.n_text_ctx)
    collator = WhisperVideoCollator(
        eot_id=tokenizer.eot,
        label_pad_len=label_len,
        max_label_len=label_len,
    )

    use_bucketing = not smoke

    def batches(ds, batch_size, shuffle, epoch=0) -> Iterator[Dict[str, np.ndarray]]:
        if use_bucketing:
            # token-budget length bucketing (LengthBatchSampler semantics:
            # budget = audio_max_length x batch_size, expressed in 100 Hz
            # frames) snapped to a static shape set
            from avsl_tpu.data.runtime import make_bucketed_loader

            batch_bins = (int(cfg.audio_max_length) // 160) * max(batch_size, 1)
            yield from make_bucketed_loader(
                ds, collator, batch_bins=batch_bins, shuffle=shuffle, epoch=epoch
            )
            return
        order = np.arange(len(ds))
        if shuffle:
            order = np.random.default_rng(epoch).permutation(order)
        for i in range(0, len(order) - batch_size + 1, batch_size):
            items = [ds[int(j)] for j in order[i : i + batch_size]]
            yield collator(items)

    # init params
    probe = collator([train_ds[0]])
    init_kwargs = dict(video=probe.get("video")) if has_video else {}
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        probe["input_ids"],
        probe["dec_input_ids"],
        **init_kwargs,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats")

    if getattr(cfg, "pt_ckpt", "") and os.path.exists(cfg.pt_ckpt):
        from avsl_tpu.models.convert import load_torch_checkpoint_into

        params, report = load_torch_checkpoint_into(params, cfg.pt_ckpt)
        print(f"pt_ckpt: loaded {len(report['loaded'])} tensors, "
              f"missing {len(report['missing'])}, unexpected {len(report['unexpected'])}")

    # LoRA regime (models/lora.py): train ONLY low-rank adapters on the
    # targeted kernels; the base tree is a frozen closure constant of the
    # loss. TrainState.params/opt-state/checkpoints are adapter-sized
    # (~0.1-1% of the model). Composes with DP; under model_parallel>1
    # the base rides as a replicated constant (adapters are too small to
    # shard), so prefer lora_rank=0 for tensor-parallel runs.
    lora_rank = int(getattr(cfg, "lora_rank", 0) or 0)
    if lora_rank > 0:
        from avsl_tpu.models import lora as lora_mod
        from avsl_tpu.train.optim import lora_optimizer

        lora_alpha = float(getattr(cfg, "lora_alpha", 16.0) or 16.0)
        targets = (
            tuple(cfg.lora_targets)
            if getattr(cfg, "lora_targets", None)
            else lora_mod.DEFAULT_TARGETS
        )
        base_params = params
        adapters = lora_mod.init_lora(
            jax.random.PRNGKey(1), params, lora_rank, targets
        )
        summary = lora_mod.lora_summary(params, adapters)
        print(
            f"lora: rank={lora_rank} alpha={lora_alpha} "
            f"adapters={summary['n_adapters']} trainable="
            f"{summary['lora_params']:,} "
            f"({100 * summary['trainable_fraction']:.3f}% of base)"
        )
        tx, _labels = lora_optimizer(adapters, cfg, int(cfg.num_train_steps))
        trainable = adapters
        to_model_params = lambda p: lora_mod.merge_lora(  # noqa: E731
            base_params, p, lora_alpha, lora_rank
        )
    else:
        tx, _labels = select_optimizer(params, cfg, int(cfg.num_train_steps))
        trainable = params
        to_model_params = lambda p: p  # noqa: E731
    accum = max(int(cfg.gradient_accumulation_steps), 1)
    runner_accum = accum
    if use_bucketing and accum > 1:
        # bucketed batches vary in size: accumulate across successive
        # batches via optax.MultiSteps instead of an in-batch scan
        import optax

        tx = optax.MultiSteps(tx, every_k_schedule=accum)
        runner_accum = 1
    state = TrainState.create(trainable, tx, batch_stats=batch_stats)

    mesh = None
    model_parallel = int(getattr(cfg, "model_parallel", 1) or 1)
    if len(jax.devices()) > 1:
        n = int(getattr(cfg, "num_devices", 0)) or len(jax.devices())
        mesh = make_mesh(min(n, len(jax.devices())), model_parallel=model_parallel)

    loss_fn = flamingo_loss_fn(
        model, train=True,
        freeze_video_bn_stats=bool(getattr(cfg, "freeze_video_batch_norm_stats", False)),
        spec_augment=getattr(cfg, "spec_augment", None),
        # YAML keys prob_use_av / prob_use_a (reference contract
        # whisper_flamingo_ft_ami.py:344-345; canonical config trains
        # always-AV with prob_use_av=1.0)
        prob_av=float(cfg.prob_use_av),
        prob_a=float(cfg.prob_use_a),
    )
    eval_loss = flamingo_loss_fn(model, train=False)

    # Hoist the frozen tower forwards out of the grad-accumulation scan
    # (objectives.flamingo_tower_precompute): valid only when EVERY param
    # the towers read is frozen — decided from the optimizer's own
    # TRAIN/FROZEN label tree, so the gate can never disagree with what
    # actually gets gradients. LoRA is excluded (adapters may graft onto
    # tower matmuls), as is bucketed cross-batch accumulation, and video
    # BN must use running stats (the batched forward must not see
    # micro-step-ordered stats updates).
    precompute = None
    if lora_rank == 0 and runner_accum > 1:
        import flax.traverse_util as _tu

        flat_labels = _tu.flatten_dict(_labels) if isinstance(_labels, dict) else {}
        tower_labels = [
            v for k, v in flat_labels.items()
            if k and k[0] in ("encoder", "video_model")
        ]
        towers_frozen = bool(tower_labels) and all(
            v != "train" for v in tower_labels
        )
        bn_frozen = bool(getattr(cfg, "freeze_video_batch_norm_stats", False))
        if towers_frozen and bn_frozen and bool(
            getattr(cfg, "hoist_frozen_towers", True)
        ):
            from avsl_tpu.train.objectives import flamingo_tower_precompute

            precompute = flamingo_tower_precompute(
                model, train=True, freeze_video_bn_stats=True,
                spec_augment=getattr(cfg, "spec_augment", None),
                prob_av=float(cfg.prob_use_av),
                prob_a=float(cfg.prob_use_a),
            )

    if lora_rank > 0:
        loss_fn = lora_mod.lora_loss_fn(loss_fn, base_params, lora_alpha, lora_rank)
        eval_loss = lora_mod.lora_loss_fn(eval_loss, base_params, lora_alpha, lora_rank)

    @jax.jit
    def eval_logits(state: TrainState, batch):
        variables = {"params": to_model_params(state.params)}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        return model.apply(
            variables,
            batch["input_ids"],
            batch["dec_input_ids"],
            video=batch.get("video"),
            deterministic=True,
        )

    runner = TrainerRunner(
        loss_fn, eval_logits, tx, state, tokenizer, cfg, mesh=mesh,
        log_dir=os.path.join(cfg.log_output_dir, cfg.train_id),
        ckpt_dir=os.path.join(cfg.check_output_dir, cfg.train_id),
        grad_accum_steps=runner_accum,
        # model_parallel > 1 shards params/opt-state per the Megatron rule
        # table and resumes via restore_sharded (elastic topology);
        # zero1 additionally splits the fp32 Adam mirrors over the data
        # axis (ZeRO stage 1, core/partitioning.state_shardings)
        partitioned_state=model_parallel > 1,
        zero1=bool(getattr(cfg, "zero1", False)),
        # fsdp shards params AND mirrors over data (ZeRO-3); subsumes zero1
        fsdp=bool(getattr(cfg, "fsdp", False)),
        # structural freeze: only the trainable subtree is differentiated
        # (no backward through the frozen AV-HuBERT trunk / whisper body)
        param_labels=_labels,
        precompute_fn=precompute,
    )
    train_bs = int(cfg.batch_size) * (runner_accum if runner_accum > 1 else 1)
    # prefetch_batches > 0 uploads the next batch while the step runs
    # (double buffering; data/prefetch.py). Default off: beneficial on
    # directly-attached TPUs, harmful on tunneled dev backends where
    # dispatch/transfer overlap collapses the link.
    n_prefetch = int(getattr(cfg, "prefetch_batches", 0) or 0)

    def train_batches(epoch):
        it = batches(train_ds, train_bs, True, epoch)
        if n_prefetch > 0:
            from avsl_tpu.data.prefetch import prefetch_to_device

            return prefetch_to_device(it, size=n_prefetch, mesh=mesh)
        return it

    result = runner.fit(
        train_batches=train_batches,
        val_batches=lambda: batches(val_ds, int(cfg.eval_batch_size), False),
        # num_train_steps counts optimizer steps; under MultiSteps each
        # optimizer step consumes `accum` micro-batches
        num_steps=int(cfg.num_train_steps) * (accum if runner_accum == 1 and accum > 1 else 1),
        validate_every=int(cfg.validate_every_n_batches),
        sanity_val_steps=int(getattr(cfg, "num_sanity_val_steps", 0)),
    )
    print(f"done: step={result['final_step']} best_wer={result['best_wer']:.4f} "
          f"(step {result['best_step']})")
    if test_rows is not None:
        # best-checkpoint test flow (reference trainer.test on best ckpt,
        # whisper_flamingo_ft_ami.py:1027-1034)
        test_ds = mk_ds(test_rows, False)
        tm = runner.test_best(
            lambda: batches(test_ds, int(cfg.eval_batch_size), False)
        )
        print(f"test (best ckpt step {result['best_step']}): "
              f"wer={tm.get('test/wer_av'):.4f} cer={tm.get('test/cer_av'):.4f}")
        result["test"] = tm
    return result


if __name__ == "__main__":
    main()
