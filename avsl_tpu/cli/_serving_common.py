"""Shared Whisper-Flamingo transcriber construction for the serving CLIs
(cli.serve, cli.transcribe): tokenizer + model build, probe init,
checkpoint restore (refusing to serve random weights on an empty
--ckpt_dir), optional tp/dp mesh, and the StreamingTranscriber with all
serving options plumbed. One implementation so the two CLIs cannot
drift."""

from __future__ import annotations

from typing import Optional


def tree_shapes_match(a, b) -> bool:
    """Same pytree structure + leaf shapes (dtype-agnostic: checkpoints
    may round-trip through different precisions)."""
    import jax
    import numpy as np

    try:
        return bool(
            jax.tree_util.tree_all(
                jax.tree_util.tree_map(
                    lambda x, y: np.shape(x) == np.shape(y), a, b
                )
            )
        )
    except ValueError:
        return False


def build_target_model(cfg, tokenizer, batch_size: int, smoke: bool,
                       ckpt_dir: Optional[str]):
    """Build the config's Whisper[+Flamingo] model exactly as trained
    (add_gated_x_attn / use_av_hubert_encoder from cfg), probe-init it,
    and restore ``ckpt_dir`` through the cfg-matched optimizer probe.
    Shared by the serving CLIs and cli.distill so the restore template
    cannot drift from what the checkpoint actually contains. Returns
    ``(model, w_cfg, variables, video_frames)``."""
    import jax
    import numpy as np

    from avsl_tpu.models.factory import build_whisper_flamingo
    from avsl_tpu.train.checkpoints import latest_step, restore_checkpoint
    from avsl_tpu.train.loop import TrainState
    from avsl_tpu.train.optim import select_optimizer

    vocab = tokenizer.add_tokens(["<laugh>"])
    model, w_cfg = build_whisper_flamingo(
        cfg.model_name, vocab_size=vocab,
        add_gated_x_attn=cfg.add_gated_x_attn,
        use_av_hubert_encoder=cfg.use_av_hubert_encoder,
        dtype="float32" if smoke else "bfloat16",
    )
    b = batch_size
    video_frames = min(int(round(cfg.audio_max_length / 16000 * 25)), 250)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        np.zeros((b, w_cfg.n_mels, cfg.audio_max_length // 160), np.float32),
        np.zeros((b, 4), np.int32),
        **(dict(video=np.zeros((b, video_frames, 88, 88, 1), np.float32))
           if cfg.add_gated_x_attn else {}),
    )
    if ckpt_dir:
        if latest_step(ckpt_dir) is None:
            # never serve randomly initialized weights on a typo'd or
            # empty checkpoint directory — garbage transcripts with a
            # healthy-looking daemon is the worst failure mode
            raise SystemExit(f"no checkpoint under {ckpt_dir!r}")
        tx, _ = select_optimizer(variables["params"], cfg, 1)
        state = TrainState.create(
            variables["params"], tx, batch_stats=variables.get("batch_stats")
        )
        state = restore_checkpoint(ckpt_dir, state)
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
    return model, w_cfg, variables, video_frames


def build_transcriber(args, cfg):
    import jax
    import numpy as np

    from avsl_tpu.data.tokenizer import get_tokenizer
    from avsl_tpu.infer import StreamingTranscriber
    from avsl_tpu.models.factory import build_whisper_flamingo

    smoke = bool(getattr(args, "smoke", False))
    tokenizer = get_tokenizer(getattr(cfg, "download_root", None), cfg.lang)
    b = args.batch_size
    model, w_cfg, variables, video_frames = build_target_model(
        cfg, tokenizer, b, smoke, args.ckpt_dir
    )
    vocab = w_cfg.n_vocab
    mesh = None
    mp = int(getattr(args, "model_parallel", 1) or 1)
    dp = int(getattr(args, "data_parallel", 1) or 1)
    if mp > 1 or dp > 1:
        from avsl_tpu.core.mesh import make_mesh

        mesh = make_mesh(dp * mp, model_parallel=mp)
    # speculative decoding: a small audio-only draft Whisper proposes
    # spec_k tokens per target verify pass (decode/speculative.py;
    # token-exact vs greedy, so serving quality is unchanged)
    draft_model = draft_variables = None
    draft_name = getattr(args, "draft_model", None)
    if draft_name:
        if args.beam > 1:
            raise SystemExit("--draft_model composes with greedy only (--beam 1)")
        spec_k = int(getattr(args, "spec_k", 4))
        if spec_k < 1:
            raise SystemExit(f"--spec_k must be >= 1, got {spec_k}")
        draft_model, d_cfg = build_whisper_flamingo(
            draft_name, vocab_size=vocab, add_gated_x_attn=False,
            dtype="float32" if smoke else "bfloat16",
        )
        draft_variables = jax.jit(draft_model.init)(
            jax.random.PRNGKey(0),
            np.zeros((b, d_cfg.n_mels, cfg.audio_max_length // 160), np.float32),
            np.zeros((b, 4), np.int32),
        )
        draft_ckpt = getattr(args, "draft_ckpt", None)
        if draft_ckpt:
            # optimizer-agnostic restore: draft checkpoints come from
            # cli.distill (plain adamw TrainState), whose opt_state this
            # CLI cannot (and need not) reconstruct
            from avsl_tpu.train.checkpoints import restore_params_only

            restored = restore_params_only(draft_ckpt)
            if restored is None:
                raise SystemExit(f"no checkpoint under {draft_ckpt!r}")
            # structure check against the probe init BEFORE the expensive
            # jit compile — an argument-free restore would otherwise feed
            # a mismatched tree into the program and fail minutes later
            # with a cryptic flax error
            if not tree_shapes_match(
                restored["params"], draft_variables["params"]
            ):
                raise SystemExit(
                    f"--draft_ckpt {draft_ckpt!r} does not match "
                    f"--draft_model {draft_name!r} (param tree/shape "
                    "mismatch — was it distilled with a different "
                    "--draft_model?)"
                )
            draft_variables = restored
        elif not smoke:
            # a random draft still decodes exactly (verification rejects
            # everything) but wastes the draft forwards — refuse outside
            # --smoke so misconfigured serving fails loudly
            raise SystemExit("--draft_model needs --draft_ckpt (or --smoke)")

    return StreamingTranscriber(
        model, variables, tokenizer,
        audio_max_length=int(cfg.audio_max_length),
        video_frames=video_frames,
        batch_size=b,
        max_new_tokens=args.max_new_tokens,
        beam_size=args.beam,
        lang=cfg.lang,
        quantize=args.quantize,
        kv_int8=bool(getattr(args, "kv_int8", False)),
        temperature_fallback=tuple(
            float(t) for t in getattr(args, "temperature_fallback", "").split(",")
            if t
        ),
        logprob_threshold=getattr(args, "logprob_threshold", -1.0),
        word_timestamps=bool(getattr(args, "word_timestamps", False)),
        mesh=mesh,
        draft_model=draft_model,
        draft_variables=draft_variables,
        spec_k=int(getattr(args, "spec_k", 4)),
    )


def csv_cell(row: dict, *keys) -> Optional[str]:
    """First non-empty string cell among ``keys``. pandas represents
    missing cells as float NaN, so a plain ``row.get(k, fallback)`` never
    falls through — this treats NaN/empty as absent."""
    for k in keys:
        v = row.get(k)
        if v is None or (isinstance(v, float) and v != v):
            continue
        v = str(v).strip()
        if v and v.lower() != "nan":
            return v
    return None
