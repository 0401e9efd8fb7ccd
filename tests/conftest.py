"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes (any jax import triggers backend
selection), hence the env mutation at module import time.
"""

import os

# The ambient env pins JAX_PLATFORMS=axon (one real TPU chip); tests run on a
# virtual 8-device CPU mesh instead.
os.environ.pop("JAX_PLATFORMS", None)
# must precede jaxlib logging init to silence XLA AOT cache-load notes
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_threefry_partitionable", True)

# Persistent XLA compile cache: the suite's cost on a 1-core host is
# dominated by first-time compiles of model programs; caching them makes
# per-commit re-runs much cheaper (measured: test_lora.py 134 s cold ->
# 73 s warm). Safe across commits - the cache key is the full HLO, so any
# model change recompiles. Override location with JAX_COMPILATION_CACHE_DIR.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/avsl_tpu_test_xla")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

# Param-init PRNG: threefry programs are the single largest compile cost
# in the suite on a 1-core host (measured 2026-08-20: jax.random.normal
# compiles 0.4-4.8 s PER SHAPE; ~106 eager compiles inside one tiny-model
# init -> 16 s). 'rbg' lowers to XLA's RngBitGenerator op (~0.2 s compile)
# and halves model-init time. Tests assert self-consistent numerics, not
# specific threefry draws, so the impl swap is behavior-safe; production
# code paths never read jax_default_prng_impl.
jax.config.update("jax_default_prng_impl", "rbg")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs


# Fast-gate curation: tests measured >= ~25 s on the 1-core CI host
# (full -m "not slow" run, --durations; see docs/ENGINEERING_NOTES.md)
# are auto-marked slow here so the fast gate `pytest -m "not slow"`
# stays within its wall-clock budget. These are all e2e CLI smokes,
# grad-exactness cross-checks, and property fuzzers — each has a faster
# sibling still in the gate. Central list (rather than scattered
# decorators) so re-curation after a durations run is one edit.
_SLOW_BY_MEASUREMENT = {
    "test_cli_distill_to_transcribe_roundtrip",
    "test_avhubert_ft_cli_moe_ep",
    "test_spec_property_fuzz_vs_greedy",
    "test_avhubert_ft_cli_ctc_moe_tp",
    "test_full_pipeline",
    "test_finetune_smoke",
    "test_pretrain_smoke",
    "test_mode_mixing_stable_with_bn_trunk",
    "test_transcriber_draft_under_tp_mesh_matches_single_device",
    "test_flamingo_loss_collects_moe_aux_from_video_trunk",
    "test_pipeline_grads_match_sequential",
    "test_remat_is_numerically_identical",
    "test_distill_raises_acceptance_tokens_stay_greedy",
    "test_finetune_bucketed_multisteps",
    "test_transcribe_cli_smoke_with_draft",
    "test_evaluate_smoke",
    "test_transcribe_cli_detect_language",
    "test_transcribe_smoke",
    "test_spec_exact_on_avhubert_seq2seq",
    "test_exact_vs_greedy_independent_draft",
    "test_train_step_on_mesh_updates_only_trainable",
    "test_structural_freeze_matches_masked_step",
    "test_temperature_fallback_retries_low_confidence",
    "test_whisper_word_timestamps_end_to_end",
    # third tier (>= ~10 s measured 2026-08-20 post-rbg; each has a
    # cheaper sibling that keeps its subsystem in the fast gate —
    # noted inline)
    "test_vector_cache_index_matches_scalar",  # spec: cache_too_small, stats tests
    "test_transcriber_kv_int8_end_to_end",  # kv_int8: greedy_matches_bf16_cache
    "test_transcriber_mixes_lip_raw_and_audio_only",  # infer: raw_video_affects_output
    "test_ep_matches_replicated",  # moe: brute_force_topk, partitioning_rules
    "test_transformer_block_moe_padding_via_kv_lengths",  # moe: padding_mask_invariance
    "test_export_cross_platform_tpu_serializes",  # export: rejects_mesh_transcriber
    "test_batched_downsample_scales_back",  # detector: track_refine_parallel_stage
    "test_factory_model_builds_twice",  # factory: every model test builds one
    "test_flamingo_loss_provides_modality_rng",  # train: prob_av_mode_mixing
    "test_eval_step_carries_sp",  # sp: dryrun_multichip + train-step sibling
    # second tier (>= ~15 s measured 2026-08-19, same host)
    "test_exact_and_full_accept_with_self_draft",
    "test_sp_on_off_losses_match",
    "test_pretrain_iteration2",
    "test_transcriber_with_draft_end_to_end",
    "test_cli_serve_smoke",
    "test_train_step_carries_sp_without_caller_scope",
    "test_pretrain_learnability_audio_only",
    "test_export_cli_smoke",
    "test_serving_options_compose_on_a_mesh",
    "test_staged_frontend_matches_fused",
    "test_whisper_ft_smoke",
    "test_tp_matches_dp_loss",
    "test_remat_reduces_saved_residual_bytes",
    "test_export_roundtrip_matches_live_program",
    "test_gradients_flow_b_then_a",
    "test_pp_train_step_matches_unpipelined",
    "test_host_cropper_matches_device_staged_frontend",
    "test_structural_freeze_trains_trainable",
    "test_sequence_parallel_encoder_matches_replicated",
    "test_model_logit_fidelity",
    "test_transcriber_int8_end_to_end",
    "test_align_cli_smoke_and_csv",
    "test_avg_logprob_matches_greedy_scored",
    "test_word_timestamps_through_transcriber_and_longform",
    "test_exact_under_jit_and_kv_int8",
    "test_grad_accum_matches_big_batch",
    "test_spec_stats_telemetry",
    "test_transcriber_tp_mesh_matches_single_device",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.originalname in _SLOW_BY_MEASUREMENT:
            item.add_marker(pytest.mark.slow)
