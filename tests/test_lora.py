"""LoRA fine-tuning regime (models/lora.py).

Beyond-parity addition: the reference's three freeze regimes
(avsl/whisper_flamingo_ft_ami.py:642-651) are all-or-nothing; LoRA
trains low-rank adapters with adapter-sized optimizer state and
checkpoints. Tests: paper init (merged == base at step 0), gradient
flow (B first, then A), merged-serving equality, and the finetune CLI
end-to-end with ``lora_rank`` set.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsl_tpu.models.lora import (
    DEFAULT_TARGETS,
    init_lora,
    iter_adapters,
    lora_loss_fn,
    lora_param_count,
    lora_summary,
    merge_lora,
)


@pytest.fixture(scope="module")
def tiny_model():
    """One shared build+init for the whole module (the init is the
    dominant cost at ~10 s on the 1-core CI host; LoRA never mutates
    the base params in place, so sharing is safe)."""
    from avsl_tpu.models.factory import build_whisper_flamingo

    model, cfg = build_whisper_flamingo("test", vocab_size=64, dtype="float32")
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.n_mels, 50))
    video = jax.random.normal(jax.random.PRNGKey(2), (1, 10, 88, 88, 1)) * 0.1
    toks = jnp.asarray([[1, 2, 3]])
    variables = model.init(jax.random.PRNGKey(0), mel, toks, video=video)

    def apply(params, *a, **kw):
        v = {"params": params}
        if "batch_stats" in variables:
            v["batch_stats"] = variables["batch_stats"]
        return model.apply(v, *a, **kw)

    return model, cfg, variables, (mel, toks, video), apply


def test_init_structure_and_identity_at_step0(tiny_model):
    model, cfg, variables, (mel, toks, video), apply = tiny_model
    params = variables["params"]
    lora = init_lora(jax.random.PRNGKey(0), params, rank=4)
    names = [p for p, _ in iter_adapters(lora)]
    assert names and all(p.endswith(("q_proj/kernel", "v_proj/kernel")) for p in names)
    s = lora_summary(params, lora)
    assert s["n_adapters"] == len(names)
    assert s["trainable_fraction"] < 0.2  # tiny model; large models ~0.1%

    # lora_b == 0 -> merged model IS the base model (paper init)
    merged = merge_lora(params, lora, alpha=16.0, rank=4)
    base_out = apply(params, mel, toks, video=video)
    merged_out = apply(merged, mel, toks, video=video)
    np.testing.assert_allclose(
        np.asarray(base_out), np.asarray(merged_out), atol=0
    )


def test_merge_rejects_orphan_adapters():
    params = {"dense": {"kernel": jnp.ones((8, 8))}}
    lora = {"wrong": {"kernel": {"lora_a": jnp.ones((8, 2)), "lora_b": jnp.zeros((2, 8))}}}
    with pytest.raises(ValueError):
        merge_lora(params, lora, alpha=8.0, rank=2)


def test_init_requires_a_match():
    with pytest.raises(ValueError):
        init_lora(jax.random.PRNGKey(0), {"x": jnp.ones((4, 4))}, rank=2)


def test_gradients_flow_b_then_a(tiny_model):
    """At init (B=0) dL/dA = G @ B^T = 0 while dL/dB != 0; once B moves,
    A's gradient turns on. This is the structural signature of correct
    autodiff through the in-jit merge."""
    model, cfg, variables, (mel, toks, video), apply = tiny_model
    params = variables["params"]
    lora = init_lora(jax.random.PRNGKey(0), params, rank=2)

    def base_loss(p, batch_stats, batch, rng):
        out = apply(p, batch["mel"], batch["toks"], video=batch["video"])
        return jnp.mean(out.astype(jnp.float32) ** 2), ({}, batch_stats)

    wrapped = lora_loss_fn(base_loss, params, alpha=16.0, rank=2)
    batch = {"mel": mel, "toks": toks, "video": video}
    grads = jax.grad(lambda l: wrapped(l, None, batch, jax.random.PRNGKey(0))[0])(lora)
    ga = [np.asarray(ab["lora_a"]) for _, ab in iter_adapters(grads)]
    gb = [np.asarray(ab["lora_b"]) for _, ab in iter_adapters(grads)]
    assert all(np.all(g == 0) for g in ga)
    assert any(np.any(g != 0) for g in gb)

    stepped = jax.tree_util.tree_map(lambda l, g: l - 1e-2 * g, lora, grads)
    grads2 = jax.grad(lambda l: wrapped(l, None, batch, jax.random.PRNGKey(0))[0])(stepped)
    ga2 = [np.asarray(ab["lora_a"]) for _, ab in iter_adapters(grads2)]
    assert any(np.any(g != 0) for g in ga2)


def test_merged_serving_equals_lora_forward(tiny_model):
    """Exporting a merged checkpoint serves EXACTLY what training saw:
    forward(merge(base, lora)) == the wrapped training-path forward."""
    model, cfg, variables, (mel, toks, video), apply = tiny_model
    params = variables["params"]
    lora = init_lora(jax.random.PRNGKey(0), params, rank=2)
    # make the adapters non-trivial
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.02 * jax.random.normal(jax.random.PRNGKey(3), x.shape), lora
    )
    merged = merge_lora(params, lora, alpha=16.0, rank=2)
    out_serving = apply(merged, mel, toks, video=video)

    def fwd_train_path(l):
        m = merge_lora(params, l, alpha=16.0, rank=2)
        return apply(m, mel, toks, video=video)

    out_train = jax.jit(fwd_train_path)(lora)
    np.testing.assert_allclose(
        np.asarray(out_serving), np.asarray(out_train), rtol=2e-5, atol=2e-5
    )
    # and the adapters moved the function (delta actually applied)
    base_out = apply(params, mel, toks, video=video)
    assert float(np.abs(np.asarray(out_serving) - np.asarray(base_out)).max()) > 0


@pytest.mark.slow
def test_finetune_cli_lora_smoke(tmp_path):
    """finetune --smoke with lora_rank: the full runner path (train steps,
    validation WER, checkpointing) on adapter-sized state."""
    import yaml

    from avsl_tpu.cli.finetune import main

    cfg_path = tmp_path / "lora.yaml"
    cfg_path.write_text(
        yaml.safe_dump(
            {
                "lora_rank": 4,
                "lora_alpha": 8.0,
                "log_output_dir": str(tmp_path / "logs"),
                "check_output_dir": str(tmp_path / "ckpt"),
                "train_id": "lora_smoke",
            }
        )
    )
    result = main([str(cfg_path), "--smoke"])
    assert result["final_step"] >= 6
    assert np.isfinite(result["best_wer"])


@pytest.mark.slow
def test_export_lora_cli_merges_exactly(tmp_path):
    """export_lora: saved adapters + saved base -> merged checkpoint
    that equals merge_lora computed directly."""
    import optax

    from avsl_tpu.cli.avg_ckpt import build_state
    from avsl_tpu.cli.export_lora import main
    from avsl_tpu.core.config import FlamingoTrainConfig
    from avsl_tpu.train.checkpoints import restore_checkpoint, save_checkpoint
    from avsl_tpu.train.loop import TrainState
    from avsl_tpu.train.optim import lora_optimizer

    cfg = FlamingoTrainConfig()
    cfg.model_name = "test"
    cfg.audio_max_length = 16000
    cfg.lora_rank = 4
    cfg.lora_alpha = 8.0

    base = build_state(cfg, smoke=True)
    base_dir = str(tmp_path / "base")
    save_checkpoint(base_dir, base, step=0)

    adapters = init_lora(jax.random.PRNGKey(1), base.params, 4)
    adapters = jax.tree_util.tree_map(
        lambda x: x + 0.03 * jax.random.normal(jax.random.PRNGKey(5), x.shape),
        adapters,
    )
    tx, _ = lora_optimizer(adapters, cfg, 1)
    a_dir = str(tmp_path / "adapters")
    save_checkpoint(a_dir, TrainState.create(adapters, tx), step=7)

    import yaml

    cfg_path = str(tmp_path / "lora.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"lora_rank": 4, "lora_alpha": 8.0}, f)
    out_dir = str(tmp_path / "merged")
    main(["--config", cfg_path, "--adapter_ckpt", a_dir,
          "--base_ckpt", base_dir, "--output", out_dir, "--smoke"])
    # reload the export and compare against the in-memory merge; use an
    # sgd-state template only for params (opt structure doesn't matter
    # for serving loads which take params/batch_stats only)
    restored = restore_checkpoint(out_dir, base, step=7)
    expect = merge_lora(base.params, adapters, 8.0, 4)
    for r, e in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(expect)):
        np.testing.assert_allclose(
            np.asarray(r, np.float32), np.asarray(e, np.float32),
            rtol=1e-5, atol=1e-6,
        )
    assert int(restored.step) == 7
