"""Pipeline parallelism (core/pipeline.py): GPipe schedule correctness.

The reference scales with DDP only (SURVEY.md §2.8); pp is a TPU-native
addition, so there is no reference behavior to match — correctness is
defined as exact equivalence (forward AND backward) with the sequential
layer loop the pipeline replaces, on a real multi-device (virtual CPU)
mesh with the layers genuinely sharded over the stage axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsl_tpu.core.pipeline import (
    make_pp_mesh,
    pipeline_apply,
    stack_block_params,
    unstack_block_params,
)
from avsl_tpu.models.layers import TransformerBlock

L, D, H, FF, T = 4, 16, 2, 32, 6


def _block():
    return TransformerBlock(
        d_model=D, n_heads=H, d_ff=FF, dtype=jnp.float32, param_dtype=jnp.float32
    )


def _stacked_params(key):
    """Init L blocks under one parent module (names block_0..block_{L-1})."""
    import flax.linen as nn

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(L):
                x, _ = TransformerBlock(
                    d_model=D, n_heads=H, d_ff=FF,
                    dtype=jnp.float32, param_dtype=jnp.float32,
                    name=f"block_{i}",
                )(x)
            return x

    model = Stack()
    x = jnp.zeros((2, T, D), jnp.float32)
    params = model.init(key, x)["params"]
    return model, params


def _sequential(model, params, x):
    return model.apply({"params": params}, x)


def _block_fn(lp, h, extras):
    mask = None if extras is None else extras.get("mask")
    out, _ = _block().apply({"params": lp}, h, None, None, mask)
    return out


@pytest.mark.parametrize("stages,micro", [(2, 2), (4, 4), (2, 4)])
def test_pipeline_forward_matches_sequential(eight_devices, stages, micro):
    model, params = _stacked_params(jax.random.PRNGKey(0))
    stacked, rest = stack_block_params(params, L)
    assert rest == {}
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, T, D)), jnp.float32)

    mesh = make_pp_mesh(stages, stages=stages, devices=eight_devices)
    got = pipeline_apply(
        _block_fn, stacked, x, mesh=mesh, n_microbatches=micro
    )
    want = _sequential(model, params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_pipeline_grads_match_sequential(eight_devices):
    model, params = _stacked_params(jax.random.PRNGKey(1))
    stacked, _ = stack_block_params(params, L)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, T, D)), jnp.float32)
    mesh = make_pp_mesh(2, stages=2, devices=eight_devices)

    def loss_pp(sp, x):
        out = pipeline_apply(_block_fn, sp, x, mesh=mesh, n_microbatches=2)
        return jnp.mean(out**2)

    def loss_seq(p, x):
        return jnp.mean(_sequential(model, p, x) ** 2)

    g_pp = jax.grad(loss_pp)(stacked, x)
    g_seq_tree = jax.grad(loss_seq)(params, x)
    g_seq, _ = stack_block_params(g_seq_tree, L)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        g_pp,
        g_seq,
    )
    # grad w.r.t. the input flows through the ppermute transposes too
    gx_pp = jax.grad(loss_pp, argnums=1)(stacked, x)
    gx_seq = jax.grad(loss_seq, argnums=1)(params, x)
    np.testing.assert_allclose(np.asarray(gx_pp), np.asarray(gx_seq), rtol=1e-4, atol=1e-6)


def test_pipeline_composes_with_data_parallel(eight_devices):
    """dp=2 x pp=4: batch shards over data while layers shard over stage."""
    model, params = _stacked_params(jax.random.PRNGKey(2))
    stacked, _ = stack_block_params(params, L)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(8, T, D)), jnp.float32)
    mesh = make_pp_mesh(8, stages=4, devices=eight_devices)
    assert mesh.shape == {"data": 2, "stage": 4}

    got = jax.jit(
        lambda sp, xx: pipeline_apply(_block_fn, sp, xx, mesh=mesh, n_microbatches=2)
    )(stacked, x)
    want = _sequential(model, params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_pipeline_extras_ride_with_microbatches(eight_devices):
    """Per-example attention masks travel through the stages with their
    microbatch: masking out the tail tokens of half the batch must match
    the sequential masked run (and differ from the unmasked one)."""
    model, params = _stacked_params(jax.random.PRNGKey(3))
    stacked, _ = stack_block_params(params, L)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, T, D)), jnp.float32)
    mask = np.ones((4, 1, T, T), bool)
    mask[2:, :, :, T // 2:] = False  # examples 2,3 attend to first half only
    mask = jnp.asarray(mask)
    mesh = make_pp_mesh(2, stages=2, devices=eight_devices)

    got = pipeline_apply(
        _block_fn, stacked, x, mesh=mesh, n_microbatches=2, extras={"mask": mask}
    )

    def seq_masked(p, x, mask):
        h = x
        per_layer = [p[f"block_{i}"] for i in range(L)]
        for lp in per_layer:
            h = _block_fn(lp, h, {"mask": mask})
        return h

    want = seq_masked(params, x, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
    unmasked = _sequential(model, params, x)
    assert not np.allclose(np.asarray(got), np.asarray(unmasked), atol=1e-3)


def test_stack_unstack_roundtrip():
    _, params = _stacked_params(jax.random.PRNGKey(4))
    stacked, rest = stack_block_params(params, L)
    back = unstack_block_params(stacked, L)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params,
        back,
    )
    assert rest == {}


def test_pipeline_rejects_bad_shapes(eight_devices):
    _, params = _stacked_params(jax.random.PRNGKey(5))
    stacked, _ = stack_block_params(params, L)
    x = jnp.zeros((4, T, D), jnp.float32)
    mesh3 = make_pp_mesh(3, stages=3, devices=eight_devices)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(_block_fn, stacked, x, mesh=mesh3, n_microbatches=2)
    mesh2 = make_pp_mesh(2, stages=2, devices=eight_devices)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(_block_fn, stacked, x, mesh=mesh2, n_microbatches=3)
