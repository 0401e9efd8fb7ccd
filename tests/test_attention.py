"""Fused-attention semantics tests (CPU fallback path; the Pallas TPU
kernel itself is validated against the same reference on hardware)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avsl_tpu.kernels.attention import _reference_attention, fused_attention
from avsl_tpu.models.layers import dot_product_attention


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(0)
    b, t, h, d = 2, 24, 2, 16
    mk = lambda: jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)  # noqa: E731
    return mk(), mk(), mk()


def test_fused_matches_masked_einsum_with_lengths(qkv):
    q, k, v = qkv
    lengths = jnp.asarray([10, 24])
    out = fused_attention(q, k, v, lengths=lengths)
    k_ids = jnp.arange(k.shape[1])
    mask = (k_ids[None, :] < lengths[:, None])[:, None, None, :]
    want = dot_product_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def test_fused_causal_matches_masked_einsum(qkv):
    q, k, v = qkv
    t = q.shape[1]
    out = fused_attention(q, k, v, causal=True)
    tri = jnp.tril(jnp.ones((t, t), bool))[None, None]
    want = dot_product_attention(q, k, v, tri)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def test_gradients_flow(qkv):
    q, k, v = qkv

    def loss(q, k, v):
        return jnp.sum(fused_attention(q, k, v, causal=True) ** 2)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in (gq, gk, gv):
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("with_lengths", [False, True])
def test_pallas_kernels_interpret_mode(qkv, causal, with_lengths):
    """Run the actual Pallas fwd+bwd kernels in interpret mode on CPU and
    check both the output and all three gradients against the reference
    attention's autodiff, including q-block padding (T=24, block_q=16)."""
    from avsl_tpu.kernels import attention as A

    q, k, v = (x.transpose(0, 2, 1, 3) for x in qkv)  # [B,H,T,D]
    lengths = jnp.asarray([10, 24]) if with_lengths else None

    out = A._flash_fwd_pallas(q, k, v, lengths, causal=causal, block_q=16,
                              interpret=True)
    want, ref_vjp = jax.vjp(
        lambda q, k, v: A._reference_attention(q, k, v, lengths, causal), q, k, v
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)

    g = jnp.asarray(np.random.default_rng(7).normal(size=out.shape), jnp.float32)
    dq, dk, dv = A._flash_bwd_pallas(q, k, v, out, g, lengths, causal=causal,
                                     block_q=16, interpret=True)
    rq, rk, rv = ref_vjp(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=2e-4)


def test_length_zero_rows_are_safe():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(2, 8, 2, 16)), jnp.float32)
    out = fused_attention(q, q, q, lengths=jnp.asarray([0, 8]))
    # zero-length batch attends to nothing: softmax over all -inf gives
    # uniform weights in the reference; output must still be finite
    assert np.isfinite(np.asarray(out)).all()
