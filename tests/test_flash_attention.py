"""Pallas flash attention vs XLA SDPA (interpret mode on CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_distill_tpu.ops.attention import sdpa_xla
from speech_distill_tpu.ops.flash_attention import flash_attention


def _causal_bias(B, T):
    q = jnp.arange(T)[:, None]
    k = jnp.arange(T)[None, :]
    return jnp.where(jnp.broadcast_to(k <= q, (B, 1, T, T)), 0.0,
                     -jnp.inf).astype(jnp.float32)


def _mk(B=2, T=128, H=4, KV=2, Dh=32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, T, H, Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, KV, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, KV, Dh)), jnp.float32)
    return q, k, v


def test_forward_matches_sdpa():
    q, k, v = _mk()
    ref = sdpa_xla(q, k, v, _causal_bias(q.shape[0], q.shape[1]))
    got = flash_attention(q, k, v, 64, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_forward_mha_no_gqa():
    q, k, v = _mk(H=2, KV=2, seed=1)
    ref = sdpa_xla(q, k, v, _causal_bias(q.shape[0], q.shape[1]))
    got = flash_attention(q, k, v, 32, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_gradients_match_sdpa():
    q, k, v = _mk(B=1, T=64, H=4, KV=2, Dh=16, seed=2)
    bias = _causal_bias(1, 64)
    w = jnp.asarray(np.random.default_rng(3).normal(size=(64, 4, 16)),
                    jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(sdpa_xla(q, k, v, bias) * w)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, 32, True) * w)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-3, err_msg=name)


def test_right_padding_equivalence():
    """Valid query rows are identical whether padded keys exist or not."""
    q, k, v = _mk(B=1, T=64, seed=4)
    full = flash_attention(q, k, v, 32, True)
    # zero out the "padding" tail of k/v — valid rows < 48 can't see it
    k2 = k.at[:, 48:].set(999.0)
    v2 = v.at[:, 48:].set(999.0)
    out2 = flash_attention(q, k2, v2, 32, True)
    np.testing.assert_allclose(np.asarray(out2[:, :48]),
                               np.asarray(full[:, :48]), atol=1e-5)
