"""Fused chunked-vocab loss == materialized-logits loss (values + grads)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_distill_tpu.distill import losses
from speech_distill_tpu.ops import fused_lm_loss


def _setup(B=2, T=10, D=16, V=100, K=6, seed=0):
    rng = np.random.default_rng(seed)
    hidden = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    lm_w = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, V, (B, T)))
    labels = labels.at[0, :3].set(losses.IGNORE_INDEX)
    logp = rng.normal(size=(B, T, K)) - 2
    idx = rng.integers(0, V, (B, T, K)).astype(np.int32)
    return hidden, lm_w, labels, jnp.asarray(logp, jnp.float32), jnp.asarray(idx)


@pytest.mark.parametrize("chunk", [32, 48, 100])
def test_fused_sparse_matches_materialized(chunk):
    hidden, lm_w, labels, tv, ti = _setup()
    fused = fused_lm_loss.fused_sparse_kd_loss(
        hidden, lm_w, labels, tv, ti, chunk_size=chunk)
    logits = hidden @ lm_w.T
    ref = losses.sparse_distill_loss(logits, tv, ti, labels)
    for a, b in zip(fused, ref):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_fused_gradients_match():
    hidden, lm_w, labels, tv, ti = _setup(seed=1)

    def loss_fused(h, w):
        return fused_lm_loss.fused_sparse_kd_loss(
            h, w, labels, tv, ti, chunk_size=32).total

    def loss_ref(h, w):
        return losses.sparse_distill_loss(h @ w.T, tv, ti, labels).total

    gf_h, gf_w = jax.grad(loss_fused, argnums=(0, 1))(hidden, lm_w)
    gr_h, gr_w = jax.grad(loss_ref, argnums=(0, 1))(hidden, lm_w)
    np.testing.assert_allclose(np.asarray(gf_h), np.asarray(gr_h),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gf_w), np.asarray(gr_w),
                               atol=1e-5, rtol=1e-4)


def test_fused_with_speech_mask():
    hidden, lm_w, labels, tv, ti = _setup(seed=2)
    mask = np.zeros(labels.shape, np.float32)
    mask[:, 4:] = 1
    fused = fused_lm_loss.fused_sparse_kd_loss(
        hidden, lm_w, labels, tv, ti, speech_token_mask=jnp.asarray(mask),
        chunk_size=48)
    ref = losses.sparse_distill_loss(hidden @ lm_w.T, tv, ti, labels,
                                     jnp.asarray(mask))
    np.testing.assert_allclose(float(fused.total), float(ref.total),
                               rtol=1e-5)
    np.testing.assert_allclose(float(fused.teacher), float(ref.teacher),
                               rtol=1e-5)


def test_pallas_backend_matches_materialized():
    hidden, lm_w, labels, tv, ti = _setup(B=2, T=10, D=16, V=300, K=6)
    fused = fused_lm_loss.fused_sparse_kd_loss(
        hidden, lm_w, labels, tv, ti, backend="pallas", interpret=True)
    ref = losses.sparse_distill_loss(hidden @ lm_w.T, tv, ti, labels)
    for a, b in zip(fused, ref):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_pallas_backend_gradients_match():
    hidden, lm_w, labels, tv, ti = _setup(B=1, T=8, D=16, V=300, K=4, seed=4)

    def loss_pallas(h, w):
        return fused_lm_loss.fused_sparse_kd_loss(
            h, w, labels, tv, ti, backend="pallas", interpret=True).total

    def loss_ref(h, w):
        return losses.sparse_distill_loss(h @ w.T, tv, ti, labels).total

    gp = jax.grad(loss_pallas, argnums=(0, 1))(hidden, lm_w)
    gr = jax.grad(loss_ref, argnums=(0, 1))(hidden, lm_w)
    for a, b, name in zip(gp, gr, ["dh", "dW"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-3, err_msg=name)


def test_fused_cross_entropy_matches():
    hidden, lm_w, labels, _, _ = _setup(seed=3)
    fused = fused_lm_loss.fused_cross_entropy(hidden, lm_w, labels,
                                              chunk_size=32)
    logits = (hidden @ lm_w.T)[:, :-1, :]
    shift = labels[:, 1:]
    valid = (shift != losses.IGNORE_INDEX).astype(jnp.float32)
    ce = losses._ce_per_pos(logits, shift)
    ref = losses._masked_mean(ce, valid)
    np.testing.assert_allclose(float(fused), float(ref), rtol=1e-5)


@pytest.mark.parametrize("chunk", [64, 256, 1024])
def test_fused_extract_top_k_matches_exact(chunk):
    """Fused teacher extraction == extract_top_k(method='exact') on the
    materialized logits: identical index sets, matching logprobs."""
    rng = np.random.default_rng(3)
    B, T, D, V, K = 2, 6, 16, 1000, 8
    hidden = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    logits = hidden @ w.T
    v_ref, i_ref = losses.extract_top_k(logits, K, student_vocab_size=800,
                                        method="exact")
    v, i = fused_lm_loss.fused_extract_top_k(hidden, w, K, vocab_limit=800,
                                             chunk_size=chunk)
    np.testing.assert_array_equal(np.sort(np.asarray(i)),
                                  np.sort(np.asarray(i_ref)))
    np.testing.assert_allclose(np.asarray(v, np.float32),
                               np.asarray(v_ref, np.float32),
                               atol=2e-3, rtol=1e-3)


def test_head_sparse_kd_loss_forward_exact():
    """head_sparse_kd_loss forward == sparse_distill_loss(unembed) exactly
    (same fp32 math, all four outputs), incl. a speech mask."""
    hidden, lm_w, labels, tv, ti = _setup(seed=5)
    smask = jnp.asarray(
        np.random.default_rng(6).integers(0, 2, labels.shape), jnp.int32)
    out = fused_lm_loss.head_sparse_kd_loss(hidden, lm_w, labels, tv, ti,
                                            smask)
    ref = losses.sparse_distill_loss(hidden @ lm_w.T, tv, ti, labels, smask)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6, atol=1e-7)


def test_head_sparse_kd_loss_grads_match_autodiff():
    """Analytic one-pass backward == autodiff, to bf16 rounding of
    d_logits. Covers dh and dW, masked rows, and the K-sparse scatters."""
    hidden, lm_w, labels, tv, ti = _setup(seed=7)

    def loss_fast(h, w):
        return fused_lm_loss.head_sparse_kd_loss(h, w, labels, tv, ti).total

    def loss_ref(h, w):
        return losses.sparse_distill_loss(h @ w.T, tv, ti, labels).total

    gf = jax.grad(loss_fast, argnums=(0, 1))(hidden, lm_w)
    gr = jax.grad(loss_ref, argnums=(0, 1))(hidden, lm_w)
    for a, b, name in zip(gf, gr, ["dh", "dW"]):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-2,
                                   err_msg=name)


def test_head_sparse_kd_loss_aux_grads():
    """Cotangents through the aux outputs (task/distill) also agree —
    the bwd handles arbitrary output cotangents, not just total's."""
    hidden, lm_w, labels, tv, ti = _setup(seed=8)

    def combo_fast(h):
        out = fused_lm_loss.head_sparse_kd_loss(hidden * 0 + h, lm_w,
                                                labels, tv, ti)
        return 0.3 * out.task + 1.7 * out.distill

    def combo_ref(h):
        out = losses.sparse_distill_loss((hidden * 0 + h) @ lm_w.T, tv, ti,
                                         labels)
        return 0.3 * out.task + 1.7 * out.distill

    gf = np.asarray(jax.grad(combo_fast)(hidden), np.float32)
    gr = np.asarray(jax.grad(combo_ref)(hidden), np.float32)
    scale = np.abs(gr).max() + 1e-12
    # bf16-rounded d_logits: per-element noise averages out less at tiny V
    np.testing.assert_allclose(gf / scale, gr / scale, atol=3.5e-2)


def test_head_dense_kd_loss_forward_exact():
    """head_dense_kd_loss forward == dense_distill_loss(unembed) (all four
    outputs, incl. the dense teacher CE monitor and a speech mask)."""
    hidden, lm_w, labels, _, _ = _setup(seed=9)
    t_logits = jnp.asarray(
        np.random.default_rng(10).normal(size=(2, 10, 100)), jnp.float32)
    smask = jnp.asarray(
        np.random.default_rng(11).integers(0, 2, labels.shape), jnp.int32)
    out = fused_lm_loss.head_dense_kd_loss(hidden, lm_w, t_logits, labels,
                                           smask)
    ref = losses.dense_distill_loss(hidden @ lm_w.T, t_logits, labels, smask)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-5, atol=1e-6)


def test_head_dense_kd_loss_grads_match_autodiff():
    hidden, lm_w, labels, _, _ = _setup(seed=12)
    t_logits = jnp.asarray(
        np.random.default_rng(13).normal(size=(2, 10, 100)), jnp.float32)

    def loss_fast(h, w):
        return fused_lm_loss.head_dense_kd_loss(
            h, w, t_logits, labels).total

    def loss_ref(h, w):
        return losses.dense_distill_loss(h @ w.T, t_logits, labels).total

    gf = jax.grad(loss_fast, argnums=(0, 1))(hidden, lm_w)
    gr = jax.grad(loss_ref, argnums=(0, 1))(hidden, lm_w)
    for a, b, name in zip(gf, gr, ["dh", "dW"]):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = np.abs(b).max() + 1e-12
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-2,
                                   err_msg=name)
