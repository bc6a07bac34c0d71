"""Distillation loss parity vs a torch oracle implementing the reference
semantics (dynamic-shape row filtering + KLDiv batchmean), plus internal
consistency checks (sparse K=V == dense when top-K covers the whole vocab).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from speech_distill_tpu.distill import losses

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_oracle(student_logits, labels, teacher_logits=None,
                  teacher_top_k_v=None, teacher_top_k_i=None,
                  speech_token_mask=None, temperature=2.0, alpha=0.5):
    """Reference semantics: filter valid rows, KLDiv batchmean * T^2."""
    s = torch.tensor(student_logits, dtype=torch.float32)
    lbl = torch.tensor(labels)
    shift_s = s[..., :-1, :].reshape(-1, s.size(-1))
    shift_l = lbl[..., 1:].reshape(-1)
    if speech_token_mask is not None:
        m = torch.tensor(speech_token_mask)[..., 1:].reshape(-1).bool()
        valid = m & (shift_l != -100)
    else:
        valid = shift_l != -100
    s_v = shift_s[valid]
    l_v = shift_l[valid]
    T = temperature
    if s_v.size(0) == 0:
        z = torch.tensor(0.0)
        return z, z, z, z
    if teacher_logits is not None:
        t = torch.tensor(teacher_logits, dtype=torch.float32)
        t_v = t[..., :-1, :].reshape(-1, t.size(-1))[valid]
        soft_t = F.softmax(t_v / T, dim=-1)
        log_s = F.log_softmax(s_v / T, dim=-1)
        distill = F.kl_div(log_s, soft_t, reduction="batchmean") * T * T
        teacher = F.cross_entropy(t_v, l_v)
    else:
        K = teacher_top_k_v.shape[-1]
        v = torch.tensor(teacher_top_k_v, dtype=torch.float32)
        i = torch.tensor(teacher_top_k_i, dtype=torch.long)
        v_v = v[..., :-1, :].reshape(-1, K)[valid]
        i_v = i[..., :-1, :].reshape(-1, K)[valid]
        soft_t = F.softmax(v_v / T, dim=-1)
        log_t = F.log_softmax(v_v / T, dim=-1)
        log_s_all = F.log_softmax(s_v / T, dim=-1)
        log_s_g = log_s_all.gather(-1, i_v)
        distill = (soft_t * (log_t - log_s_g)).sum(-1).mean() * T * T
        pos = (i_v == l_v.unsqueeze(-1)).nonzero(as_tuple=True)
        if pos[0].size(0) > 0:
            teacher = -v_v[pos[0], pos[1]].mean()
        else:
            teacher = torch.tensor(0.0)
    task = F.cross_entropy(s_v, l_v)
    total = alpha * task + (1 - alpha) * distill
    return total, task, distill, teacher


def _mk_batch(B=3, T=16, V=64, K=8, seed=0):
    rng = np.random.default_rng(seed)
    s = rng.normal(size=(B, T, V)).astype(np.float32) * 2
    t = rng.normal(size=(B, T, V)).astype(np.float32) * 2
    labels = rng.integers(0, V, size=(B, T)).astype(np.int64)
    labels[0, -3:] = -100
    labels[2, :2] = -100
    speech = np.zeros((B, T), np.float32)
    for b in range(B):
        speech[b, 4 + b:] = 1.0
    # sparse top-K from the teacher, like extract_teacher_logits.py
    logp = t - np.log(np.exp(t).sum(-1, keepdims=True))
    idx = np.argsort(-logp, axis=-1)[..., :K].astype(np.int32)
    vals = np.take_along_axis(logp, idx, axis=-1).astype(np.float16)
    return s, t, labels, speech, vals, idx


@pytest.mark.parametrize("use_mask", [True, False])
def test_dense_matches_oracle(use_mask):
    s, t, labels, speech, _, _ = _mk_batch()
    mask = speech if use_mask else None
    ours = losses.distillation_loss(
        jnp.asarray(s), jnp.asarray(labels), teacher_logits=jnp.asarray(t),
        speech_token_mask=None if mask is None else jnp.asarray(mask))
    ref = _torch_oracle(s, labels, teacher_logits=t, speech_token_mask=mask)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("use_mask", [True, False])
def test_sparse_matches_oracle(use_mask):
    s, _, labels, speech, vals, idx = _mk_batch()
    mask = speech if use_mask else None
    ours = losses.distillation_loss(
        jnp.asarray(s), jnp.asarray(labels),
        teacher_top_k_v=jnp.asarray(vals), teacher_top_k_i=jnp.asarray(idx),
        speech_token_mask=None if mask is None else jnp.asarray(mask))
    ref = _torch_oracle(s, labels, teacher_top_k_v=vals, teacher_top_k_i=idx,
                        speech_token_mask=mask)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-4, atol=1e-5)


def test_sparse_equals_dense_at_full_k():
    """With K = V (and fp32 values), the sparse KL must equal the dense KL."""
    B, T, V = 2, 10, 32
    rng = np.random.default_rng(3)
    s = rng.normal(size=(B, T, V)).astype(np.float32)
    t = rng.normal(size=(B, T, V)).astype(np.float32)
    labels = rng.integers(0, V, size=(B, T)).astype(np.int64)
    logp = t - np.log(np.exp(t).sum(-1, keepdims=True))
    idx = np.argsort(-logp, axis=-1).astype(np.int32)
    vals = np.take_along_axis(logp, idx, axis=-1).astype(np.float32)

    dense = losses.dense_distill_loss(jnp.asarray(s), jnp.asarray(t),
                                      jnp.asarray(labels))
    sparse = losses.sparse_distill_loss(jnp.asarray(s), jnp.asarray(vals),
                                        jnp.asarray(idx), jnp.asarray(labels))
    np.testing.assert_allclose(float(dense.distill), float(sparse.distill),
                               rtol=1e-4)
    np.testing.assert_allclose(float(dense.task), float(sparse.task), rtol=1e-5)


def test_all_masked_returns_zeros():
    s, t, labels, _, vals, idx = _mk_batch()
    labels[:] = -100
    out = losses.dense_distill_loss(jnp.asarray(s), jnp.asarray(t),
                                    jnp.asarray(labels))
    for x in out:
        assert float(x) == 0.0
    out = losses.sparse_distill_loss(jnp.asarray(s), jnp.asarray(vals),
                                     jnp.asarray(idx), jnp.asarray(labels))
    for x in out:
        assert float(x) == 0.0


def test_label_never_in_topk_teacher_zero():
    """Reference returns teacher_loss=0 when no gold label is in top-K."""
    B, T, V, K = 2, 8, 32, 4
    rng = np.random.default_rng(5)
    s = rng.normal(size=(B, T, V)).astype(np.float32)
    vals = rng.normal(size=(B, T, K)).astype(np.float32)
    idx = np.zeros((B, T, K), np.int32)  # indices all 0
    labels = np.full((B, T), 5, np.int64)  # gold label 5 never in top-K
    out = losses.sparse_distill_loss(jnp.asarray(s), jnp.asarray(vals),
                                     jnp.asarray(idx), jnp.asarray(labels))
    assert float(out.teacher) == 0.0
    assert float(out.distill) != 0.0


def test_segmented_top_k_exact():
    """segmented_top_k is bit-identical to lax.top_k (values AND indices,
    i.e. the same smallest-index tie order) on random, tied, clustered and
    adversarial inputs."""
    import jax.lax as lax

    def check(x, k, group=64):
        x = jnp.asarray(x, jnp.float32)
        ev, ei = lax.top_k(x, k)
        gv, gi = losses.segmented_top_k(x, k, group=group)
        np.testing.assert_array_equal(np.asarray(gv), np.asarray(ev))
        np.testing.assert_array_equal(np.asarray(gi), np.asarray(ei))

    rng = np.random.default_rng(11)
    # large vocab, random
    check(rng.normal(size=(4, 50000)), 128)
    # non-multiple-of-group vocab (padding path)
    check(rng.normal(size=(3, 50001)), 64)
    # heavy ties: few distinct values -> tie order must match exactly
    check(rng.integers(0, 7, size=(4, 30000)).astype(np.float32), 100)
    # all equal (every element tied)
    check(np.zeros((2, 20000)), 64)
    # all top-k clustered inside one segment
    x = rng.normal(size=(2, 40000)).astype(np.float32)
    x[:, 1000:1064] += 100.0
    check(x, 32)
    # monotonic ascending / descending
    check(np.tile(np.arange(30000, dtype=np.float32), (2, 1)), 50)
    check(np.tile(np.arange(30000, 0, -1, dtype=np.float32), (2, 1)), 50)
    # ties exactly at the k-th boundary spanning many segments
    x = np.zeros((2, 30000), np.float32)
    x[:, ::100] = 5.0          # 300 tied elements, k=128 takes first 128
    check(x, 128)
    # small vocab falls back to plain top_k
    check(rng.normal(size=(2, 200)), 8)
    # matches chunked_top_k (the previous exact path) bit-for-bit too
    x = jnp.asarray(rng.normal(size=(2, 159488)), jnp.float32)
    cv, ci = losses.chunked_top_k(x, 128)
    gv, gi = losses.segmented_top_k(x, 128)
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(cv))
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(ci))


def test_extract_top_k_matches_torch():
    rng = np.random.default_rng(7)
    t = rng.normal(size=(2, 6, 40)).astype(np.float32)
    v, i = losses.extract_top_k(jnp.asarray(t), k=5, student_vocab_size=32)
    logp = F.log_softmax(torch.tensor(t[..., :32]), dim=-1)
    tv, ti = torch.topk(logp, k=5, dim=-1)
    np.testing.assert_array_equal(np.asarray(i), ti.numpy().astype(np.int32))
    np.testing.assert_allclose(np.asarray(v, np.float32),
                               tv.to(torch.float16).numpy().astype(np.float32),
                               atol=1e-3)
