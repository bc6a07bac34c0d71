"""Paged decode attention: Pallas kernel (interpret) vs gather oracle vs
dense softmax. Mirrors vLLM's PagedAttention decode semantics
(reference soulxpodcast/engine/llm_engine.py:78-114 leans on vLLM)."""
import numpy as np
import jax
import jax.numpy as jnp

from speech_distill_tpu.ops.paged_attention import (
    paged_attention, paged_attention_xla)


def _mk(B=4, KV=2, G=3, Dh=64, P=16, ps=64, max_pages=4, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, KV, G, Dh)), jnp.float32)
    kp = jnp.asarray(rng.normal(size=(P, KV, ps, Dh)), jnp.float32)
    vp = jnp.asarray(rng.normal(size=(P, KV, ps, Dh)), jnp.float32)
    # distinct pages per row; entries beyond the row's page count are junk
    bt = rng.permutation(P)[:B * max_pages].reshape(B, max_pages)
    bt = jnp.asarray(bt, jnp.int32)
    # lengths: idle row, partial page, exact page boundary, multi-page
    lengths = jnp.asarray([0, ps // 2 + 3, ps, 2 * ps + 17][:B], jnp.int32)
    return q, kp, vp, bt, lengths


def _dense(q, kp, vp, bt, lengths):
    """Straight softmax over the gathered keys, row by row (numpy)."""
    B, KV, G, Dh = q.shape
    ps = kp.shape[2]
    out = np.zeros_like(np.asarray(q))
    for b in range(B):
        L = int(lengths[b])
        if L == 0:
            continue
        pages = np.asarray(bt[b])[: -(-L // ps)]
        k = np.asarray(kp)[pages].transpose(1, 0, 2, 3) \
            .reshape(KV, -1, Dh)[:, :L]
        v = np.asarray(vp)[pages].transpose(1, 0, 2, 3) \
            .reshape(KV, -1, Dh)[:, :L]
        for h in range(KV):
            s = np.asarray(q)[b, h] @ k[h].T * (Dh ** -0.5)   # [G, L]
            s = s - s.max(axis=1, keepdims=True)
            p = np.exp(s)
            p /= p.sum(axis=1, keepdims=True)
            out[b, h] = p @ v[h]
    return out


def test_xla_oracle_matches_dense():
    q, kp, vp, bt, lengths = _mk()
    ref = _dense(q, kp, vp, bt, lengths)
    got = np.asarray(paged_attention_xla(q, kp, vp, bt, lengths))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_kernel_matches_oracle_fp32():
    q, kp, vp, bt, lengths = _mk()
    ref = np.asarray(paged_attention_xla(q, kp, vp, bt, lengths))
    got = np.asarray(paged_attention(q, kp, vp, bt, lengths, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_kernel_bf16_pool():
    q, kp, vp, bt, lengths = _mk(seed=1)
    kpb, vpb = kp.astype(jnp.bfloat16), vp.astype(jnp.bfloat16)
    qb = q.astype(jnp.bfloat16)
    ref = np.asarray(
        paged_attention_xla(qb, kpb, vpb, bt, lengths)).astype(np.float32)
    got = np.asarray(
        paged_attention(qb, kpb, vpb, bt, lengths,
                        interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got, ref, atol=3e-2, rtol=3e-2)


def test_kernel_single_page_and_full_table():
    # every row exactly fills its whole table (no junk entries)
    q, kp, vp, bt, _ = _mk(seed=2)
    ps, mp = kp.shape[2], bt.shape[1]
    lengths = jnp.full((q.shape[0],), ps * mp, jnp.int32)
    ref = np.asarray(paged_attention_xla(q, kp, vp, bt, lengths))
    got = np.asarray(paged_attention(q, kp, vp, bt, lengths, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_junk_table_entries_never_read():
    """Entries past ceil(len/ps) may alias other rows' pages — harmless."""
    q, kp, vp, bt, lengths = _mk(seed=3)
    ref = np.asarray(paged_attention(q, kp, vp, bt, lengths, interpret=True))
    bt2 = bt.at[:, -1].set(0)          # clobber the last (unused) entry
    lengths = jnp.minimum(lengths, (bt.shape[1] - 1) * kp.shape[2])
    got = np.asarray(
        paged_attention(q, kp, vp, bt2, lengths, interpret=True))
    ref2 = np.asarray(
        paged_attention(q, kp, vp, bt, lengths, interpret=True))
    np.testing.assert_allclose(got, ref2, atol=0, rtol=0)
    del ref
