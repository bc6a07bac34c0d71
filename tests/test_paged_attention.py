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


def _quantize_pools(kp, vp):
    from speech_distill_tpu.ops.paged_attention import quantize_kv
    kq, ks = quantize_kv(kp)
    vq, vs = quantize_kv(vp)
    return kq, ks, vq, vs


def test_quantize_roundtrip_bound():
    """Per-(token, head) symmetric int8: relative error <= 1/254 of the
    slice amax, zeros exact."""
    from speech_distill_tpu.ops.paged_attention import quantize_kv
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(5, 3, 16, 64)), jnp.float32)
    q, s = quantize_kv(x)
    deq = np.asarray(q, np.float32) * np.asarray(s)[..., None]
    amax = np.abs(np.asarray(x)).max(axis=-1, keepdims=True)
    assert np.all(np.abs(deq - np.asarray(x)) <= amax / 254 + 1e-8)
    z, zs = quantize_kv(jnp.zeros((2, 4)))
    assert np.all(np.asarray(z) == 0) and np.all(np.asarray(zs) == 1.0)


def test_kernel_int8_matches_oracle():
    q, kp, vp, bt, lengths = _mk(seed=5)
    kq, ks, vq, vs = _quantize_pools(kp, vp)
    ref = np.asarray(paged_attention_xla(q, kq, vq, bt, lengths,
                                         k_scale=ks, v_scale=vs))
    got = np.asarray(paged_attention(q, kq, vq, bt, lengths,
                                     k_scale=ks, v_scale=vs,
                                     interpret=True))
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-3)


def test_int8_oracle_close_to_fp32_attention():
    """Quantized attention approximates the unquantized result (softmax
    over amax-scaled int8 K/V: well inside 1% at unit-normal K/V)."""
    q, kp, vp, bt, lengths = _mk(seed=6)
    kq, ks, vq, vs = _quantize_pools(kp, vp)
    full = np.asarray(paged_attention_xla(q, kp, vp, bt, lengths))
    quant = np.asarray(paged_attention_xla(q, kq, vq, bt, lengths,
                                           k_scale=ks, v_scale=vs))
    np.testing.assert_allclose(quant, full, atol=2e-2, rtol=2e-2)


def test_kernel_int8_full_pool_layer_select():
    """Full [L, P, ...] int8 pool + traced layer index, per layer."""
    q, kp, vp, bt, lengths = _mk(seed=8)
    kp2 = jnp.stack([kp, kp[::-1]])
    vp2 = jnp.stack([vp, vp[::-1]])
    kq, ks, vq, vs = _quantize_pools(kp2, vp2)
    for lay in range(2):
        ref = np.asarray(paged_attention_xla(
            q, kq[lay], vq[lay], bt, lengths,
            k_scale=ks[lay], v_scale=vs[lay]))
        got = np.asarray(paged_attention(
            q, kq, vq, bt, lengths, layer=jnp.asarray(lay, jnp.int32),
            k_scale=ks, v_scale=vs, interpret=True))
        np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-3)


def test_kernel_window_edges_sweep():
    """Every page count 1..max_pages with lengths at page/window
    boundaries +-1 (the windowed-DMA tail cases: slack slots, exact
    window fill, single window, multi window)."""
    q, kp, vp, bt, _ = _mk(B=1, KV=2, G=3, Dh=64, P=16, ps=64,
                           max_pages=8, seed=11)
    ps, mp = 64, 8
    lens = sorted({1, ps - 1, ps, ps + 1,
                   2 * ps, 3 * ps - 1, 4 * ps, 4 * ps + 1,
                   5 * ps + 7, 7 * ps, 8 * ps})
    for L in lens:
        lengths = jnp.asarray([L], jnp.int32)
        ref = np.asarray(paged_attention_xla(q, kp, vp, bt, lengths))
        got = np.asarray(paged_attention(q, kp, vp, bt, lengths,
                                         interpret=True))
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4,
                                   err_msg=f"L={L}")
