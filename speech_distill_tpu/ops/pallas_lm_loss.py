"""Pallas fused lm-head statistics: matmul + online logsumexp in one pass.

The true Liger-FLCE equivalent for TPU (reference uses Liger's Triton
fused-linear-cross-entropy, stage1.py:315). The XLA-chunked fallback
(ops/fused_lm_loss.py) is memory-light but makes ~6 fp32 passes over each
logits chunk; this kernel keeps each [BN, BV] logits tile in VMEM and folds
it into running statistics once, so the full [N, V] logits never touch HBM
in either direction:

  fwd:  lse1[n], lseT[n] (logsumexp at temperatures 1 and T) and
        label_logit[n], from h [N, D] and W [V, D]
  bwd:  dh = (a1*softmax1 + (aT/T)*softmaxT + b*onehot_label) @ W
        dW = (...)^T @ h, recomputed tile-by-tile from the saved lse.

Grid layout: vocab is the inner (sequential) grid dim so per-row VMEM
scratch accumulates across the vocab sweep; @pl.when(j==0/last) init/write.
Top-K gathers stay outside (a rematerialized W-row-gather einsum) — see
distill.losses / ops.fused_lm_loss for the loss assembly.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _stats_kernel(h_ref, w_ref, labels_ref, o_lse1, o_lseT, o_label,
                  m1, s1, mT, sT, lab, *, temperature: float, bn: int,
                  bv: int, n_v: int, v_real: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    row = pl.ds(i * bn, bn)

    @pl.when(j == 0)
    def _init():
        m1[:] = jnp.full((bn,), NEG_INF, jnp.float32)
        s1[:] = jnp.zeros((bn,), jnp.float32)
        mT[:] = jnp.full((bn,), NEG_INF, jnp.float32)
        sT[:] = jnp.zeros((bn,), jnp.float32)
        lab[:] = jnp.full((bn,), NEG_INF, jnp.float32)

    h = h_ref[:]
    w = w_ref[:]
    logits = jax.lax.dot_general(h, w, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    # mask padded vocab rows
    col = j * bv + jax.lax.broadcasted_iota(jnp.int32, (bn, bv), 1)
    logits = jnp.where(col < v_real, logits, NEG_INF)

    def online(m_ref, s_ref, x):
        cm = jnp.max(x, axis=1)
        m_new = jnp.maximum(m_ref[:], cm)
        s_ref[:] = s_ref[:] * jnp.exp(m_ref[:] - m_new) + jnp.sum(
            jnp.exp(x - m_new[:, None]), axis=1)
        m_ref[:] = m_new

    online(m1, s1, logits)
    online(mT, sT, logits / temperature)

    labels = labels_ref[row]
    hit = col == labels[:, None]
    lab[:] = jnp.maximum(lab[:], jnp.max(
        jnp.where(hit, logits, NEG_INF), axis=1))

    @pl.when(j == n_v - 1)
    def _write():
        o_lse1[row] = m1[:] + jnp.log(jnp.maximum(s1[:], 1e-30))
        o_lseT[row] = mT[:] + jnp.log(jnp.maximum(sT[:], 1e-30))
        o_label[row] = lab[:]


def _dh_kernel(h_ref, w_ref, labels_ref, lse1_ref, lseT_ref,
               a1_ref, aT_ref, b_ref, dh_ref, acc, *, temperature: float,
               bn: int, bv: int, n_v: int, v_real: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    row = pl.ds(i * bn, bn)

    @pl.when(j == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    h = h_ref[:]
    w = w_ref[:]
    logits = jax.lax.dot_general(h, w, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    col = j * bv + jax.lax.broadcasted_iota(jnp.int32, (bn, bv), 1)
    logits = jnp.where(col < v_real, logits, NEG_INF)

    p1 = jnp.exp(logits - lse1_ref[row][:, None])
    pT = jnp.exp(logits / temperature - lseT_ref[row][:, None])
    onehot = (col == labels_ref[row][:, None]).astype(jnp.float32)
    dlogits = (a1_ref[row][:, None] * p1
               + (aT_ref[row] / temperature)[:, None] * pT
               + b_ref[row][:, None] * onehot)
    acc[:] += jax.lax.dot_general(dlogits.astype(w.dtype), w,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)

    @pl.when(j == n_v - 1)
    def _write():
        dh_ref[:] = acc[:].astype(dh_ref.dtype)


def _dw_kernel(h_ref, w_ref, labels_ref, lse1_ref, lseT_ref,
               a1_ref, aT_ref, b_ref, dw_ref, acc, *, temperature: float,
               bn: int, bv: int, n_n: int, v_real: int):
    # grid (nV, nN): N is the inner sweep, accumulate dW tile
    jv = pl.program_id(0)
    i = pl.program_id(1)
    row = pl.ds(i * bn, bn)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    h = h_ref[:]
    w = w_ref[:]
    logits = jax.lax.dot_general(h, w, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    col = jv * bv + jax.lax.broadcasted_iota(jnp.int32, (bn, bv), 1)
    logits = jnp.where(col < v_real, logits, NEG_INF)

    p1 = jnp.exp(logits - lse1_ref[row][:, None])
    pT = jnp.exp(logits / temperature - lseT_ref[row][:, None])
    onehot = (col == labels_ref[row][:, None]).astype(jnp.float32)
    dlogits = (a1_ref[row][:, None] * p1
               + (aT_ref[row] / temperature)[:, None] * pT
               + b_ref[row][:, None] * onehot)
    acc[:] += jax.lax.dot_general(dlogits.astype(h.dtype), h,
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)

    @pl.when(i == n_n - 1)
    def _write():
        dw_ref[:] = acc[:].astype(dw_ref.dtype)


def _pad_to(x, mult, axis, value=0):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def lm_head_stats(h, w, labels, temperature: float = 2.0,
                  bn: int = 1024, bv: int = 1024, interpret: bool = False):
    # bn must be a multiple of the 1-D row-array tile (1024 on TPU) so the
    # in-kernel dynamic slices are provably aligned.
    """(lse1 [N], lseT [N], label_logit [N]) from h [N, D], W [V, D]."""
    out, _ = _stats_fwd(h, w, labels, temperature, bn, bv, interpret)
    return out


def _stats_call(h, w, labels, temperature, bn, bv, interpret):
    N, D = h.shape
    V = w.shape[0]
    hp = _pad_to(h, bn, 0)
    wp = _pad_to(w, bv, 0)
    lp = _pad_to(labels.astype(jnp.int32), bn, 0, value=-1)
    Np, Vp = hp.shape[0], wp.shape[0]
    n_n, n_v = Np // bn, Vp // bv

    grid = (n_n, n_v)
    h_spec = pl.BlockSpec((bn, D), lambda i, j: (i, 0))
    w_spec = pl.BlockSpec((bv, D), lambda i, j: (j, 0))
    row_spec = pl.BlockSpec((Np,), lambda i, j: (0,))
    out = pl.pallas_call(
        functools.partial(_stats_kernel, temperature=temperature, bn=bn,
                          bv=bv, n_v=n_v, v_real=V),
        grid=grid,
        in_specs=[h_spec, w_spec, row_spec],
        out_specs=[row_spec, row_spec, row_spec],
        out_shape=[jax.ShapeDtypeStruct((Np,), jnp.float32)] * 3,
        scratch_shapes=[pltpu.VMEM((bn,), jnp.float32)] * 5,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(hp, wp, lp)
    lse1, lseT, label_logit = (x[:N] for x in out)
    return (lse1, lseT, label_logit)


def _stats_fwd(h, w, labels, temperature, bn, bv, interpret):
    out = _stats_call(h, w, labels, temperature, bn, bv, interpret)
    return out, (h, w, labels, out[0], out[1])


def _stats_bwd(temperature, bn, bv, interpret, res, g):
    h, w, labels, lse1, lseT = res
    d_lse1, d_lseT, d_label = g
    N, D = h.shape
    V = w.shape[0]
    hp = _pad_to(h, bn, 0)
    wp = _pad_to(w, bv, 0)
    lp = _pad_to(labels.astype(jnp.int32), bn, 0, value=-1)
    Np, Vp = hp.shape[0], wp.shape[0]
    n_n, n_v = Np // bn, Vp // bv

    def rowpad(x):
        return _pad_to(x.astype(jnp.float32), bn, 0)

    lse1p, lseTp = rowpad(lse1), rowpad(lseT)
    a1, aT, b = rowpad(d_lse1), rowpad(d_lseT), rowpad(d_label)

    h_spec = pl.BlockSpec((bn, D), lambda i, j: (i, 0))
    w_spec = pl.BlockSpec((bv, D), lambda i, j: (j, 0))
    row_spec = pl.BlockSpec((Np,), lambda i, j: (0,))
    dh = pl.pallas_call(
        functools.partial(_dh_kernel, temperature=temperature, bn=bn, bv=bv,
                          n_v=n_v, v_real=V),
        grid=(n_n, n_v),
        in_specs=[h_spec, w_spec, row_spec, row_spec, row_spec,
                  row_spec, row_spec, row_spec],
        out_specs=h_spec,
        out_shape=jax.ShapeDtypeStruct(hp.shape, h.dtype),
        scratch_shapes=[pltpu.VMEM((bn, D), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(hp, wp, lp, lse1p, lseTp, a1, aT, b)

    # dW: vocab tiles outer, N inner
    h_spec2 = pl.BlockSpec((bn, D), lambda jv, i: (i, 0))
    w_spec2 = pl.BlockSpec((bv, D), lambda jv, i: (jv, 0))
    row_spec2 = pl.BlockSpec((Np,), lambda jv, i: (0,))
    dw = pl.pallas_call(
        functools.partial(_dw_kernel, temperature=temperature, bn=bn, bv=bv,
                          n_n=n_n, v_real=V),
        grid=(n_v, n_n),
        in_specs=[h_spec2, w_spec2, row_spec2, row_spec2, row_spec2,
                  row_spec2, row_spec2, row_spec2],
        out_specs=w_spec2,
        out_shape=jax.ShapeDtypeStruct(wp.shape, w.dtype),
        scratch_shapes=[pltpu.VMEM((bv, D), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(hp, wp, lp, lse1p, lseTp, a1, aT, b)

    return dh[:N], dw[:V], None


lm_head_stats.defvjp(_stats_fwd, _stats_bwd)


def gathered_logits(h: jax.Array, w: jax.Array, idx: jax.Array,
                    chunk: int = 512) -> jax.Array:
    """logits at teacher top-K indices: einsum over gathered W rows,
    rematerialized per N-chunk so the [N, K, D] gather never persists.
    h [N, D], idx [N, K] -> [N, K] fp32 (differentiable: AD emits the
    gather back-prop as a scatter-add into dW)."""
    N, D = h.shape
    K = idx.shape[1]
    Np = -(-N // chunk) * chunk
    hp = _pad_to(h, chunk, 0).reshape(-1, chunk, D)
    ip = _pad_to(idx, chunk, 0).reshape(-1, chunk, K)

    @jax.checkpoint
    def one(args):
        hc, ic = args
        wk = jnp.take(w, ic, axis=0)            # [chunk, K, D]
        return jnp.einsum("nd,nkd->nk", hc.astype(jnp.float32),
                          wk.astype(jnp.float32))

    out = jax.lax.map(one, (hp, ip))
    return out.reshape(Np, K)[:N]
