"""Causal flash attention, Pallas TPU kernels (fwd + custom VJP).

The TPU-native replacement for the reference's flash-attention-2 dependency
(train.py:160,177; stage1.py:113). Blockwise online-softmax forward plus a
two-kernel backward (dq; per-head dk/dv reduced over GQA groups outside the
kernel). fp32 accumulation throughout; causal masking only — correct for
right-padded training batches because padded keys sit beyond every valid
query's causal window (downstream losses mask padded query rows).

Layout: q [B, T, H, Dh], k/v [B, S, KV, Dh] (GQA: H = KV * G).
Requires T == S, T % block == 0. Use ops.attention.sdpa for dispatch.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 256
NEG_INF = -1e30


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block: int,
                scale: float):
    """One program: query block (b, h, iq) against all causal key blocks.
    lse_ref maps the whole (1, H, T) plane (TPU block-shape rules forbid
    (1, 1, block) row blocks); programs write disjoint slices."""
    h = pl.program_id(1)
    iq = pl.program_id(2)
    # matmul OPERANDS stay in the input dtype (bf16 in training) with fp32
    # accumulation via preferred_element_type — fp32xfp32 operands would
    # run the MXU in multi-pass mode (~6x slower); softmax math is fp32.
    # The softmax scale is applied to the fp32 product, not the operands.
    q = q_ref[0, 0]                                      # [Bq, Dh]
    Bq, Dh = q.shape
    op_dt = q.dtype

    m = jnp.full((Bq,), NEG_INF, jnp.float32)
    l = jnp.zeros((Bq,), jnp.float32)
    acc = jnp.zeros((Bq, Dh), jnp.float32)

    q_pos = iq * block + jax.lax.broadcasted_iota(jnp.int32, (Bq, block), 0)

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[0, 0, pl.ds(j * block, block), :]
        v = v_ref[0, 0, pl.ds(j * block, block), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        k_pos = j * block + jax.lax.broadcasted_iota(jnp.int32, (Bq, block), 1)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1))
        p = jnp.exp(s - m_new[:, None])
        correction = jnp.exp(m - m_new)
        l_new = l * correction + jnp.sum(p, axis=1)
        acc_new = acc * correction[:, None] + jax.lax.dot_general(
            p.astype(op_dt), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, iq + 1, body, (m, l, acc))
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0, 0] = (acc / l_safe[:, None]).astype(o_ref.dtype)
    lse_ref[0, h, pl.ds(iq * block, block)] = \
        (m + jnp.log(l_safe)).astype(jnp.float32)


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *,
               block: int, scale: float):
    h = pl.program_id(1)
    iq = pl.program_id(2)
    q = q_ref[0, 0]
    do = do_ref[0, 0]
    op_dt = q.dtype
    lse = lse_ref[0, h, pl.ds(iq * block, block)]
    delta = delta_ref[0, h, pl.ds(iq * block, block)]
    Bq, Dh = q.shape
    q_pos = iq * block + jax.lax.broadcasted_iota(jnp.int32, (Bq, block), 0)

    def body(j, dq):
        k = k_ref[0, 0, pl.ds(j * block, block), :]
        v = v_ref[0, 0, pl.ds(j * block, block), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        k_pos = j * block + jax.lax.broadcasted_iota(jnp.int32, (Bq, block), 1)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        p = jnp.exp(s - lse[:, None])
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta[:, None])
        return dq + jax.lax.dot_general(
            ds.astype(op_dt), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, iq + 1, body, jnp.zeros((Bq, Dh), jnp.float32))
    dq_ref[0, 0] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, *, block: int, scale: float, n_blocks: int):
    h = pl.program_id(1)
    ik = pl.program_id(2)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    op_dt = k.dtype
    Bk, Dh = k.shape
    k_pos = ik * block + jax.lax.broadcasted_iota(jnp.int32, (block, Bk), 1)

    def body(j, carry):
        dk, dv = carry
        q = q_ref[0, 0, pl.ds(j * block, block), :]
        do = do_ref[0, 0, pl.ds(j * block, block), :]
        lse = lse_ref[0, h, pl.ds(j * block, block)]
        delta = delta_ref[0, h, pl.ds(j * block, block)]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        q_pos = j * block + jax.lax.broadcasted_iota(jnp.int32, (block, Bk), 0)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        p = jnp.exp(s - lse[:, None])                     # [Bq, Bk]
        dv = dv + jax.lax.dot_general(
            p.astype(op_dt), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta[:, None])
        dk = dk + jax.lax.dot_general(
            ds.astype(op_dt), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk, dv

    dk, dv = jax.lax.fori_loop(
        ik, n_blocks, body,
        (jnp.zeros((Bk, Dh), jnp.float32), jnp.zeros((Bk, Dh), jnp.float32)))
    dk_ref[0, 0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _layouts(q, k):
    B, T, H, Dh = q.shape
    KV = k.shape[2]
    return B, T, H, KV, Dh, H // KV


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, block: int = DEFAULT_BLOCK,
                    interpret: bool = False):
    out, _ = _flash_fwd(q, k, v, block, interpret)
    return out


def _flash_call(q, k, v, block, interpret):
    B, T, H, KV, Dh, G = _layouts(q, k)
    n_blocks = T // block
    scale = Dh ** -0.5
    qt = q.transpose(0, 2, 1, 3)          # [B, H, T, Dh]
    kt = k.transpose(0, 2, 1, 3)          # [B, KV, T, Dh]
    vt = v.transpose(0, 2, 1, 3)

    grid = (B, H, n_blocks)
    q_spec = pl.BlockSpec((1, 1, block, Dh), lambda b, h, i: (b, h, i, 0))
    kv_spec = pl.BlockSpec((1, 1, T, Dh), lambda b, h, i: (b, h // G, 0, 0))
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block=block, scale=scale),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=[q_spec,
                   pl.BlockSpec((1, H, T), lambda b, h, i: (b, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct(qt.shape, q.dtype),
                   jax.ShapeDtypeStruct((B, H, T), jnp.float32)],
        interpret=interpret,
    )(qt, kt, vt)
    return out.transpose(0, 2, 1, 3), (out, lse, qt, kt, vt)


def _flash_fwd(q, k, v, block, interpret):
    o, res = _flash_call(q, k, v, block, interpret)
    return o, res


def _flash_bwd(block, interpret, res, g):
    out_t, lse, qt, kt, vt = res           # out_t [B, H, T, Dh]
    B, H, T, Dh = qt.shape
    KV = kt.shape[1]
    G = H // KV
    n_blocks = T // block
    scale = Dh ** -0.5
    do_t = g.transpose(0, 2, 1, 3)
    delta = jnp.sum(do_t.astype(jnp.float32) * out_t.astype(jnp.float32),
                    axis=-1)               # [B, H, T]

    grid = (B, H, n_blocks)
    blk_spec = pl.BlockSpec((1, 1, block, Dh), lambda b, h, i: (b, h, i, 0))
    full_spec = pl.BlockSpec((1, 1, T, Dh), lambda b, h, i: (b, h, 0, 0))
    kv_spec = pl.BlockSpec((1, 1, T, Dh), lambda b, h, i: (b, h // G, 0, 0))
    kv_blk_spec = pl.BlockSpec((1, 1, block, Dh),
                               lambda b, h, i: (b, h // G, i, 0))
    row_plane = pl.BlockSpec((1, H, T), lambda b, h, i: (b, 0, 0))

    dq_t = pl.pallas_call(
        functools.partial(_dq_kernel, block=block, scale=scale),
        grid=grid,
        in_specs=[blk_spec, kv_spec, kv_spec, blk_spec, row_plane,
                  row_plane],
        out_specs=blk_spec,
        out_shape=jax.ShapeDtypeStruct(qt.shape, qt.dtype),
        interpret=interpret,
    )(qt, kt, vt, do_t, lse, delta)

    # per-query-head dk/dv, then reduce over the G heads of each kv head
    dk_h, dv_h = pl.pallas_call(
        functools.partial(_dkv_kernel, block=block, scale=scale,
                          n_blocks=n_blocks),
        grid=grid,
        in_specs=[full_spec, kv_blk_spec, kv_blk_spec, full_spec,
                  row_plane, row_plane],
        out_specs=[blk_spec, blk_spec],
        out_shape=[jax.ShapeDtypeStruct((B, H, T, Dh), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, T, Dh), jnp.float32)],
        interpret=interpret,
    )(qt, kt, vt, do_t, lse, delta)

    dk_t = dk_h.reshape(B, KV, G, T, Dh).sum(axis=2)
    dv_t = dv_h.reshape(B, KV, G, T, Dh).sum(axis=2)
    return (dq_t.transpose(0, 2, 1, 3),
            dk_t.transpose(0, 2, 1, 3).astype(kt.dtype),
            dv_t.transpose(0, 2, 1, 3).astype(vt.dtype))


def _fwd_rule(q, k, v, block, interpret):
    o, res = _flash_call(q, k, v, block, interpret)
    return o, res


flash_attention.defvjp(_fwd_rule, _flash_bwd)
