"""Paged decode attention: single-token queries over a block-table KV pool.

The TPU-native equivalent of vLLM's PagedAttention (the engine the reference
leans on for fast decode, soulxpodcast/engine/llm_engine.py:78-114). KV lives
in a shared pool of fixed-size pages [P, KV, page_size, Dh]; each slot's
pages are named by a block table row, so memory is allocated on demand and
identical prompt prefixes can share pages (infer/paged.py PrefixRegistry).

Why a Pallas kernel: batched decode is KV-bandwidth-bound. A contiguous
[B, max_len] cache reads every column every step regardless of how full each
row is; an XLA gather over the block table would round-trip the gathered KV
through HBM. This kernel DMAs exactly ceil(length/page_size) pages per row
straight from the pool into VMEM in double-buffered WINDOWS of win_pages
(the next window streams in while the current one is in the MXU) — per-step
HBM traffic is proportional to the tokens actually present, not to max_len,
and per-page loop overhead amortizes over the window (per-page iteration
made long-residency decode 26x slower than bytes justify).

Pages are laid out head-inside ([P, KV, page_size, Dh]) so ONE async copy
per page moves all KV heads (KV*page_size*Dh elements — e.g. 256 KB at
KV=8, ps=128, bf16) instead of KV separate 32 KB copies: the grid is over
rows only, and per-head attention unrolls over the VMEM-resident page.

Layouts (decode step, T == 1):
  q            [B, KV, G, Dh]   (H = KV * G query heads, GQA-grouped)
  k/v pool     [P, KV, page_size, Dh]     (page-major, head-inside)
  block_tables [B, max_pages] int32       (pool page ids; entries beyond
                                           ceil(len/page_size) never read)
  lengths      [B] int32                  (valid keys incl. the current
                                           token; 0 => row idle, output 0)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def quantize_kv(x: jax.Array, axis: int = -1):
    """Symmetric int8 quantization with one scale per slice along ``axis``
    (per token per KV head when x is [..., Dh]). Returns (q int8, scale
    f32 with ``axis`` squeezed). Exact zeros stay exact (scale 1)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    scl = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scl),
                 -127, 127).astype(jnp.int8)
    return q, jnp.squeeze(scl, axis)


def _decode_kernel(bt_ref, len_ref, lay_ref, q_ref, k_hbm, v_hbm, *rest,
                   page_size: int, scale: float, quantized: bool,
                   win_pages: int):
    """``rest`` is (o_ref, k_scr, v_scr, sem) for the bf16/f32 pool, or
    (ks_hbm, vs_hbm, o_ref, k_scr, v_scr, ks_scr, vs_scr, sem) for the
    int8 pool (per-token scales ride a second small DMA per page).

    Pages stream in WINDOWS of ``win_pages``: all W page copies of a
    window start together (latency overlaps), and compute is one
    [G, W*ps] score dot + one [G, W*ps]x[W*ps, Dh] pv dot per head per
    window instead of per page — decode at long residency is otherwise
    bound by per-page loop/iteration overhead, not bytes. Tail windows
    move only the pages that exist; their slack scratch slots are ZEROED
    (cheap VMEM writes, no HBM traffic — measured: clamped duplicate
    copies cost 20% on the short-residency serve workload) so masked
    lanes contribute exact zeros to the pv dot — never uninitialized
    scratch, whose NaN/inf bit patterns would poison 0*x.

    Quantized math folds EXACTLY into the flash recurrence: the per-key
    scale is a column factor of the score row (applied post-dot on
    [G, W*ps] instead of dequantizing [W*ps, Dh]), and the per-value
    scale folds into ``pexp`` before the pv-dot — two MXU dots per
    window either way, operands int8→bf16 (lossless: |q| ≤ 127 fits
    bf16's 8-bit mantissa exactly)."""
    if quantized:
        (ks_hbm, vs_hbm, o_ref, k_scr, v_scr, ks_scr, vs_scr, sem) = rest
    else:
        o_ref, k_scr, v_scr, sem = rest
        ks_scr = vs_scr = None
    b = pl.program_id(0)
    L = len_ref[b]
    n_pages = jax.lax.div(L + page_size - 1, page_size)
    W = win_pages
    n_win = jax.lax.div(n_pages + W - 1, W)

    def move_window(w, slot, op):
        """start/wait the page copies of window ``w`` that exist (tail
        windows move only real pages — no HBM bytes for slack slots)."""
        for j in range(W):
            p = w * W + j

            @pl.when(p < n_pages)
            def _copy():
                page = bt_ref[b, p]
                # lay_ref[0] selects the decoder layer inside the full
                # [L, P, KV, ps, Dh] pool — the pool never leaves HBM
                # whole, so the layer scan carries it in place
                cs = [pltpu.make_async_copy(
                          k_hbm.at[lay_ref[0], page],
                          k_scr.at[slot, j], sem.at[slot, j, 0]),
                      pltpu.make_async_copy(
                          v_hbm.at[lay_ref[0], page],
                          v_scr.at[slot, j], sem.at[slot, j, 1])]
                if quantized:
                    cs.append(pltpu.make_async_copy(
                        ks_hbm.at[lay_ref[0], page],
                        ks_scr.at[slot, j], sem.at[slot, j, 2]))
                    cs.append(pltpu.make_async_copy(
                        vs_hbm.at[lay_ref[0], page],
                        vs_scr.at[slot, j], sem.at[slot, j, 3]))
                for c in cs:
                    getattr(c, op)()

    @pl.when(b == 0)
    def _init_scratch():
        # zero the scratch ONCE per kernel call, before any DMA is in
        # flight: afterwards every slack slot holds zeros or a previous
        # row's real (finite) K/V, so masked lanes contribute exact
        # zeros to the pv dot — uninitialized VMEM can decode to NaN/inf
        # and 0*NaN would poison the accumulator
        k_scr[...] = jnp.zeros(k_scr.shape, k_scr.dtype)
        v_scr[...] = jnp.zeros(v_scr.shape, v_scr.dtype)
        if quantized:
            ks_scr[...] = jnp.zeros(ks_scr.shape, ks_scr.dtype)
            vs_scr[...] = jnp.zeros(vs_scr.shape, vs_scr.dtype)

    @pl.when(n_win > 0)
    def _start_first():
        move_window(0, 0, "start")

    KV, G, Dh = q_ref.shape[1:]
    op_dt = q_ref.dtype
    Wps = W * page_size

    def body(w, carry):
        ms, ls, accs = carry
        slot = jax.lax.rem(w, 2)

        @pl.when(w + 1 < n_win)
        def _start_next():
            move_window(w + 1, jax.lax.rem(w + 1, 2), "start")

        move_window(w, slot, "wait")
        k_pos = w * Wps + jax.lax.broadcasted_iota(
            jnp.int32, (G, Wps), 1)
        in_len = k_pos < L
        nms, nls, naccs = [], [], []
        # one window of DMAs feeds all KV heads; attention unrolls over
        # them ([W, ps, Dh] -> [W*ps, Dh] is a contiguous-dim merge)
        for h in range(KV):
            q = q_ref[0, h]                        # [G, Dh]
            k = k_scr[slot, :, h].reshape(Wps, Dh)
            v = v_scr[slot, :, h].reshape(Wps, Dh)
            if quantized:
                k = k.astype(op_dt)
                v = v.astype(op_dt)
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if quantized:
                s = s * ks_scr[slot, :, h].reshape(Wps)[None, :]
            s = jnp.where(in_len, s * scale, NEG_INF)
            m_new = jnp.maximum(ms[h], jnp.max(s, axis=1))
            pexp = jnp.exp(s - m_new[:, None])
            corr = jnp.exp(ms[h] - m_new)
            nms.append(m_new)
            nls.append(ls[h] * corr + jnp.sum(pexp, axis=1))
            pv = (pexp * vs_scr[slot, :, h].reshape(Wps)[None, :]
                  if quantized else pexp)
            naccs.append(accs[h] * corr[:, None] + jax.lax.dot_general(
                pv.astype(op_dt), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        return tuple(nms), tuple(nls), tuple(naccs)

    m0 = tuple(jnp.full((G,), NEG_INF, jnp.float32) for _ in range(KV))
    l0 = tuple(jnp.zeros((G,), jnp.float32) for _ in range(KV))
    a0 = tuple(jnp.zeros((G, Dh), jnp.float32) for _ in range(KV))
    ms, ls, accs = jax.lax.fori_loop(0, n_win, body, (m0, l0, a0))
    for h in range(KV):
        l_safe = jnp.maximum(ls[h], 1e-30)
        out = jnp.where(n_pages > 0, accs[h] / l_safe[:, None], 0.0)
        o_ref[0, h] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("win_pages", "interpret"))
def paged_attention(q: jax.Array, k_pool: jax.Array, v_pool: jax.Array,
                    block_tables: jax.Array, lengths: jax.Array,
                    layer=None, k_scale=None, v_scale=None,
                    win_pages: int = 4, interpret: bool = False
                    ) -> jax.Array:
    """q: [B, KV, G, Dh] single-token queries -> [B, KV, G, Dh].

    ``k_pool``/``v_pool`` are one layer's pages [P, KV, ps, Dh], or the
    FULL per-layer pool [L, P, KV, ps, Dh] with ``layer`` (traced int32)
    selecting the layer inside the kernel. The full-pool form is what the
    decode layer scan uses: the pool stays a scan carry updated in place,
    never materializing a per-layer slice (a [P, KV, ps, Dh] dynamic-slice
    read is ~hundreds of MB of HBM traffic per layer per step).

    int8 pools (the vLLM quantized-KV-cache capability) pass per-token
    scales ``k_scale``/``v_scale`` of shape pool.shape[:-1] ([..., KV, ps]
    f32, one scale per (token, kv-head)); page DMA bytes halve and the
    dequant folds into the existing two dots per page."""
    B, KV, G, Dh = q.shape
    quantized = k_pool.dtype == jnp.int8
    if quantized and (k_scale is None or v_scale is None):
        raise ValueError("int8 pools require k_scale/v_scale")
    if layer is None:
        # uniform kernel: a unit layer axis + layer index 0
        k_pool = k_pool[None]
        v_pool = v_pool[None]
        if quantized:
            k_scale, v_scale = k_scale[None], v_scale[None]
        layer = jnp.zeros((), jnp.int32)
    page_size = k_pool.shape[3]
    scale = Dh ** -0.5
    lay = jnp.reshape(layer, (1,)).astype(jnp.int32)
    q_spec = pl.BlockSpec((1, KV, G, Dh),
                          lambda b, bt, ln, ly: (b, 0, 0, 0))
    W = max(1, min(win_pages, block_tables.shape[1]))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    scratch = [pltpu.VMEM((2, W, KV, page_size, Dh), k_pool.dtype),
               pltpu.VMEM((2, W, KV, page_size, Dh), v_pool.dtype)]
    operands = [q, k_pool, v_pool]
    in_specs = [q_spec, any_spec, any_spec]
    if quantized:
        operands += [k_scale.astype(jnp.float32),
                     v_scale.astype(jnp.float32)]
        in_specs += [any_spec, any_spec]
        scratch += [pltpu.VMEM((2, W, KV, page_size), jnp.float32),
                    pltpu.VMEM((2, W, KV, page_size), jnp.float32)]
    scratch.append(pltpu.SemaphoreType.DMA((2, W, 4 if quantized else 2)))
    return pl.pallas_call(
        functools.partial(_decode_kernel, page_size=page_size, scale=scale,
                          quantized=quantized, win_pages=W),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B,),
            in_specs=in_specs,
            out_specs=q_spec,
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(block_tables, lengths, lay, q, *operands[1:])


def paged_attention_xla(q: jax.Array, k_pool: jax.Array, v_pool: jax.Array,
                        block_tables: jax.Array, lengths: jax.Array,
                        layer=None, k_scale=None, v_scale=None) -> jax.Array:
    """Gather-based reference (correctness oracle; used on CPU meshes).

    Materializes the gathered KV [B, max_pages*page_size, ...] — same math
    as the kernel, but with an extra HBM round-trip the kernel avoids.
    Accepts the full [L, P, KV, ps, Dh] pool + ``layer`` like the kernel
    (the gather indexes (layer, page) pairs, so no per-layer slice of the
    pool is materialized either), and int8 pools + per-token scales
    (dequantized after the gather — the kernel's fold is numerically the
    same product in a different association).
    """
    B, KV, G, Dh = q.shape
    quantized = k_pool.dtype == jnp.int8
    if layer is None:
        k_pool = k_pool[None]
        v_pool = v_pool[None]
        if quantized:
            k_scale, v_scale = k_scale[None], v_scale[None]
        layer = jnp.zeros((), jnp.int32)
    ps = k_pool.shape[3]
    mp = block_tables.shape[1]
    # [B, mp, KV, ps, Dh] -> [B, S, KV, Dh]
    k = k_pool[layer, block_tables]
    v = v_pool[layer, block_tables]
    if quantized:
        op_dt = q.dtype
        k = k.astype(op_dt) * k_scale[layer, block_tables][
            ..., None].astype(op_dt)
        v = v.astype(op_dt) * v_scale[layer, block_tables][
            ..., None].astype(op_dt)
    k = k.transpose(0, 1, 3, 2, 4).reshape(B, mp * ps, KV, Dh)
    v = v.transpose(0, 1, 3, 2, 4).reshape(B, mp * ps, KV, Dh)
    scale = Dh ** -0.5
    s = jnp.einsum("bkgd,bskd->bkgs", q, k,
                   preferred_element_type=jnp.float32) * scale
    valid = (jnp.arange(mp * ps)[None] < lengths[:, None])  # [B, S]
    s = jnp.where(valid[:, None, None, :], s, NEG_INF)
    # idle rows (length 0) are fully masked: force a uniform softmax and
    # zero the output to match the kernel
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bkgs,bskd->bkgd", p.astype(v.dtype), v)
    out = jnp.where((lengths > 0)[:, None, None, None], out, 0)
    return out.astype(q.dtype)
