"""Fused lm-head + distillation losses over a chunked vocabulary.

The TPU equivalent of Liger's fused-linear-cross-entropy
(reference stage1.py:315) and the dominant-cost fix for the sparse KD path
(SURVEY §7: "the student log_softmax at distillation_loss.py:98 over full
vocab dominates"): instead of materializing student logits [N, 159488] in
fp32 (and letting autodiff save softmax residuals of the same size), the
vocab dim is processed in chunks by a ``lax.scan`` whose body is
``jax.checkpoint``-ed — backward recomputes each chunk's logits from
(hidden, W_chunk). Peak memory drops from O(N*V) to O(N*C + N*K).

All statistics a KD loss needs are accumulated online:
  * logsumexp at temperatures 1 and T (running max/sum)
  * the logit at the gold label
  * logits gathered at the teacher's top-K indices

and the losses are assembled exactly like distill/losses.py (masked means,
reference semantics from distillation_loss.py:6-128).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from speech_distill_tpu.distill.losses import (DistillLossOutput,
                                               IGNORE_INDEX, _masked_mean,
                                               _shift_and_mask,
                                               segmented_top_k)


class _RowStats(NamedTuple):
    lse1: jax.Array         # [N] logsumexp at temperature 1
    lseT: jax.Array         # [N] logsumexp at temperature T
    label_logit: jax.Array  # [N]
    topk_logit: jax.Array   # [N, K]


def _collect_lse(hidden: jax.Array, lm_w: jax.Array, temperature: float,
                 chunk_size: int) -> Tuple[jax.Array, jax.Array]:
    """Online logsumexp of hidden @ lm_w.T at temperatures 1 and T, via a
    checkpointed ``lax.scan`` over vocab chunks. No per-chunk gathers —
    those lower to one-hot contractions on TPU and dominated the old
    fused path's cost; the gathered logits are computed separately from
    W-row gathers (pallas_lm_loss.gathered_logits)."""
    N, D = hidden.shape
    V = lm_w.shape[0]
    pad_v = (V + chunk_size - 1) // chunk_size * chunk_size
    n_chunks = pad_v // chunk_size
    w = lm_w if pad_v == V else jnp.pad(lm_w, ((0, pad_v - V), (0, 0)))
    w_chunks = w.reshape(n_chunks, chunk_size, D)
    offsets = jnp.arange(n_chunks) * chunk_size
    # padded vocab rows get a -inf additive mask so they never contribute
    col_masks = jnp.where(
        (offsets[:, None] + jnp.arange(chunk_size)[None, :]) < V,
        0.0, -1e30).astype(jnp.float32)

    def update(carry, wo):
        m1, s1, mT, sT = carry
        w_chunk, col_mask = wo
        logits = (hidden @ w_chunk.T).astype(jnp.float32) + col_mask[None, :]

        def online(m, s, x):
            cm = jnp.max(x, axis=1)
            new_m = jnp.maximum(m, cm)
            s = s * jnp.exp(m - new_m) + jnp.sum(
                jnp.exp(x - new_m[:, None]), axis=1)
            return new_m, s

        m1, s1 = online(m1, s1, logits)
        mT, sT = online(mT, sT, logits / temperature)
        return (m1, s1, mT, sT), None

    neg = jnp.float32(-1e30)
    init = (jnp.full((N,), neg), jnp.zeros((N,)),
            jnp.full((N,), neg), jnp.zeros((N,)))
    body = jax.checkpoint(update)
    (m1, s1, mT, sT), _ = jax.lax.scan(body, init, (w_chunks, col_masks))
    lse1 = m1 + jnp.log(jnp.maximum(s1, 1e-30))
    lseT = mT + jnp.log(jnp.maximum(sT, 1e-30))
    return lse1, lseT


def _collect_stats(hidden: jax.Array, lm_w: jax.Array, labels: jax.Array,
                   topk_i: jax.Array, temperature: float,
                   chunk_size: int) -> _RowStats:
    from speech_distill_tpu.ops.pallas_lm_loss import gathered_logits
    lse1, lseT = _collect_lse(hidden, lm_w, temperature, chunk_size)
    label_logit = gathered_logits(hidden, lm_w, labels[:, None])[:, 0]
    topk_logit = gathered_logits(hidden, lm_w, topk_i)
    return _RowStats(lse1, lseT, label_logit, topk_logit)


def fused_sparse_kd_loss(hidden: jax.Array, lm_w: jax.Array,
                         labels: jax.Array,
                         teacher_top_k_v: jax.Array,
                         teacher_top_k_i: jax.Array,
                         speech_token_mask: Optional[jax.Array] = None,
                         temperature: float = 2.0, alpha: float = 0.5,
                         chunk_size: int = 8192,
                         backend: str = "xla",
                         interpret: bool = False) -> DistillLossOutput:
    """Sparse top-K KD loss directly from hidden states + unembedding.

    hidden [B, T, D] (pre-shift), lm_w [V, D]; semantics identical to
    distill.losses.sparse_distill_loss(unembed(hidden), ...).

    backend='xla': checkpointed lax.scan over vocab chunks.
    backend='pallas': fused matmul+logsumexp kernel (ops/pallas_lm_loss) —
    the logits tile never leaves VMEM; top-K gathers via rematerialized
    W-row einsum.
    """
    T = temperature
    B, S, D = hidden.shape
    h = hidden[:, :-1, :].reshape(-1, D)
    shift_labels, valid = _shift_and_mask(labels, speech_token_mask)
    labels_flat = jnp.maximum(shift_labels.reshape(-1), 0)
    idx = teacher_top_k_i[:, :-1, :].astype(jnp.int32)
    K = idx.shape[-1]
    idx_flat = idx.reshape(-1, K)

    if backend == "pallas":
        from speech_distill_tpu.ops.pallas_lm_loss import (gathered_logits,
                                                           lm_head_stats)
        lse1, lseT, label_logit = lm_head_stats(
            h, lm_w, labels_flat, T, 1024, 1024, interpret)
        topk_logit = gathered_logits(h, lm_w, idx_flat)
        stats = _RowStats(lse1, lseT, label_logit, topk_logit)
    else:
        stats = _collect_stats(h, lm_w, labels_flat, idx_flat, T, chunk_size)
        lse1, lseT = stats.lse1, stats.lseT

    valid_flat = valid.reshape(-1)
    ce = lse1 - stats.label_logit
    task = _masked_mean(ce, valid_flat)

    v = jax.lax.stop_gradient(
        teacher_top_k_v[:, :-1, :].astype(jnp.float32)).reshape(-1, K)
    log_p = jax.nn.log_softmax(v / T, axis=-1)
    p = jnp.exp(log_p)
    log_q = stats.topk_logit / T - lseT[:, None]
    kl = jnp.sum(p * (log_p - log_q), axis=-1)
    distill = _masked_mean(kl, valid_flat) * (T * T)

    hits = (idx_flat == labels_flat[:, None]).astype(jnp.float32) \
        * valid_flat[:, None] \
        * (shift_labels.reshape(-1) != IGNORE_INDEX)[:, None]
    n_hits = jnp.sum(hits)
    teacher = jnp.where(n_hits > 0,
                        -jnp.sum(v * hits) / jnp.maximum(n_hits, 1.0), 0.0)

    total = alpha * task + (1.0 - alpha) * distill
    return DistillLossOutput(total, task, distill, teacher)


def fused_topk_lse(h: jax.Array, lm_w: jax.Array, k: int,
                   vocab_limit: Optional[int] = None,
                   chunk_size: int = 16384,
                   bias: Optional[jax.Array] = None
                   ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Raw top-K logits + logsumexp of ``h @ lm_w.T (+ bias)``, computed by
    a ``lax.scan`` over vocab chunks — the [N, V] logits matrix is never
    materialized, only one [N, chunk] tile at a time.

    h [N, D], lm_w [V, D], bias [V] optional.
    Returns (top values fp32 [N, k] raw logits, indices int32 [N, k],
    lse fp32 [N]). Exact (every global top-k element is top-k in its chunk).
    """
    N, D = h.shape
    w = lm_w[:vocab_limit] if vocab_limit is not None else lm_w
    V = w.shape[0]
    if bias is not None:
        bias = bias[:V].astype(jnp.float32)
    pad_v = (V + chunk_size - 1) // chunk_size * chunk_size
    n_chunks = pad_v // chunk_size
    if pad_v != V:
        w = jnp.pad(w, ((0, pad_v - V), (0, 0)))
        if bias is not None:
            bias = jnp.pad(bias, (0, pad_v - V))
    w_chunks = w.reshape(n_chunks, chunk_size, D)
    offsets = jnp.arange(n_chunks, dtype=jnp.int32) * chunk_size
    col_masks = jnp.where(
        (offsets[:, None] + jnp.arange(chunk_size)[None, :]) < V,
        0.0, -jnp.inf).astype(jnp.float32)
    if bias is not None:
        col_masks = col_masks + bias.reshape(n_chunks, chunk_size)

    neg = jnp.float32(-1e30)
    init = (jnp.full((N,), neg), jnp.zeros((N,), jnp.float32),
            jnp.full((N, k), neg), jnp.zeros((N, k), jnp.int32))

    def body(carry, wo):
        m, s, tv, ti = carry
        w_c, off, cmask = wo
        logits = jax.lax.dot_general(
            h, w_c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + cmask[None, :]
        cm = jnp.max(logits, axis=1)
        new_m = jnp.maximum(m, cm)
        s = s * jnp.exp(m - new_m) + jnp.sum(
            jnp.exp(logits - new_m[:, None]), axis=1)
        cv, ci = segmented_top_k(logits, k)
        cand_v = jnp.concatenate([tv, cv], axis=1)
        cand_i = jnp.concatenate([ti, ci.astype(jnp.int32) + off], axis=1)
        tv, sel = jax.lax.top_k(cand_v, k)
        ti = jnp.take_along_axis(cand_i, sel, axis=1)
        return (new_m, s, tv, ti), None

    (m, s, tv, ti), _ = jax.lax.scan(body, init, (w_chunks, offsets,
                                                  col_masks))
    lse = m + jnp.log(jnp.maximum(s, 1e-30))
    return tv, ti, lse


def fused_extract_top_k(hidden: jax.Array, lm_w: jax.Array, k: int,
                        vocab_limit: Optional[int] = None,
                        chunk_size: int = 16384
                        ) -> Tuple[jax.Array, jax.Array]:
    """Teacher top-K logprob extraction fused with the lm-head matmul.

    Online-KD equivalent of reference train.py:74-94, computed without ever
    materializing the [B, T, 159488] fp32 teacher logits (~2.6 GB at
    bs8/seq512 — all of it HBM write+read traffic the TPU can skip).

    hidden [B, T, D] (teacher final hidden states), lm_w [V, D].
    Returns (values fp16 logprobs, indices int32), both [B, T, K] — exact
    same set as ``extract_top_k(unembed(hidden), k, method='exact')``.
    No gradients flow (teacher is frozen), so the scan is not checkpointed.
    """
    B, S, D = hidden.shape
    tv, ti, lse = fused_topk_lse(hidden.reshape(-1, D), lm_w, k,
                                 vocab_limit, chunk_size)
    v = (tv - lse[:, None]).astype(jnp.float16).reshape(B, S, k)
    return v, ti.reshape(B, S, k)


def fused_cross_entropy(hidden: jax.Array, lm_w: jax.Array,
                        labels: jax.Array, chunk_size: int = 8192
                        ) -> jax.Array:
    """Masked-mean next-token CE from hidden states (Liger FLCE equivalent,
    for stage-1 SFT). hidden [B, T, D], labels [B, T]."""
    B, S, D = hidden.shape
    h = hidden[:, :-1, :].reshape(-1, D)
    shift_labels = labels[:, 1:].reshape(-1)
    valid = (shift_labels != IGNORE_INDEX).astype(jnp.float32)
    dummy_k = jnp.zeros((h.shape[0], 1), jnp.int32)
    stats = _collect_stats(h, lm_w, jnp.maximum(shift_labels, 0), dummy_k,
                           1.0, chunk_size)
    ce = stats.lse1 - stats.label_logit
    return _masked_mean(ce, valid)


# ---------------------------------------------------------------------------
# Materialized head + sparse KD loss with an analytic one-pass backward
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _head_kd_core(h, w, v, idx, shift_labels, valid, T, alpha):
    total, task, distill, teacher = _head_kd_fwd(
        h, w, v, idx, shift_labels, valid, T, alpha)[0]
    return total, task, distill, teacher


def _head_kd_fwd(h, w, v, idx, shift_labels, valid, T, alpha):
    """h [N, D], w [V, D], v fp32 [N, K] teacher logprobs, idx int32 [N, K],
    shift_labels int32 [N] (may be IGNORE_INDEX), valid fp32 [N]."""
    s = jax.lax.dot_general(h, w, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)

    log_p = jax.nn.log_softmax(v / T, axis=-1)
    p = jnp.exp(log_p)
    lse1 = jax.nn.logsumexp(s, axis=-1)
    lseT = jax.nn.logsumexp(s / T, axis=-1)
    safe = jnp.maximum(shift_labels, 0)
    gold = jnp.take_along_axis(s, safe[:, None], axis=-1)[:, 0]
    topk = jnp.take_along_axis(s, idx, axis=-1)

    n = jnp.sum(valid)
    inv_n = jnp.where(n > 0, 1.0 / jnp.maximum(n, 1.0), 0.0)
    task = jnp.sum((lse1 - gold) * valid) * inv_n
    log_q = topk / T - lseT[:, None]
    distill = jnp.sum(jnp.sum(p * (log_p - log_q), axis=-1) * valid) \
        * inv_n * (T * T)

    hits = (idx == shift_labels[:, None]).astype(jnp.float32) \
        * valid[:, None]
    n_hits = jnp.sum(hits)
    teacher = jnp.where(n_hits > 0,
                        -jnp.sum(v * hits) / jnp.maximum(n_hits, 1.0), 0.0)

    total = alpha * task + (1.0 - alpha) * distill
    # residuals: logits saved in bf16 (halves the dominant residual vs
    # autodiff's fp32 softmax saves); lse/p/gathers are [N]-sized
    return (total, task, distill, teacher), \
        (h, w, s.astype(jnp.bfloat16), lse1, lseT, p, idx, shift_labels,
         valid, inv_n, v.shape)


def _head_kd_bwd(T, alpha, res, gs):
    """Analytic d_logits, ONE fused elementwise pass + K-sparse scatters:

      d task   /ds_j = inv_n * valid * (softmax(s)_j - 1[j = label])
      d distill/ds_j = inv_n * valid * T * (softmax(s/T)_j - scatter(p)_j)

    Autodiff of the same math walks the fp32 [N, 159k] logits several
    times (two logsumexp backwards, gather backwards) and materializes
    d_logits in fp32; here d is built in bf16 directly from the bf16
    residual logits and the two head transpose matmuls run at bf16 MXU
    rate. Errors vs exact autodiff are bf16-rounding sized (~0.4% per
    element, unbiased) — standard mixed-precision territory.
    """
    import numpy as np
    h, w, sb, lse1, lseT, p, idx, shift_labels, valid, inv_n, vshape = res
    g_total, g_task, g_distill, _ = gs
    a_task = (g_total * alpha + g_task) * inv_n
    a_dist = (g_total * (1.0 - alpha) + g_distill) * inv_n * T

    c_task = (a_task * valid)[:, None]                    # [N, 1] fp32
    c_dist = (a_dist * valid)[:, None]
    s32 = sb.astype(jnp.float32)
    d = (c_task * jnp.exp(s32 - lse1[:, None])
         + c_dist * jnp.exp(s32 / T - lseT[:, None])).astype(jnp.bfloat16)

    rows = jnp.arange(d.shape[0])
    d = d.at[rows[:, None], idx].add((-c_dist * p).astype(jnp.bfloat16))
    safe = jnp.maximum(shift_labels, 0)
    d = d.at[rows, safe].add((-c_task[:, 0]).astype(jnp.bfloat16))

    dh = jax.lax.dot_general(
        d, w.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(h.dtype)
    dw = jax.lax.dot_general(
        d, h.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(w.dtype)

    f0 = jax.dtypes.float0
    return (dh, dw, jnp.zeros(vshape, jnp.float32),
            np.zeros(idx.shape, f0), np.zeros(shift_labels.shape, f0),
            jnp.zeros_like(valid))


_head_kd_core.defvjp(_head_kd_fwd, _head_kd_bwd)


def head_sparse_kd_loss(hidden: jax.Array, lm_w: jax.Array,
                        labels: jax.Array,
                        teacher_top_k_v: jax.Array,
                        teacher_top_k_i: jax.Array,
                        speech_token_mask: Optional[jax.Array] = None,
                        temperature: float = 2.0,
                        alpha: float = 0.5) -> DistillLossOutput:
    """lm-head matmul + sparse top-K KD loss as ONE op with a hand-written
    backward (see ``_head_kd_bwd``). Forward values are bit-identical to
    ``losses.sparse_distill_loss(unembed(hidden), ...)`` (same fp32 math);
    the backward never materializes fp32 d_logits and saves the logits
    residual in bf16. Default head loss for KD training steps.

    hidden [B, T, D] (pre-shift), lm_w [V, D].
    """
    B, S, D = hidden.shape
    h = hidden[:, :-1, :].reshape(-1, D)
    shift_labels, valid = _shift_and_mask(labels, speech_token_mask)
    K = teacher_top_k_i.shape[-1]
    v = jax.lax.stop_gradient(
        teacher_top_k_v[:, :-1, :].astype(jnp.float32)).reshape(-1, K)
    idx = teacher_top_k_i[:, :-1, :].astype(jnp.int32).reshape(-1, K)
    total, task, distill, teacher = _head_kd_core(
        h, lm_w, v, idx, shift_labels.reshape(-1), valid.reshape(-1),
        float(temperature), float(alpha))
    return DistillLossOutput(total, task, distill, teacher)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _head_dense_core(h, w, t, shift_labels, valid, T, alpha):
    return _head_dense_fwd(h, w, t, shift_labels, valid, T, alpha)[0]


def _head_dense_fwd(h, w, t, shift_labels, valid, T, alpha):
    """h [N, D], w [V, D], t fp32 [N, V] teacher logits (stop-grad),
    shift_labels int32 [N], valid fp32 [N]."""
    s = jax.lax.dot_general(h, w, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    lse1_s = jax.nn.logsumexp(s, axis=-1)
    lseT_s = jax.nn.logsumexp(s / T, axis=-1)
    lse1_t = jax.nn.logsumexp(t, axis=-1)
    lseT_t = jax.nn.logsumexp(t / T, axis=-1)

    log_p = t / T - lseT_t[:, None]
    p = jnp.exp(log_p)
    log_q = s / T - lseT_s[:, None]
    kl = jnp.sum(p * (log_p - log_q), axis=-1)

    safe = jnp.maximum(shift_labels, 0)
    gold_s = jnp.take_along_axis(s, safe[:, None], axis=-1)[:, 0]
    gold_t = jnp.take_along_axis(t, safe[:, None], axis=-1)[:, 0]

    n = jnp.sum(valid)
    inv_n = jnp.where(n > 0, 1.0 / jnp.maximum(n, 1.0), 0.0)
    task = jnp.sum((lse1_s - gold_s) * valid) * inv_n
    distill = jnp.sum(kl * valid) * inv_n * (T * T)
    teacher = jnp.sum((lse1_t - gold_t) * valid) * inv_n
    total = alpha * task + (1.0 - alpha) * distill
    return (total, task, distill, teacher), \
        (h, w, s.astype(jnp.bfloat16), t.astype(jnp.bfloat16), lse1_s,
         lseT_s, lseT_t, shift_labels, valid, inv_n)


def _head_dense_bwd(T, alpha, res, gs):
    """Analytic dense-KD d_logits in one fused elementwise pass:

      d task   /ds_j = inv_n * valid * (softmax(s)_j - 1[j = label])
      d distill/ds_j = inv_n * valid * T * (softmax(s/T)_j - softmax(t/T)_j)

    (sum_k p_k = 1 collapses the lseT backward to softmax(s/T)/T).
    Teacher is stop-gradient (reference train.py:60-69 no_grad)."""
    h, w, sb, tb, lse1_s, lseT_s, lseT_t, shift_labels, valid, inv_n = res
    g_total, g_task, g_distill, _ = gs
    a_task = (g_total * alpha + g_task) * inv_n
    a_dist = (g_total * (1.0 - alpha) + g_distill) * inv_n * T

    c_task = (a_task * valid)[:, None]
    c_dist = (a_dist * valid)[:, None]
    s32 = sb.astype(jnp.float32)
    t32 = tb.astype(jnp.float32)
    d = (c_task * jnp.exp(s32 - lse1_s[:, None])
         + c_dist * (jnp.exp(s32 / T - lseT_s[:, None])
                     - jnp.exp(t32 / T - lseT_t[:, None]))
         ).astype(jnp.bfloat16)
    rows = jnp.arange(d.shape[0])
    safe = jnp.maximum(shift_labels, 0)
    d = d.at[rows, safe].add((-c_task[:, 0]).astype(jnp.bfloat16))

    dh = jax.lax.dot_general(
        d, w.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(h.dtype)
    dw = jax.lax.dot_general(
        d, h.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(w.dtype)
    import numpy as np
    f0 = jax.dtypes.float0
    return (dh, dw, jnp.zeros(tb.shape, jnp.float32),
            np.zeros(shift_labels.shape, f0), jnp.zeros_like(valid))


_head_dense_core.defvjp(_head_dense_fwd, _head_dense_bwd)


def head_dense_kd_loss(hidden: jax.Array, lm_w: jax.Array,
                       teacher_logits: jax.Array,
                       labels: jax.Array,
                       speech_token_mask: Optional[jax.Array] = None,
                       temperature: float = 2.0,
                       alpha: float = 0.5) -> DistillLossOutput:
    """Dense (full-vocab) KD head loss as one custom-VJP op — the
    quantized-teacher / top_k<=0 mode (reference train.py:74-79 forces
    dense). Forward matches ``losses.dense_distill_loss(unembed(hidden),
    teacher_logits, ...)``; backward is one fused pass emitting bf16
    d_logits (see ``_head_dense_bwd``).

    hidden [B, T, D] (pre-shift), lm_w [V, D], teacher_logits [B, T, V]
    (already truncated to the student vocab).
    """
    B, S, D = hidden.shape
    h = hidden[:, :-1, :].reshape(-1, D)
    V = teacher_logits.shape[-1]
    t = jax.lax.stop_gradient(
        teacher_logits[:, :-1, :].astype(jnp.float32)).reshape(-1, V)
    shift_labels, valid = _shift_and_mask(labels, speech_token_mask)
    total, task, distill, teacher = _head_dense_core(
        h, lm_w, t, shift_labels.reshape(-1), valid.reshape(-1),
        float(temperature), float(alpha))
    return DistillLossOutput(total, task, distill, teacher)
