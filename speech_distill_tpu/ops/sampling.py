"""Sampling ops for autoregressive decode, all jittable.

Reproduces the reference's HF-generate sampling stack
(soulxpodcast/engine/llm_engine.py:44-70 + sampler.py:139-176):

  processors, in order: min-new-tokens EOS suppression, repetition penalty
  over *generated* tokens only (prompt excluded, vLLM-consistent), then
  temperature, top-k, top-p warpers; multinomial sampling; and VALL-E 2
  Repetition-Aware Sampling — if the candidate token appeared >= win*tau
  times in the last `win` tokens, resample from the RAW (pre-processor)
  distribution.

State the torch version derives from growing tensors (token history,
penalty sets) is carried as fixed-shape buffers: a [B, V] presence mask
updated incrementally and a ring view of the last `win` tokens.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _is_scalar(x) -> bool:
    """Static (Python) sampling parameter vs a per-row [B] array (the
    multi-tenant serving path: every request carries its own params)."""
    return isinstance(x, (int, float))


def _rows(x) -> jax.Array:
    """Broadcastable [B, 1] view of a per-row parameter."""
    return jnp.reshape(jnp.asarray(x, jnp.float32), (-1, 1))


def apply_repetition_penalty(logits: jax.Array, presence: jax.Array,
                             penalty) -> jax.Array:
    """HF RepetitionPenaltyLogitsProcessor: where a token is present in the
    penalized set: score>0 ? score/p : score*p. ``penalty`` may be a
    Python float or a per-row [B] array."""
    if _is_scalar(penalty):
        if penalty == 1.0:
            return logits
        pen = penalty
    else:
        pen = _rows(penalty)
    penalized = jnp.where(logits > 0, logits / pen, logits * pen)
    return jnp.where(presence.astype(bool), penalized, logits)


def suppress_eos_before_min(logits: jax.Array, eos_ids, num_generated,
                            min_tokens) -> jax.Array:
    """MinNewTokensLengthLogitsProcessor: EOS gets -inf until min_tokens
    (int, or per-row [B] int32)."""
    if _is_scalar(min_tokens) and min_tokens <= 0:
        return logits
    active = jnp.reshape(num_generated, (-1,)) < jnp.reshape(
        jnp.asarray(min_tokens), (-1,))                      # [B]
    out = logits
    for eos in eos_ids:
        out = out.at[..., eos].set(
            jnp.where(active, NEG_INF, out[..., eos]))
    return out


def top_k_filter(logits: jax.Array, k: int) -> jax.Array:
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jnp.sort(logits, axis=-1)[..., -k][..., None]
    return jnp.where(logits < kth, NEG_INF, logits)


def top_p_filter(logits: jax.Array, p) -> jax.Array:
    """HF TopPLogitsWarper: keep the smallest set whose cumulative prob > p
    (the first token crossing p is kept). ``p``: float or per-row [B]."""
    if _is_scalar(p):
        if p >= 1.0:
            return logits
    else:
        p = _rows(p)
    sorted_logits = jnp.sort(logits, axis=-1)            # ascending
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    # HF removes tokens with cumulative prob (from the top) > p, keeping the
    # crossing token: in ascending order, remove where cum <= 1 - p.
    sorted_remove = cum <= (1.0 - p)
    # map back: a logit is removed if it's below the smallest kept logit
    n_removed = jnp.sum(sorted_remove, axis=-1, keepdims=True)
    threshold = jnp.take_along_axis(sorted_logits, n_removed, axis=-1)
    return jnp.where(logits < threshold, NEG_INF, logits)


def process_logits(raw: jax.Array, presence: jax.Array, num_generated,
                   *, temperature, top_k: int, top_p,
                   repetition_penalty, min_tokens,
                   eos_ids) -> jax.Array:
    """Full processor chain (HF order) raw fp32 logits -> warped scores."""
    x = suppress_eos_before_min(raw, eos_ids, num_generated, min_tokens)
    x = apply_repetition_penalty(x, presence, repetition_penalty)
    if not _is_scalar(temperature):
        x = x / _rows(temperature)
    elif temperature != 1.0:
        x = x / temperature
    x = top_k_filter(x, top_k)
    x = top_p_filter(x, top_p)
    return x


def sample_token_topk(rng: jax.Array, raw: jax.Array, presence: jax.Array,
                      num_generated: jax.Array, recent_ids: jax.Array,
                      recent_valid: jax.Array, *, temperature,
                      top_k: int, top_p, repetition_penalty,
                      min_tokens, eos_ids, use_ras: bool,
                      win_size: int, tau_r: float,
                      topk_method: str = "exact",
                      return_logprob: bool = False):
    """Fused decode-step sampler for top_k > 0.

    ``temperature`` / ``top_p`` / ``repetition_penalty`` / ``min_tokens``
    may each be a Python scalar (one compile-time constant for the whole
    batch) or a per-row [B] array (per-request sampling params, the
    multi-tenant serving path).

    Equivalent to process_logits + ras_sample but O(V + k log k) per step
    instead of two full-vocab sorts: the top-k candidates are extracted
    once with ``lax.top_k``; temperature/top-p warping, candidate sampling,
    and the RAS window check all happen in k-space. The RAS fallback
    resamples from the raw full-vocab distribution (sampler.py:142-148).

    ``return_logprob``: also return the emitted token's log-probability
    under the sampler's *closed-form output distribution*
    p(x) = proc(x)·[not rep(x)] + P_rep·softmax(raw)(x)
    (the same target infer/speculative.target_probs materializes — the
    true per-step emission distribution, RAS mixture included; with
    use_ras=False it reduces to the processed distribution, which is what
    vLLM reports as ``SamplingParams.logprobs``). Adds one full-vocab
    logsumexp over ``raw`` only when use_ras is on.
    """
    x = suppress_eos_before_min(raw, eos_ids, num_generated, min_tokens)
    x = apply_repetition_penalty(x, presence, repetition_penalty)
    if topk_method == "approx":
        vals, idx = jax.lax.approx_max_k(x, top_k, recall_target=0.95)
    else:
        # bit-identical to lax.top_k (incl. tie order) at ~1/15th the sort
        # work — the decode sampler runs this every step over [B, 159k]
        from speech_distill_tpu.distill.losses import segmented_top_k
        vals, idx = segmented_top_k(x, top_k)      # [B, k] descending
    if not _is_scalar(temperature):
        vals = vals / _rows(temperature)
    elif temperature != 1.0:
        vals = vals / temperature
    if not _is_scalar(top_p) or top_p < 1.0:
        # descending order: remove tokens once cumulative prob (shifted by
        # one, so the crossing token survives) exceeds p — identical set to
        # HF TopPLogitsWarper.
        probs = jax.nn.softmax(vals, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        tp = top_p if _is_scalar(top_p) else _rows(top_p)
        keep = (cum - probs) < tp
        vals = jnp.where(keep, vals, NEG_INF)

    k1, k2 = jax.random.split(rng)
    choice = jax.random.categorical(k1, vals, axis=-1)          # [B] in k
    candidate = jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0]
    rows = jnp.arange(raw.shape[0])

    if not use_ras:
        tok = candidate.astype(jnp.int32)
        none_raw = jnp.zeros(candidate.shape, bool)
        if not return_logprob:
            return tok, none_raw
        logp = (vals[rows, choice]
                - jax.nn.logsumexp(vals, axis=-1)).astype(jnp.float32)
        return tok, none_raw, logp
    matches = (recent_ids == candidate[:, None]) & recent_valid.astype(bool)
    rep_num = jnp.sum(matches, axis=-1) + 1
    use_raw = rep_num >= (win_size * tau_r)
    resampled = jax.random.categorical(k2, raw, axis=-1)
    token = jnp.where(use_raw, resampled, candidate).astype(jnp.int32)
    if not return_logprob:
        return token, use_raw
    # closed-form mixture at the emitted token (k-space): every candidate's
    # RAS predicate, its processed mass masked by it, plus the raw tail
    probs = jax.nn.softmax(vals, axis=-1)                       # [B, k]
    m_all = jnp.sum((recent_ids[:, None, :] == idx[:, :, None])
                    & recent_valid[:, None, :].astype(bool), axis=-1)
    rep_all = (m_all + 1) >= (win_size * tau_r)                 # [B, k]
    p_rep = jnp.sum(jnp.where(rep_all, probs, 0.0), axis=-1)    # [B]
    proc_t = jnp.sum(jnp.where((idx == token[:, None]) & ~rep_all,
                               probs, 0.0), axis=-1)            # [B]
    raw_lp = (raw[rows, token]
              - jax.nn.logsumexp(raw, axis=-1)).astype(jnp.float32)
    # log-space mixture: log(proc_t + p_rep * exp(raw_lp)); log(0) = -inf
    # is exact under logaddexp, so tiny probabilities keep their true
    # logprob instead of a clamp constant.
    logp = jnp.logaddexp(jnp.log(proc_t),
                         jnp.log(p_rep) + raw_lp).astype(jnp.float32)
    return token, use_raw, logp


class RasResult(NamedTuple):
    token: jax.Array       # [B] int32
    used_raw: jax.Array    # [B] bool — RAS fallback triggered
    logprob: Optional[jax.Array] = None  # [B] f32 — emitted-token logprob
    #                        under the closed-form output distribution
    #                        (only when requested via return_logprob)


def ras_sample(rng: jax.Array, raw: jax.Array, processed: jax.Array,
               recent_ids: jax.Array, recent_valid: jax.Array,
               *, use_ras: bool, win_size: int, tau_r: float,
               return_logprob: bool = False) -> RasResult:
    """Sample with Repetition-Aware Sampling (sampler.py:142-148).

    raw/processed: [B, V] fp32; recent_ids: [B, win] last tokens of the
    sequence (prompt included, like input_ids[:, -win:]), recent_valid
    marks real positions. ``return_logprob``: see sample_token_topk —
    same closed-form mixture, computed in full-vocab space here.
    """
    B, V = raw.shape
    rows = jnp.arange(B)
    k1, k2 = jax.random.split(rng)
    candidate = jax.random.categorical(k1, processed, axis=-1)
    if not use_ras:
        tok = candidate.astype(jnp.int32)
        logp = None
        if return_logprob:
            logp = (processed[rows, tok] - jax.nn.logsumexp(
                processed, axis=-1)).astype(jnp.float32)
        return RasResult(tok, jnp.zeros(candidate.shape, bool), logp)
    matches = (recent_ids == candidate[:, None]) & recent_valid.astype(bool)
    rep_num = jnp.sum(matches, axis=-1) + 1
    use_raw = rep_num >= (win_size * tau_r)
    resampled = jax.random.categorical(k2, raw, axis=-1)
    token = jnp.where(use_raw, resampled, candidate).astype(jnp.int32)
    if not return_logprob:
        return RasResult(token, use_raw)
    # RAS predicate for every vocab id: occurrence count in the recent
    # window via one scatter-add over the (small) window. NOTE: this
    # materializes [B, V] i32 (~40 MB at B=64, V=159k) per step — fine for
    # the engine defaults (top_k>0 routes to the k-space path above); if
    # the full-vocab path is ever used at batch scale with logprobs,
    # replace with a windowed count at the emitted token + a gather of
    # proc_p at the <=win recent ids.
    counts = jnp.zeros((B, V), jnp.int32).at[
        rows[:, None], recent_ids].add(recent_valid.astype(jnp.int32))
    rep_full = (counts + 1) >= (win_size * tau_r)               # [B, V]
    proc_p = jax.nn.softmax(processed, axis=-1)
    p_rep = jnp.sum(jnp.where(rep_full, proc_p, 0.0), axis=-1)
    proc_t = jnp.where(rep_full[rows, token], 0.0, proc_p[rows, token])
    raw_lp = (raw[rows, token]
              - jax.nn.logsumexp(raw, axis=-1)).astype(jnp.float32)
    logp = jnp.logaddexp(jnp.log(proc_t),
                         jnp.log(p_rep) + raw_lp).astype(jnp.float32)
    return RasResult(token, use_raw, logp)
