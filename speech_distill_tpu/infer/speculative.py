"""Speculative decoding for the single-stream decode loop.

The TTS decode hot loop (reference soulxpodcast/models/soulxpodcast.py:378,
up to 3000 speech tokens per turn) is loop-overhead-bound on TPU at B=1:
one while_loop iteration costs ~3 ms while its weight traffic floor is
~0.5 ms (CLAUDE.md decode anatomy), so producing >1 token per iteration is
the only big lever left. This module implements vLLM-style **prompt-lookup
(n-gram) speculative decoding** (the `speculative_config={"method":
"ngram"}` capability of the vLLM engine the reference leans on,
soulxpodcast/engine/llm_engine.py:78-114):

  * draft: the last n-gram of the sequence is matched against the whole
    token buffer (prompt + generated); the continuation of the most recent
    prior occurrence is proposed, extended periodically when the match is
    near the end. No draft model — speech-token streams (and TTS prompt
    audio transcripts) are highly repetitive, which is exactly the regime
    where prompt-lookup pays.
  * verify: ONE forward over [pending, d_0..d_{gamma-1}] (gamma+1 positions
    — at B=1 the matmuls are weight-bound, so this costs ~the same HBM
    traffic as a 1-token step) yields the raw logits at every drafted
    position.
  * accept: exact leftover rejection sampling (Leviathan et al.) against
    the *closed-form* target distribution of the production sampler
    (ops/sampling.sample_token_topk), RAS included:

        p(x) = proc(x) * [not rep(x)] + P_rep * softmax(raw)(x)

    where proc is the top-k/top-p/temperature-warped, repetition-penalized
    distribution, rep(x) the VALL-E2 RAS window predicate, and
    P_rep = sum_{c: rep(c)} proc(c). The draft is deterministic (q = delta
    at the drafted token), so a draft is accepted w.p. p(d) and on
    rejection the resample comes from p with d removed — the committed
    stream is distributed EXACTLY like non-speculative decoding.

Everything (draft, forward, verify, commit, KV rollback) runs inside one
``lax.while_loop`` under jit; rollback is a cache-length rewind (stale
K/V columns are masked by ``valid`` and overwritten by the next chunk).
B=1 only: rows would commit different token counts per iteration, which
the shared-column KV cache layout cannot express (batch serving uses the
paged engine instead).

**Layer-skip self-drafting (draft="layer_skip"): CLOSED NEGATIVE on this
hardware regime.** Measured on v5e (scripts/spec_anatomy.py, 0.6B/28L,
baseline 2.45-2.67 ms/step): a K-layer greedy draft step costs ~0.8 ms
(K=4), ~1.3 ms (K=7), ~2.7 ms (K=14) — the B=1 decode loop is
dispatch/loop-bound, so a draft step costs far more than K/28 of a full
step. Break-even acceptance: gamma=2 K=4 needs 1.82 committed
tokens/iter (~82% per-draft acceptance); gamma=2 K=14 needs 3.2 > the
theoretical max 3. Even a perfect draft cannot reach 1.5x at any
measured (K, gamma). With random-init weights acceptance is ~0 (partial
residual streams decorrelate from the final argmax over 159k classes —
a trained checkpoint would do better, but the cost side alone rules it
out here). The implementation is kept (exact, opt-in, useful on
hardware where B=1 steps are weight-bound and a K-layer step really
costs K/L) — do NOT re-benchmark on the axon relay.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from speech_distill_tpu.core.config import Qwen3Config, SamplingParams
from speech_distill_tpu.models import qwen3
from speech_distill_tpu.ops import sampling
from speech_distill_tpu.distill.losses import segmented_top_k

NEG_INF = sampling.NEG_INF


def ngram_draft(tokens: jax.Array, length: jax.Array, gamma: int,
                n_max: int = 3, n_min: int = 1) -> jax.Array:
    """Propose ``gamma`` draft tokens by prompt lookup.

    tokens: [L] int32 buffer, tokens[:length] real. The last n-gram
    (largest matching n in [n_min, n_max]) is searched over all earlier
    windows; the most recent match wins and its continuation is copied,
    wrapping periodically when it runs past ``length`` (repetitive
    speech-token streams extend their own period). Returns [gamma] int32
    (zeros when nothing matches — the verifier rejects them cheaply).
    """
    L = tokens.shape[0]
    best_found = jnp.zeros((), bool)
    best_start = jnp.zeros((), jnp.int32)
    for n in range(n_min, n_max + 1):      # ascending: larger n overwrites
        gpos = length - n + jnp.arange(n)
        g = tokens[jnp.maximum(gpos, 0)]
        M = L - n + 1
        eq = jnp.ones((M,), bool)
        for k in range(n):
            eq = jnp.logical_and(eq, tokens[k:k + M] == g[k])
        ii = jnp.arange(M, dtype=jnp.int32)
        # continuation must exist (i+n < length) and the gram be real
        ok = jnp.logical_and(eq, jnp.logical_and(ii + n < length,
                                                 length >= n))
        idx = jnp.max(jnp.where(ok, ii, -1))
        found = idx >= 0
        best_start = jnp.where(found, idx + n, best_start)
        best_found = jnp.logical_or(best_found, found)
    period = jnp.maximum(length - best_start, 1)
    pos = best_start + jnp.arange(gamma, dtype=jnp.int32) % period
    drafts = tokens[jnp.clip(pos, 0, L - 1)]
    return jnp.where(best_found, drafts, 0).astype(jnp.int32)


def _warp_topk(raw, presence, num_gen, recent, recent_valid, sp,
               eos_ids, win):
    """The production sampler's processed distribution, in k-space.

    Mirrors ops/sampling.sample_token_topk exactly: EOS suppression +
    repetition penalty on raw, exact top-k, temperature, top-p keep mask.
    Returns (vals [1,k] warped logits, idx [1,k], probs [1,k],
    rep [1,k] RAS predicate per candidate, P_rep [1]).
    """
    x = sampling.suppress_eos_before_min(raw, eos_ids, num_gen,
                                         sp.min_tokens)
    x = sampling.apply_repetition_penalty(x, presence,
                                          sp.repetition_penalty)
    vals, idx = segmented_top_k(x, sp.top_k)
    if sp.temperature != 1.0:
        vals = vals / sp.temperature
    if sp.top_p < 1.0:
        probs = jax.nn.softmax(vals, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = (cum - probs) < sp.top_p
        vals = jnp.where(keep, vals, NEG_INF)
    probs = jax.nn.softmax(vals, axis=-1)
    if sp.use_ras:
        matches = jnp.sum(
            (recent[:, None, :] == idx[:, :, None])
            & recent_valid[:, None, :].astype(bool), axis=-1)
        rep = (matches + 1) >= (win * sp.tau_r)
    else:
        rep = jnp.zeros_like(idx, bool)
    P_rep = jnp.sum(probs * rep, axis=-1)
    return vals, idx, probs, rep, P_rep


def target_probs(raw, presence, num_gen, recent, recent_valid,
                 sp: SamplingParams, eos_ids, win) -> jax.Array:
    """Full-vocab target distribution of sample_token_topk (test oracle).

    p(x) = proc(x)*[not rep(x)] + P_rep*softmax(raw)(x). Only used by
    tests (the decode loop never materializes it)."""
    V = raw.shape[-1]
    vals, idx, probs, rep, P_rep = _warp_topk(
        raw, presence, num_gen, recent, recent_valid, sp, eos_ids, win)
    proc_full = jnp.zeros((raw.shape[0], V), jnp.float32)
    proc_full = proc_full.at[jnp.arange(raw.shape[0])[:, None], idx].add(
        jnp.where(rep, 0.0, probs))
    raw_p = jax.nn.softmax(raw.astype(jnp.float32), axis=-1)
    return proc_full + P_rep[:, None] * raw_p


def make_spec_decode_fn(cfg: Qwen3Config, sp: SamplingParams, gamma: int,
                        ngram_max: int = 3, ngram_min: int = 1,
                        win_size: Optional[int] = None,
                        with_stats: bool = False,
                        draft: str = "ngram",
                        draft_layers: Optional[int] = None):
    """Build a jitted ``spec_decode(params, state, max_new) -> state``.

    Drop-in replacement for engine.make_decode_fn's decode at B=1: same
    DecodeState in/out invariants (all committed tokens cached,
    last_logits = distribution after the last token).

    ``with_stats``: return ``(state, iterations)`` instead — tokens
    committed per verify iteration = acceptance instrumentation
    (scripts/spec_anatomy.py).

    ``draft``:
      * ``"ngram"`` — prompt-lookup (free, but adversarial to RAS).
      * ``"layer_skip"`` — LayerSkip-style self-speculation: the draft is
        gamma sequential greedy steps through the FIRST ``draft_layers``
        of the same model + the real lm head (no new weights; early exit
        through the trained final norm). The draft writes its layer<K KV
        into the MAIN cache — those values are bit-identical to what the
        verify forward recomputes (same weights, same inputs), so no
        separate draft cache exists. Distribution-matched to the target
        (it sees the same context and penalties), so acceptance survives
        the RAS sampler that rejects n-gram drafts by construction.
    Both drafts are deterministic, so the exact delta-draft leftover
    rejection sampling below applies unchanged — committed streams are
    distributed exactly like non-speculative decoding regardless of how
    bad the draft is.
    """
    from speech_distill_tpu.infer.engine import DecodeState, \
        sample_next_token

    if sp.top_k <= 0:
        raise ValueError("speculative decode requires top_k > 0 "
                         "(the k-space verifier)")
    if draft not in ("ngram", "layer_skip"):
        raise ValueError(f"unknown draft method {draft!r}")
    if draft == "layer_skip":
        if not draft_layers or not (0 < draft_layers
                                    < cfg.num_hidden_layers):
            raise ValueError(
                f"layer_skip needs 0 < draft_layers < "
                f"{cfg.num_hidden_layers}, got {draft_layers}")
    win = win_size or sp.win_size
    eos_ids = tuple(sp.stop_token_ids)
    G = gamma

    def _is_eos(tok):
        hit = jnp.zeros(jnp.shape(tok), bool)
        for e in eos_ids:
            hit = jnp.logical_or(hit, tok == e)
        return hit

    def spec_decode_impl(params, st: DecodeState, max_new) -> DecodeState:
        max_len = st.tokens.shape[1]
        V = st.presence.shape[1]

        def body(s: DecodeState) -> DecodeState:
            Lb = s.length[0]                   # buffer len (incl pending)
            row = s.tokens[0]
            pending = row[Lb - 1]
            # RoPE positions count real tokens, not buffer slots (left-
            # padded states: pads are masked keys, not positions) — the
            # pending token sits at position (#real tokens) - 1
            real = jnp.sum(s.valid[0]).astype(jnp.int32)
            cols = jnp.arange(max_len)

            if draft == "ngram":
                drafts = ngram_draft(row, Lb, G, ngram_max,
                                     ngram_min)               # [G]
                cache_in = s.cache
            else:
                # layer-skip self-draft: G sequential greedy early-exit
                # steps. Step j feeds the previous token, writes its
                # layer<K KV at cache column Lb-1+j (the SAME values the
                # verify forward recomputes there), and proposes the
                # argmax of the penalty-warped K-layer logits (aligned
                # with the target's proc component; RAS resampling is
                # what the verifier prices in exactly).
                def dstep(carry, j):
                    tok, dc, pres = carry
                    am = jnp.logical_or(
                        s.valid[0],
                        jnp.logical_and(cols >= Lb, cols < Lb + j))
                    lg, dc = qwen3.forward(
                        params, tok[None, None], cfg,
                        attention_mask=am[None].astype(jnp.int32),
                        positions=(real - 1 + j)[None, None],
                        cache=dc, num_layers=draft_layers)
                    raw_d = lg[:, -1].astype(jnp.float32)     # [1, V]
                    xd = sampling.suppress_eos_before_min(
                        raw_d, eos_ids, s.num_generated[0] + j,
                        sp.min_tokens)
                    xd = sampling.apply_repetition_penalty(
                        xd, pres[None], sp.repetition_penalty)
                    nxt = jnp.argmax(xd[0]).astype(jnp.int32)
                    return (nxt, dc, pres.at[nxt].set(True)), nxt

                (_, dcache, _), drafts = jax.lax.scan(
                    dstep, (pending, s.cache, s.presence[0]),
                    jnp.arange(G, dtype=jnp.int32))
                # rewind the write pointer for the verify pass (the
                # draft's layer<K columns get overwritten bit-identically)
                cache_in = dcache._replace(length=s.cache.length)

            chunk = jnp.concatenate([pending[None], drafts])     # [G+1]
            # buffer with drafts speculatively visible (RAS windows only;
            # the real buffer is updated after verification)
            tview = row.at[Lb + jnp.arange(G)].set(drafts)
            amask = jnp.logical_or(
                s.valid[0], jnp.logical_and(cols >= Lb, cols < Lb + G))

            positions = real - 1 + jnp.arange(G + 1, dtype=jnp.int32)
            logits, cache = qwen3.forward(
                params, chunk[None, :], cfg,
                attention_mask=amask[None].astype(jnp.int32),
                positions=positions[None], cache=cache_in)
            raw_all = logits[0].astype(jnp.float32)              # [G+1, V]

            rng, k_u, k_c, k_p, k_r = jax.random.split(s.rng, 5)

            # all G+1 positions verified in ONE batched pass: only the
            # presence set is sequential across positions (each accepted
            # draft joins the penalty set), and that is G cheap one-hot
            # scatters — the expensive ops (top-k over V, logsumexp)
            # batch over positions instead of running G+1 times serially
            pres_rows = [s.presence[0]]
            for j in range(G):
                pres_rows.append(pres_rows[-1].at[drafts[j]].set(True))
            presence_all = jnp.stack(pres_rows)              # [G+1, V]
            num_gen_all = s.num_generated[0] + jnp.arange(G + 1)
            pos = (Lb + jnp.arange(G + 1)[:, None]) - win \
                + jnp.arange(win)[None, :]
            recent_all = tview[jnp.clip(pos, 0, max_len - 1)]
            recent_valid_all = pos >= 0
            vals_all, idx_all, probs_all, rep_all, prep_all = _warp_topk(
                raw_all, presence_all, num_gen_all, recent_all,
                recent_valid_all, sp, eos_ids, win)
            raw_lse_all = jax.nn.logsumexp(raw_all, axis=-1)  # [G+1]

            eqd = idx_all[:G] == drafts[:, None]              # [G, k]
            proc_d = jnp.sum(
                jnp.where(eqd & ~rep_all[:G], probs_all[:G], 0.0),
                axis=-1)
            raw_d = jnp.exp(raw_all[jnp.arange(G), drafts]
                            - raw_lse_all[:G])
            acc_p = proc_d + prep_all[:G] * raw_d             # [G]
            u = jax.random.uniform(k_u, (G,))
            acc = u < acc_p
            a0 = jnp.where(jnp.all(acc), G,
                           jnp.argmin(acc.astype(jnp.int32))
                           ).astype(jnp.int32)   # accepted draft count

            # resample (rejection leftover, a0 < G) / bonus (a0 == G):
            # p with the rejected draft removed is a two-component
            # mixture — pick the component by its leftover mass, then a
            # categorical within it
            vals_r = vals_all[a0]; idx_r = idx_all[a0]
            probs_r = probs_all[a0]; rep_r = rep_all[a0]
            P_rep_r = prep_all[a0]; raw_r = raw_all[a0]
            has_excl = a0 < G
            d_excl = jnp.where(has_excl, drafts[jnp.clip(a0, 0, G - 1)],
                               -1)
            excl = idx_r == d_excl
            proc_ok = jnp.logical_and(~rep_r, ~excl)
            W_proc = jnp.sum(jnp.where(proc_ok, probs_r, 0.0))
            raw_lse = raw_lse_all[a0]
            d_safe = jnp.maximum(d_excl, 0)
            raw_excl_p = jnp.where(has_excl,
                                   jnp.exp(raw_r[d_safe] - raw_lse), 0.0)
            W_raw = P_rep_r * (1.0 - raw_excl_p)
            p_proc = W_proc / jnp.maximum(W_proc + W_raw, 1e-30)
            use_proc = jax.random.uniform(k_c, ()) < p_proc
            proc_tok = idx_r[jax.random.categorical(
                k_p, jnp.where(proc_ok, vals_r, NEG_INF))]
            raw_masked = raw_r.at[d_safe].set(
                jnp.where(has_excl, NEG_INF, raw_r[d_safe]))
            raw_tok = jax.random.categorical(k_r, raw_masked)
            t = jnp.where(use_proc, proc_tok, raw_tok).astype(jnp.int32)

            # commit: a0 kept drafts + the fresh token t, clamped to the
            # remaining budget, truncated at the first EOS
            allowed = max_new - s.num_generated[0]
            total = jnp.minimum(a0 + 1, allowed)
            keep_d = jnp.minimum(a0, total)
            pend = total - keep_d                                # 0 or 1
            eos_d = _is_eos(drafts)
            eos_kept = jnp.logical_and(eos_d, jnp.arange(G) < keep_d)
            any_eos = jnp.any(eos_kept)
            e = jnp.argmax(eos_kept).astype(jnp.int32)
            keep_d = jnp.where(any_eos, e + 1, keep_d)
            pend = jnp.where(any_eos, 0, pend)
            t_eos = jnp.logical_and(pend == 1, _is_eos(t))
            finished = jnp.logical_or(
                s.finished, jnp.logical_or(any_eos, t_eos))

            n_c = keep_d + pend
            q = jnp.arange(G + 1)
            cvals = jnp.where(q < keep_d,
                              jnp.concatenate([drafts, drafts[-1:]]), t)
            idxs = Lb + q                      # <= Lb+G <= max_len-1 (cond)
            maskq = q < n_c
            tokens = s.tokens.at[0, idxs].set(
                jnp.where(maskq, cvals, row[idxs]))
            valid = s.valid.at[0, idxs].set(
                jnp.logical_or(maskq, s.valid[0][idxs]))
            # scatter-OR via int add (scatter .set with duplicate indices
            # picks an arbitrary dup — add is deterministic)
            hits = jnp.zeros((V,), jnp.int32).at[cvals].add(
                maskq.astype(jnp.int32))
            presence = jnp.logical_or(s.presence, (hits > 0)[None])

            cache = cache._replace(length=(Lb + keep_d).astype(jnp.int32))
            return s._replace(
                tokens=tokens,
                length=jnp.full_like(s.length, Lb + n_c),
                valid=valid, cache=cache, presence=presence,
                num_generated=s.num_generated + n_c,
                finished=finished, rng=rng)

        def cond(s: DecodeState):
            return jnp.logical_and(
                jnp.logical_and(~s.finished[0],
                                s.num_generated[0] < max_new),
                s.length[0] + G + 1 <= max_len)

        def init(s: DecodeState) -> DecodeState:
            tok, rng = sample_next_token(sp, s, win, eos_ids)
            Lb = s.length[0]
            return s._replace(
                tokens=s.tokens.at[0, Lb].set(tok[0]),
                length=s.length + 1,
                valid=s.valid.at[0, Lb].set(True),
                presence=s.presence.at[0, tok[0]].set(True),
                num_generated=s.num_generated + 1,
                finished=jnp.logical_or(s.finished, _is_eos(tok)),
                rng=rng)

        go = jnp.logical_and(
            jnp.logical_and(~st.finished[0],
                            st.num_generated[0] < max_new),
            st.length[0] < max_len)
        st = jax.lax.cond(go, init, lambda s: s, st)
        st, iters = jax.lax.while_loop(
            lambda c: cond(c[0]), lambda c: (body(c[0]), c[1] + 1),
            (st, jnp.zeros((), jnp.int32)))

        def finalize(s: DecodeState) -> DecodeState:
            # give the pending token KV + refresh last_logits so the
            # output satisfies the engine invariant (prefill appends at
            # cache.length; regular decode needs last_logits)
            tok = s.tokens[0, s.length[0] - 1]
            pos = jnp.sum(s.valid[0]).astype(jnp.int32) - 1
            logits, cache = qwen3.forward(
                params, tok[None, None], cfg,
                attention_mask=s.valid.astype(jnp.int32),
                positions=pos[None, None], cache=s.cache)
            return s._replace(
                cache=cache,
                last_logits=logits[:, -1].astype(jnp.float32))

        st = jax.lax.cond(st.length[0] > st.cache.length, finalize,
                          lambda s: s, st)
        return (st, iters) if with_stats else st

    return jax.jit(spec_decode_impl)
