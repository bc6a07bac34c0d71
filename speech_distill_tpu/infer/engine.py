"""TPU decode engine: jitted prefill + fixed-shape sampling decode loop.

Replaces the reference's HF ``model.generate`` hook / vLLM engine
(soulxpodcast/engine/llm_engine.py:23-114) with a TPU-native design:

  * static-shape token buffer [B, max_len] + preallocated KV cache —
    one compile per (bucket, max_new) pair, no growing tensors
  * the whole decode loop is one ``lax.while_loop`` under jit: sample from
    the held logits -> append -> forward-one-token -> next logits
  * repetition-penalty presence set kept as an incremental [B, V] mask
  * multi-turn reuse: cache and buffer survive across calls so the longform
    session (soulxpodcast.py:252-432) pays prefill only for new turn text;
    eviction policy is handled host-side between turns
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from speech_distill_tpu.core.config import Qwen3Config, SamplingParams
from speech_distill_tpu.models import qwen3
from speech_distill_tpu.ops import sampling


class DecodeState(NamedTuple):
    tokens: jax.Array        # [B, max_len] int32 (prompt + generated)
    length: jax.Array        # [B] int32 — buffer slots used per row
    valid: jax.Array         # [B, max_len] bool — real (non-pad) slots
    cache: qwen3.KVCache
    last_logits: jax.Array   # [B, V] fp32 — logits at the last real token
    presence: jax.Array      # [B, V] bool — generated-token set (rep penalty)
    num_generated: jax.Array  # [B] int32
    cap: jax.Array           # [B] int32 — per-row token budget. The static
    #                          engine leaves it huge (its stop is the global
    #                          max_new while-loop bound); the continuous
    #                          engine retires rows at their request cap
    #                          device-side, so chunks early-exit instead of
    #                          burning steps to the next host boundary.
    finished: jax.Array      # [B] bool
    rng: jax.Array


def sample_next_token(sp: SamplingParams, st: DecodeState, win: int,
                      eos_ids: tuple, want_logprob: bool = False):
    """Sample one token per row from ``st.last_logits`` (RAS + repetition
    penalty + top-k/p, reference sampler.py:111-193). Shared by the static
    decode loop and the continuous-batching engine. Returns (token, rng),
    or (token, rng, logprob [B] f32) with ``want_logprob`` — the emitted
    token's log-probability under the sampler's closed-form output
    distribution (vLLM's per-token ``logprobs``; see ops/sampling).

    When the state carries a ``samp`` [B, 4] array (PagedEngine with
    per_request_sampling — columns: temperature, top_p, repetition
    penalty, min_tokens), those override the global SamplingParams
    per row (the vLLM per-request SamplingParams capability)."""
    raw = st.last_logits
    samp = getattr(st, "samp", None)
    if samp is not None:
        temperature, top_p = samp[:, 0], samp[:, 1]
        rep_pen, min_tok = samp[:, 2], samp[:, 3].astype(jnp.int32)
    else:
        temperature, top_p = sp.temperature, sp.top_p
        rep_pen, min_tok = sp.repetition_penalty, sp.min_tokens

    # last `win` tokens of each row (prompt included), masked to length
    pos = st.length[:, None] - win + jnp.arange(win)[None, :]
    recent_valid = pos >= 0
    recent = jnp.take_along_axis(st.tokens, jnp.maximum(pos, 0), axis=1)

    rng, sub = jax.random.split(st.rng)
    logp = None
    if sp.top_k > 0:
        # fused k-space sampler: avoids two full-vocab sorts per step
        out = sampling.sample_token_topk(
            sub, raw, st.presence, st.num_generated[:, None], recent,
            recent_valid, temperature=temperature, top_k=sp.top_k,
            top_p=top_p, repetition_penalty=rep_pen,
            min_tokens=min_tok, eos_ids=eos_ids,
            use_ras=sp.use_ras, win_size=win, tau_r=sp.tau_r,
            topk_method=sp.topk_method, return_logprob=want_logprob)
        tok = out[0]
        if want_logprob:
            logp = out[2]
    else:
        processed = sampling.process_logits(
            raw, st.presence, st.num_generated[:, None],
            temperature=temperature, top_k=sp.top_k, top_p=top_p,
            repetition_penalty=rep_pen,
            min_tokens=min_tok, eos_ids=eos_ids)
        res = sampling.ras_sample(sub, raw, processed, recent,
                                  recent_valid, use_ras=sp.use_ras,
                                  win_size=win, tau_r=sp.tau_r,
                                  return_logprob=want_logprob)
        tok, logp = res.token, res.logprob
    if want_logprob:
        return tok, rng, logp
    return tok, rng


def make_decode_fn(cfg: Qwen3Config, sp: SamplingParams,
                   win_size: Optional[int] = None):
    """Build a jitted ``decode(params, state, max_new) -> state``."""
    win = win_size or sp.win_size
    eos_ids = tuple(sp.stop_token_ids)
    pad_id = eos_ids[0]

    def step_body(params, st: DecodeState) -> DecodeState:
        B = st.tokens.shape[0]
        tok, rng = sample_next_token(sp, st, win, eos_ids)
        token = jnp.where(st.finished, pad_id, tok)

        tokens = st.tokens.at[jnp.arange(B), st.length].set(token)
        valid = st.valid.at[jnp.arange(B), st.length].set(True)
        presence = st.presence.at[jnp.arange(B), token].set(True)
        is_eos = jnp.zeros(B, bool)
        for e in eos_ids:
            is_eos = jnp.logical_or(is_eos, token == e)
        finished = jnp.logical_or(st.finished, is_eos)

        # per-row RoPE position = count of real tokens before this one
        # (left-padded batches: pads are masked keys, not positions)
        pos = jnp.sum(st.valid, axis=1).astype(jnp.int32)[:, None]
        logits, cache = qwen3.forward(params, token[:, None], cfg,
                                      attention_mask=valid.astype(jnp.int32),
                                      positions=pos, cache=st.cache)
        return DecodeState(tokens, st.length + 1, valid, cache,
                           logits[:, -1, :].astype(jnp.float32), presence,
                           st.num_generated + 1, st.cap, finished, rng)

    @jax.jit
    def decode(params, st: DecodeState, max_new) -> DecodeState:
        # max_new is a traced scalar: one compile serves every turn length
        max_len = st.tokens.shape[1]
        def cond(s: DecodeState):
            return jnp.logical_and(
                jnp.logical_and(jnp.any(~s.finished),
                                jnp.min(s.num_generated) < max_new),
                jnp.max(s.length) < max_len)
        return jax.lax.while_loop(cond, lambda s: step_body(params, s), st)

    return decode


class DecodeEngine:
    """Host-facing engine operating on id lists (tokenizer-free).

    ``generate(prompt_ids)`` mirrors HFLLMEngine.generate
    (llm_engine.py:37-76): repetition penalty excludes the prompt, RAS
    sampling, EOS stopping, KV-cache passthrough for multi-turn reuse.
    """

    stateful = True   # multi-turn reuse via caller-held DecodeState

    def __init__(self, params, cfg: Qwen3Config, sp: SamplingParams,
                 max_len: int = 8192, prefill_bucket: int = 128,
                 seed: int = 0, cache_dtype=jnp.bfloat16,
                 prefix_cache_size: int = 4, prefix_cache_min: int = 32,
                 spec_gamma: int = 0, spec_ngram: int = 3,
                 spec_draft: str = "ngram",
                 spec_layers: Optional[int] = None):
        self.params = params
        self.cfg = cfg
        self.sp = sp
        self.max_len = max_len
        self.bucket = prefill_bucket
        self.cache_dtype = cache_dtype
        self._decode = make_decode_fn(cfg, sp)
        # speculative decoding, B=1 only: prompt-lookup (vLLM ngram
        # method) or layer-skip self-drafting (spec_draft="layer_skip",
        # spec_layers=K — survives the RAS sampler that rejects n-gram
        # drafts by construction)
        self._spec_gamma = spec_gamma
        self._spec = None
        if spec_gamma > 0:
            from speech_distill_tpu.infer import speculative
            self._spec = speculative.make_spec_decode_fn(
                cfg, sp, spec_gamma, ngram_max=spec_ngram,
                draft=spec_draft, draft_layers=spec_layers)
        self._prefill = jax.jit(
            lambda p, ids, mask, cache, pos: qwen3.forward(
                p, ids, cfg, attention_mask=mask, positions=pos,
                cache=cache))
        # donated variant for caches nothing else references (the fresh
        # generate_batch state): without it prefill holds input AND output
        # cache at once — 2x the full KV (OOM at 16 x 4096 on v5e). The
        # multi-turn prefill keeps the undonated form (orchestrators may
        # retain the previous turn's state for eviction rollback).
        self._prefill_d = jax.jit(
            lambda p, ids, mask, cache, pos: qwen3.forward(
                p, ids, cfg, attention_mask=mask, positions=pos,
                cache=cache), donate_argnums=(3,))
        # window merge-back for _run_decode: donating the four full-size
        # buffers keeps exactly one full-size cache live (the window
        # results are written into them in place). Only those four — the
        # state's small leaves alias st_w's, and a buffer cannot be both
        # donated and passed.
        self._merge_window = jax.jit(self._merge_window_impl,
                                     donate_argnums=(0, 1, 2, 3))
        self._rng = jax.random.PRNGKey(seed)
        # prompt-prefix KV cache (vLLM enable_prefix_caching equivalent,
        # reference llm_engine.py:78-114): prefix token tuple -> (k, v)
        # [L, 1, n, KV, Dh] device arrays, LRU-evicted
        self.prefix_cache_size = prefix_cache_size
        self.prefix_cache_min = prefix_cache_min
        self._prefix_cache: "dict[tuple, tuple]" = {}

    def _bucketed(self, n: int) -> int:
        return min(self.max_len, -(-n // self.bucket) * self.bucket)

    def _window_for(self, n: int) -> int:
        """Smallest power-of-two cache window >= n (min 512)."""
        w = 512
        while w < n:
            w *= 2
        return min(w, self.max_len)

    @staticmethod
    def _merge_window_impl(tokens, valid, ck, cv, st_w: DecodeState):
        window = st_w.tokens.shape[1]
        return (tokens.at[:, :window].set(st_w.tokens),
                valid.at[:, :window].set(st_w.valid),
                ck.at[:, :, :window].set(st_w.cache.k),
                cv.at[:, :, :window].set(st_w.cache.v))

    def _run_decode(self, state: DecodeState, max_new: int) -> DecodeState:
        """Windowed decode: run the jitted loop inside a power-of-two cache
        window that grows as the sequence does — each step attends over
        O(current length) keys instead of the full max_len cache (the decode
        loop is cache-bandwidth-bound, so this is ~max_len/length faster for
        short sessions and batched serving). One compile per window size."""
        done = 0
        spec = self._spec if (self._spec is not None
                              and state.tokens.shape[0] == 1) else None
        # spec decode needs gamma+1 free slots inside its window to run a
        # single iteration; without the margin the host loop could pick a
        # window the spec cond immediately rejects and spin forever
        margin = self._spec_gamma + 1 if spec is not None else 0
        while done < max_new:
            cur = int(jnp.max(state.length))
            window = self._window_for(cur + 1 + margin)
            if window >= self.max_len:
                # full-size window: no slicing (a trivial slice would alias
                # the donated merge inputs) — decode the state directly
                if spec is not None:
                    state = spec(self.params, state,
                                 jnp.asarray(max_new, jnp.int32))
                # regular decode mops up the <= gamma-token tail the spec
                # loop cannot fit near max_len (no-op if already done)
                state = self._decode(self.params, state,
                                     jnp.asarray(max_new, jnp.int32))
                done = int(jnp.min(state.num_generated))
                break
            st_w = state._replace(
                tokens=state.tokens[:, :window],
                valid=state.valid[:, :window],
                cache=state.cache._replace(k=state.cache.k[:, :, :window],
                                           v=state.cache.v[:, :, :window]))
            st_w = (spec or self._decode)(self.params, st_w,
                                          jnp.asarray(max_new, jnp.int32))
            tokens, valid, ck, cv = self._merge_window(
                state.tokens, state.valid, state.cache.k, state.cache.v,
                st_w)
            state = st_w._replace(
                tokens=tokens, valid=valid,
                cache=qwen3.KVCache(ck, cv, st_w.cache.length))
            done = int(jnp.min(state.num_generated))
            if bool(jnp.all(state.finished)):
                break
        return state

    def new_state(self, batch: int = 1) -> DecodeState:
        cache = qwen3.KVCache.create(self.cfg, batch, self.max_len,
                                     self.cache_dtype)
        V = self.cfg.vocab_size
        self._rng, sub = jax.random.split(self._rng)
        return DecodeState(
            tokens=jnp.zeros((batch, self.max_len), jnp.int32),
            length=jnp.zeros((batch,), jnp.int32),
            valid=jnp.zeros((batch, self.max_len), bool),
            cache=cache,
            last_logits=jnp.zeros((batch, V), jnp.float32),
            presence=jnp.zeros((batch, V), bool),
            num_generated=jnp.zeros((batch,), jnp.int32),
            cap=jnp.full((batch,), 1 << 30, jnp.int32),
            finished=jnp.zeros((batch,), bool),
            rng=sub)

    def prefill(self, state: DecodeState, new_ids: list) -> DecodeState:
        """Append prompt ids (single row) and run the model over them.

        The chunk is padded to a bucket; padded keys are written to the
        cache but are never visible: the cache length is rewound to the true
        end, and every later step overwrites its own slot before attending.
        """
        n = len(new_ids)
        start = int(state.cache.length)
        width = self._bucketed(n)
        ids = np.zeros((1, width), np.int32)
        ids[0, :n] = new_ids
        mask = (np.arange(self.max_len) < start + n).astype(np.int32)[None]
        logits, cache = self._prefill(self.params, jnp.asarray(ids),
                                      jnp.asarray(mask), state.cache, None)
        cache = cache._replace(length=jnp.asarray(start + n, jnp.int32))
        tokens = jax.lax.dynamic_update_slice(
            state.tokens, jnp.asarray(ids[:, :n]), (0, start))
        valid = state.valid.at[0, start:start + n].set(True)
        return state._replace(
            tokens=tokens,
            length=jnp.full_like(state.length, start + n),
            valid=valid,
            cache=cache,
            last_logits=logits[:, n - 1, :].astype(jnp.float32))

    # -- prompt-prefix KV caching ------------------------------------------

    @staticmethod
    def _common_prefix_len(prompts: list) -> int:
        n = min(len(p) for p in prompts)
        first = prompts[0]
        for i in range(n):
            t = first[i]
            for p in prompts[1:]:
                if p[i] != t:
                    return i
        return n

    def _prefill_prefix(self, prefix: tuple):
        """Prefill ``prefix`` standalone (B=1) and cache its KV slabs.

        Reuses the longest already-cached entry that is a prefix of
        ``prefix`` and extends it with one more prefill chunk, so growing
        system prompts pay only for the new tokens."""
        if prefix in self._prefix_cache:
            kv = self._prefix_cache.pop(prefix)
            self._prefix_cache[prefix] = kv          # LRU bump
            return kv
        best = ()
        for key in self._prefix_cache:
            if len(key) > len(best) and len(key) < len(prefix) \
                    and prefix[:len(key)] == key:
                best = key
        start = len(best)
        new_ids = list(prefix[start:])
        n = len(prefix)
        width = self._bucketed(len(new_ids))
        S = start + width
        cache = qwen3.KVCache.create(self.cfg, 1, S, self.cache_dtype)
        if start:
            pk, pv = self._prefix_cache[best]
            cache = cache._replace(
                k=cache.k.at[:, :, :start].set(pk),
                v=cache.v.at[:, :, :start].set(pv),
                length=jnp.asarray(start, jnp.int32))
        ids = np.zeros((1, width), np.int32)
        ids[0, :len(new_ids)] = new_ids
        mask = (np.arange(S) < n).astype(np.int32)[None]
        _, cache = self._prefill(self.params, jnp.asarray(ids),
                                 jnp.asarray(mask), cache, None)
        kv = (cache.k[:, :, :n], cache.v[:, :, :n])
        self._prefix_cache[prefix] = kv
        while len(self._prefix_cache) > self.prefix_cache_size:
            self._prefix_cache.pop(next(iter(self._prefix_cache)))
        return kv

    def generate_batch(self, prompts: list, max_new: Optional[int] = None,
                       use_prefix_cache: bool = True) -> list:
        """Batched single-turn decode (serving path; beyond the reference's
        B=1 engines). Prompts are LEFT-padded to one bucket width so all
        rows share the write offset; pads are masked keys with per-row RoPE
        positions, so results match unpadded decoding.

        ``use_prefix_cache``: when the prompts share a common token prefix
        (>= prefix_cache_min), it is prefilled once (B=1), its KV broadcast
        across rows, and kept in an LRU for successive calls — the vLLM
        ``enable_prefix_caching=True`` equivalent
        (reference llm_engine.py:78-114)."""
        B = len(prompts)
        longest = max(len(p) for p in prompts)
        if longest >= self.max_len:
            raise ValueError(
                f"prompt length {longest} leaves no room to generate "
                f"(max_len={self.max_len})")
        pre = 0
        if use_prefix_cache and B >= 1:
            # every row must keep >= 1 remainder token for its last logits
            pre = min(self._common_prefix_len(prompts),
                      min(len(p) for p in prompts) - 1)
            if pre < self.prefix_cache_min:
                pre = 0
        rems = [p[pre:] for p in prompts]
        if pre and pre + self._bucketed(max(len(r) for r in rems)) \
                > self.max_len:
            # bucketed remainder after the shared prefix would overflow the
            # cache (the _bucketed clamp only bounds the remainder width);
            # fall back to prefilling the full prompts in-row
            pre = 0
            rems = prompts

        width = self._bucketed(max(len(r) for r in rems))
        ids = np.zeros((B, width), np.int32)
        valid_np = np.zeros((B, self.max_len), bool)
        pos_np = np.zeros((B, width), np.int32)
        for b, r in enumerate(rems):
            n = len(r)
            ids[b, width - n:] = r
            valid_np[b, pre + width - n:pre + width] = True
            pos_np[b, width - n:] = pre + np.arange(n)

        state = self.new_state(B)
        if pre:
            pk, pv = self._prefill_prefix(tuple(prompts[0][:pre]))
            L, _, _, KV, Dh = pk.shape
            state = state._replace(
                tokens=state.tokens.at[:, :pre].set(
                    jnp.asarray(prompts[0][:pre], jnp.int32)[None]),
                valid=state.valid.at[:, :pre].set(True),
                cache=state.cache._replace(
                    k=state.cache.k.at[:, :, :pre].set(
                        jnp.broadcast_to(pk, (L, B, pre, KV, Dh))),
                    v=state.cache.v.at[:, :, :pre].set(
                        jnp.broadcast_to(pv, (L, B, pre, KV, Dh))),
                    length=jnp.asarray(pre, jnp.int32)))
            valid_np[:, :pre] = True

        mask = np.zeros((B, self.max_len), np.int32)
        mask[:, :pre + width] = valid_np[:, :pre + width]
        logits, cache = self._prefill_d(
            self.params, jnp.asarray(ids), jnp.asarray(mask),
            state.cache, jnp.asarray(pos_np))
        total = pre + width
        cache = cache._replace(length=jnp.asarray(total, jnp.int32))
        state = state._replace(
            tokens=state.tokens.at[:, pre:total].set(jnp.asarray(ids)),
            length=jnp.full((B,), total, jnp.int32),
            valid=jnp.asarray(valid_np),
            cache=cache,
            last_logits=logits[:, -1, :].astype(jnp.float32))

        cap = min(max_new or self.sp.max_tokens, self.max_len - total)
        if cap <= 0:
            raise ValueError(
                f"bucketed prompt width {total} fills the cache "
                f"(max_len={self.max_len}); raise max_len or shrink "
                f"prefill_bucket")
        state = self._run_decode(state, int(cap))
        outs = []
        toks = np.asarray(state.tokens)
        lens = np.asarray(state.length)
        for b in range(B):
            outs.append(toks[b, total:lens[b]].tolist())
        return outs

    def generate(self, prompt_ids: list,
                 state: Optional[DecodeState] = None) -> dict:
        """One turn: prefill prompt continuation + sample until EOS."""
        state = state if state is not None else self.new_state(1)
        prompt_end = int(state.length[0]) + len(prompt_ids)
        state = self.prefill(state, prompt_ids)
        # reset per-turn sampling state (penalty set excludes the prompt)
        state = state._replace(
            presence=jnp.zeros_like(state.presence),
            num_generated=jnp.zeros_like(state.num_generated),
            finished=jnp.zeros_like(state.finished))
        max_new = min(self.sp.max_tokens, self.max_len - prompt_end)
        state = self._run_decode(state, int(max_new))
        toks = np.asarray(state.tokens[0])
        end = int(state.length[0])
        return {"token_ids": toks[prompt_end:end].tolist(), "state": state}

    def generate_stream(self, prompt_ids: list, chunk: int = 25,
                        state: Optional[DecodeState] = None,
                        max_new: Optional[int] = None):
        """Token-level streaming: one turn as a generator yielding lists of
        newly generated ids every ``chunk`` decode steps (sooner at EOS).

        The concatenation of the yields equals ``generate()``'s token_ids
        for the same rng state (the decode program is identical — max_new
        is a traced scalar, so chunking adds no compiles). This is the LLM
        half of streaming TTS (infer/streaming_tts.py): the reference's
        vLLM engine streams tokens the same way, the HF engine does not
        (llm_engine.py:37-114).

        After exhaustion, ``self.last_stream_state`` holds the final
        DecodeState (a generator cannot return one) so multi-turn sessions
        — the longform orchestrator — can continue the cache."""
        self.last_stream_state = None
        state = state if state is not None else self.new_state(1)
        prompt_end = int(state.length[0]) + len(prompt_ids)
        state = self.prefill(state, prompt_ids)
        state = state._replace(
            presence=jnp.zeros_like(state.presence),
            num_generated=jnp.zeros_like(state.num_generated),
            finished=jnp.zeros_like(state.finished))
        cap = min(max_new or self.sp.max_tokens, self.max_len - prompt_end)
        emitted = prompt_end
        done = 0
        while done < cap:
            state = self._run_decode(state, min(done + chunk, cap))
            # ONE batched host read per chunk — incl. the token row; a
            # separate np.asarray(slice) is its own relay round-trip
            # (~10 ms) on the first-audio-latency path
            n_gen, end, fin, row = jax.device_get(
                (state.num_generated[0], state.length[0],
                 jnp.all(state.finished), state.tokens[0]))
            done, end, fin = int(n_gen), int(end), bool(fin)
            new = np.asarray(row)[emitted:end].tolist()
            emitted = end
            if new:
                yield new
            if fin:
                break
        self.last_stream_state = state
