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
    finished: jax.Array      # [B] bool
    rng: jax.Array


def make_decode_fn(cfg: Qwen3Config, sp: SamplingParams,
                   win_size: Optional[int] = None):
    """Build a jitted ``decode(params, state, max_new) -> state``."""
    win = win_size or sp.win_size
    eos_ids = tuple(sp.stop_token_ids)
    pad_id = eos_ids[0]

    def step_body(params, st: DecodeState) -> DecodeState:
        B = st.tokens.shape[0]
        raw = st.last_logits

        # last `win` tokens of each row (prompt included), masked to length
        pos = st.length[:, None] - win + jnp.arange(win)[None, :]
        recent_valid = pos >= 0
        recent = jnp.take_along_axis(st.tokens, jnp.maximum(pos, 0), axis=1)

        rng, sub = jax.random.split(st.rng)
        if sp.top_k > 0:
            # fused k-space sampler: avoids two full-vocab sorts per step
            tok, _used_raw = sampling.sample_token_topk(
                sub, raw, st.presence, st.num_generated[:, None], recent,
                recent_valid, temperature=sp.temperature, top_k=sp.top_k,
                top_p=sp.top_p, repetition_penalty=sp.repetition_penalty,
                min_tokens=sp.min_tokens, eos_ids=eos_ids,
                use_ras=sp.use_ras, win_size=win, tau_r=sp.tau_r,
                topk_method=sp.topk_method)
        else:
            processed = sampling.process_logits(
                raw, st.presence, st.num_generated[:, None],
                temperature=sp.temperature, top_k=sp.top_k, top_p=sp.top_p,
                repetition_penalty=sp.repetition_penalty,
                min_tokens=sp.min_tokens, eos_ids=eos_ids)
            res = sampling.ras_sample(sub, raw, processed, recent,
                                      recent_valid, use_ras=sp.use_ras,
                                      win_size=win, tau_r=sp.tau_r)
            tok = res.token
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
                           st.num_generated + 1, finished, rng)

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

    def __init__(self, params, cfg: Qwen3Config, sp: SamplingParams,
                 max_len: int = 8192, prefill_bucket: int = 128,
                 seed: int = 0, cache_dtype=jnp.bfloat16):
        self.params = params
        self.cfg = cfg
        self.sp = sp
        self.max_len = max_len
        self.bucket = prefill_bucket
        self.cache_dtype = cache_dtype
        self._decode = make_decode_fn(cfg, sp)
        self._prefill = jax.jit(
            lambda p, ids, mask, cache, pos: qwen3.forward(
                p, ids, cfg, attention_mask=mask, positions=pos,
                cache=cache))
        self._rng = jax.random.PRNGKey(seed)

    def _bucketed(self, n: int) -> int:
        return min(self.max_len, -(-n // self.bucket) * self.bucket)

    def _window_for(self, n: int) -> int:
        """Smallest power-of-two cache window >= n (min 512)."""
        w = 512
        while w < n:
            w *= 2
        return min(w, self.max_len)

    def _run_decode(self, state: DecodeState, max_new: int) -> DecodeState:
        """Windowed decode: run the jitted loop inside a power-of-two cache
        window that grows as the sequence does — each step attends over
        O(current length) keys instead of the full max_len cache (the decode
        loop is cache-bandwidth-bound, so this is ~max_len/length faster for
        short sessions and batched serving). One compile per window size."""
        done = 0
        while done < max_new:
            cur = int(jnp.max(state.length))
            window = self._window_for(cur + 1)
            st_w = state._replace(
                tokens=state.tokens[:, :window],
                valid=state.valid[:, :window],
                cache=state.cache._replace(k=state.cache.k[:, :, :window],
                                           v=state.cache.v[:, :, :window]))
            st_w = self._decode(self.params, st_w,
                                jnp.asarray(max_new, jnp.int32))
            state = state._replace(
                tokens=state.tokens.at[:, :window].set(st_w.tokens),
                valid=state.valid.at[:, :window].set(st_w.valid),
                length=st_w.length,
                cache=state.cache._replace(
                    k=state.cache.k.at[:, :, :window].set(st_w.cache.k),
                    v=state.cache.v.at[:, :, :window].set(st_w.cache.v),
                    length=st_w.cache.length),
                last_logits=st_w.last_logits,
                presence=st_w.presence,
                num_generated=st_w.num_generated,
                finished=st_w.finished,
                rng=st_w.rng)
            done = int(jnp.min(state.num_generated))
            if bool(jnp.all(state.finished)) or window >= self.max_len:
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

    def generate_batch(self, prompts: list, max_new: Optional[int] = None
                       ) -> list:
        """Batched single-turn decode (serving path; beyond the reference's
        B=1 engines). Prompts are LEFT-padded to one bucket width so all
        rows share the write offset; pads are masked keys with per-row RoPE
        positions, so results match unpadded decoding."""
        B = len(prompts)
        width = self._bucketed(max(len(p) for p in prompts))
        ids = np.zeros((B, width), np.int32)
        valid_np = np.zeros((B, self.max_len), bool)
        pos_np = np.zeros((B, width), np.int32)
        for b, p in enumerate(prompts):
            n = len(p)
            ids[b, width - n:] = p
            valid_np[b, width - n:width] = True
            pos_np[b, width - n:] = np.arange(n)

        state = self.new_state(B)
        mask = np.zeros((B, self.max_len), np.int32)
        mask[:, :width] = valid_np[:, :width]
        logits, cache = self._prefill(
            self.params, jnp.asarray(ids), jnp.asarray(mask),
            state.cache, jnp.asarray(pos_np))
        cache = cache._replace(length=jnp.asarray(width, jnp.int32))
        state = state._replace(
            tokens=state.tokens.at[:, :width].set(jnp.asarray(ids)),
            length=jnp.full((B,), width, jnp.int32),
            valid=jnp.asarray(valid_np),
            cache=cache,
            last_logits=logits[:, -1, :].astype(jnp.float32))

        cap = min(max_new or self.sp.max_tokens, self.max_len - width)
        state = self._run_decode(state, int(cap))
        outs = []
        toks = np.asarray(state.tokens)
        lens = np.asarray(state.length)
        for b in range(B):
            outs.append(toks[b, width:lens[b]].tolist())
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
