"""Paged-KV serving: block-table cache pool + on-demand pages + preemption.

The full TPU equivalent of vLLM's PagedAttention engine (the engine the
reference leans on for fast decode, soulxpodcast/engine/llm_engine.py:78-114).
Where :class:`~speech_distill_tpu.infer.continuous.ContinuousEngine` gives
each slot a CONTIGUOUS max_len row (memory = slots * max_len regardless of
occupancy), this engine carves the KV cache into fixed-size pages
[L, P, KV, page_size, Dh] handed out on demand:

  * memory is proportional to tokens actually resident, so the same HBM
    holds more concurrent streams when lengths are skewed (the podcast
    workload: few long dialogue turns + many short ones)
  * a host-side allocator (ref-counted free list) grows each stream one
    page at a time between decode chunks; block tables are tiny int32
    arrays pushed to the device per chunk
  * when the pool is exhausted the YOUNGEST stream is preempted vLLM-style
    (recompute mode): its pages are freed and the request re-queues with
    its generated tokens appended to the prompt, so nothing is lost and
    older streams keep their latency
  * decode attention is a Pallas kernel (ops/paged_attention.py) that DMAs
    exactly ceil(len/page_size) pages per (row, kv-head) into VMEM — HBM
    traffic tracks occupancy, not capacity

Everything stays static-shape: the decode program is one jitted chunk
(lax.while_loop with early exit) over [slots] rows; prefill compiles once
per page-count bucket, exactly like the contiguous engines.
"""
from __future__ import annotations

import functools
import os
import time
from collections import deque
from typing import List, NamedTuple, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from speech_distill_tpu.core.config import Qwen3Config, SamplingParams
from speech_distill_tpu.infer.engine import sample_next_token
from speech_distill_tpu.models import qwen3
from speech_distill_tpu.ops.paged_attention import (
    paged_attention, paged_attention_xla, quantize_kv)


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


class PagedKVCache(NamedTuple):
    """Paged decode cache: per-layer page pools [L, P, KV, page_size, Dh]
    (page-major, head-inside — one contiguous DMA per page moves every KV
    head, see ops/paged_attention.py).

    With ``dtype=int8`` (the vLLM quantized-KV-cache capability) the
    pools hold symmetric int8 with one f32 scale per (token, kv-head) in
    ``ks``/``vs`` [L, P, KV, page_size] — pool HBM and per-page DMA bytes
    halve, so the same chip holds ~2x the resident tokens."""

    k: jax.Array
    v: jax.Array
    ks: Optional[jax.Array] = None
    vs: Optional[jax.Array] = None

    @property
    def quantized(self) -> bool:
        return self.ks is not None

    @classmethod
    def create(cls, cfg: Qwen3Config, num_pages: int, page_size: int,
               dtype=jnp.bfloat16) -> "PagedKVCache":
        shape = (cfg.num_hidden_layers, num_pages,
                 cfg.num_key_value_heads, page_size, cfg.head_dim)
        if dtype == jnp.int8:
            # two DISTINCT scale buffers: aliasing one array into both
            # fields breaks donation ("same buffer donated twice")
            return cls(jnp.zeros(shape, jnp.int8),
                       jnp.zeros(shape, jnp.int8),
                       jnp.ones(shape[:-1], jnp.float32),
                       jnp.ones(shape[:-1], jnp.float32))
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


class PagedState(NamedTuple):
    tokens: jax.Array        # [B, max_len] int32 (prompt + generated)
    length: jax.Array        # [B] int32 — tokens resident per row
    pool: PagedKVCache
    block_tables: jax.Array  # [B, max_pages] int32 pool page ids
    last_logits: jax.Array   # [B, V] fp32
    presence: jax.Array      # [B, V] bool — generated-token set
    num_generated: jax.Array  # [B] int32 (request-total across preemptions)
    cap: jax.Array           # [B] int32 — request token budget (device-side
    #                          retire: rows stop exactly at their cap and the
    #                          chunk early-exits when every slot is done,
    #                          instead of burning steps to the host boundary)
    finished: jax.Array      # [B] bool
    rng: jax.Array
    samp: Optional[jax.Array] = None   # [B, 4] f32 per-request sampling
    #                          params (temperature, top_p, repetition
    #                          penalty, min_tokens) — None unless the
    #                          engine was built with per_request_sampling
    #                          (the vLLM per-request SamplingParams
    #                          capability); consumed by sample_next_token
    logps: Optional[jax.Array] = None  # [B, max_len] f32 — each generated
    #                          token's logprob under the sampler's
    #                          closed-form output distribution, stored at
    #                          the token's column (vLLM SamplingParams.
    #                          logprobs); None unless the engine was built
    #                          with return_logprobs


def paged_forward(params, token: jax.Array, cfg: Qwen3Config,
                  pool: PagedKVCache, block_tables: jax.Array,
                  lengths: jax.Array, live: jax.Array,
                  attn_impl: str = "kernel", win_pages: int = 4,
                  mesh=None, _skip_kv_write: bool = False,
                  scan_unroll: int = 1):
    """One decode step over the page pool.

    token [B] int32; the new token's KV is written at page
    block_tables[b, lengths[b] // ps], offset lengths[b] % ps (dropped for
    dead rows), then each row attends over its lengths[b]+1 resident keys.
    Returns (logits [B, V], new pool).

    ``mesh``: multi-chip serving — slots shard over dp, KV heads (and the
    vocab/mlp dims of the model matmuls, via the params' shardings) over
    tp. The XLA attention path partitions under GSPMD from the shardings
    alone; the Pallas kernel is shard_map'd over (dp, tp) — each device
    runs the kernel on its local rows x local KV heads of the pool, no
    collectives inside attention (GQA heads are independent; the o-proj
    psum is GSPMD's, from the params sharding).
    """
    B = token.shape[0]
    KV, Dh = cfg.num_key_value_heads, cfg.head_dim
    H = cfg.num_attention_heads
    G = H // KV
    P, ps = pool.k.shape[1], pool.k.shape[3]

    x = qwen3.embed_tokens(params, token[:, None], cfg)       # [B, 1, D]
    cos, sin = qwen3.rope_angles(lengths[:, None], Dh, cfg.rope_theta)

    rows = jnp.arange(B)
    # clamp: a row at length == max_len is dead (live False) but must not
    # index past the table
    pages = block_tables[rows, jnp.minimum(lengths // ps,
                                           block_tables.shape[1] - 1)]
    pages = jnp.where(live, pages, P)                         # drop dead rows
    offs = lengths % ps
    klen = jnp.where(live, lengths + 1, 0)
    h_idx = jnp.arange(KV)[None, :]                           # [1, KV]
    p_idx = pages[:, None]                                    # [B, 1]
    o_idx = offs[:, None]

    # The pool is a scan CARRY scattered in place at (layer, page, head,
    # offset) — never scan xs/ys, which dynamic-slice + restack the FULL
    # pool every layer (a multi-GB HBM read+write per decode step: measured
    # ~50 ms/step at a 16-slot 4 GB pool vs ~10 ms with the carry). The
    # attention kernel reads its layer's pages straight out of the full
    # pool (ops/paged_attention.py ``layer=``), so per-step traffic stays
    # proportional to resident tokens.
    quantized = pool.quantized

    def body(carry, xs):
        h, pool = carry
        lp, li = xs
        pk, pv = pool.k, pool.v
        y = qwen3.rms_norm(h, lp["input_ln"]["scale"], cfg.rms_norm_eps)
        q, k, v = qwen3.qkv_proj(lp["attn"], y, cos, sin, cfg)
        k1 = k[:, 0]                                          # [B, KV, Dh]
        v1 = v[:, 0]
        if _skip_kv_write:
            # timing ablation ONLY (scripts/paged_anatomy.py): stale KV,
            # isolates the XLA scatters' share of the decode step
            pass
        elif quantized:
            k1, ksc = quantize_kv(k1)
            v1, vsc = quantize_kv(v1)
            pool = pool._replace(
                ks=pool.ks.at[li, p_idx, h_idx, o_idx].set(ksc,
                                                           mode="drop"),
                vs=pool.vs.at[li, p_idx, h_idx, o_idx].set(vsc,
                                                           mode="drop"))
        if not _skip_kv_write:
            pk = pk.at[li, p_idx, h_idx, o_idx].set(k1.astype(pk.dtype),
                                                    mode="drop")
            pv = pv.at[li, p_idx, h_idx, o_idx].set(v1.astype(pv.dtype),
                                                    mode="drop")
            pool = pool._replace(k=pk, v=pv)
        qh = q.reshape(B, KV, G, Dh)
        if attn_impl == "kernel":
            if mesh is not None:
                from jax.sharding import PartitionSpec as PS

                def _local_attn(qh_, pk_, pv_, bt_, kl_, li_, *scl):
                    ks_, vs_ = scl if scl else (None, None)
                    return paged_attention(qh_, pk_, pv_, bt_, kl_,
                                           layer=li_, k_scale=ks_,
                                           v_scale=vs_,
                                           win_pages=win_pages)

                pool_spec = PS(None, None, "tp", None, None)
                in_specs = [PS("dp", "tp", None, None), pool_spec,
                            pool_spec, PS("dp", None), PS("dp"), PS()]
                args = [qh, pk, pv, block_tables, klen, li]
                if quantized:
                    in_specs += [PS(None, None, "tp", None)] * 2
                    args += [pool.ks, pool.vs]
                # check_vma=False: pallas_call outputs carry no vma
                o = jax.shard_map(_local_attn, mesh=mesh,
                                  in_specs=tuple(in_specs),
                                  out_specs=PS("dp", "tp", None, None),
                                  check_vma=False)(*args)
            else:
                o = paged_attention(qh, pk, pv, block_tables, klen,
                                    layer=li, k_scale=pool.ks,
                                    v_scale=pool.vs, win_pages=win_pages)
        else:
            o = paged_attention_xla(qh, pk, pv, block_tables, klen,
                                    layer=li, k_scale=pool.ks,
                                    v_scale=pool.vs)
        o = qwen3._proj(o.reshape(B, 1, H * Dh), lp["attn"]["o"],
                        None, "o", 1.0)
        h = h + o
        y2 = qwen3.rms_norm(h, lp["post_ln"]["scale"], cfg.rms_norm_eps)
        return (h + qwen3.mlp_block(lp["mlp"], y2), pool), None

    n_layers = pool.k.shape[0]
    # scan_unroll: replicate the layer body k times per loop iteration —
    # probes/ablates the scan's per-iteration fixed cost (dispatch +
    # carry threading) at the price of a k-times-larger program
    (x, pool), _ = jax.lax.scan(
        body, (x, pool),
        (params["layers"], jnp.arange(n_layers, dtype=jnp.int32)),
        unroll=scan_unroll)
    x = qwen3.rms_norm(x, params["final_ln"]["scale"], cfg.rms_norm_eps)
    logits = qwen3.unembed(params, x, cfg)
    return logits[:, 0].astype(jnp.float32), pool


def make_paged_decode_fn(cfg: Qwen3Config, sp: SamplingParams,
                         win_size: Optional[int] = None,
                         attn_impl: str = "kernel", win_pages: int = 4,
                         mesh=None):
    """Jitted ``decode_chunk(params, state, n_steps, exit_free) ->
    (state, steps_run)`` over the page pool (early exit when all slots are
    finished, or when ``exit_free`` slots retire mid-chunk while requests
    queue — pass ``slots + 1`` to disable). The host allocator
    guarantees every live row has pages for ``n_steps`` more tokens.
    ``win_pages``: pages per kernel DMA window (amortizes per-page
    overhead at long residency; tails are page-guarded so short rows pay
    no extra bytes)."""
    win = win_size or sp.win_size
    eos_ids = tuple(sp.stop_token_ids)
    pad_id = eos_ids[0]

    def step_body(params, st: PagedState) -> PagedState:
        B, max_len = st.tokens.shape
        if st.logps is not None:
            tok, rng, logp = sample_next_token(sp, st, win, eos_ids,
                                               want_logprob=True)
        else:
            tok, rng = sample_next_token(sp, st, win, eos_ids)
        live = jnp.logical_and(~st.finished, st.length < max_len)
        token = jnp.where(live, tok, pad_id)

        rows = jnp.arange(B)
        col = jnp.where(live, st.length, max_len + 1)
        tokens = st.tokens.at[rows, col].set(token, mode="drop")
        logps = (None if st.logps is None
                 else st.logps.at[rows, col].set(logp, mode="drop"))
        vcol = jnp.where(live, token, st.presence.shape[1] + 1)
        presence = st.presence.at[rows, vcol].set(True, mode="drop")
        is_eos = jnp.zeros(B, bool)
        for e in eos_ids:
            is_eos = jnp.logical_or(is_eos, token == e)
        capped = jnp.logical_and(live, st.num_generated + 1 >= st.cap)
        finished = jnp.logical_or(
            st.finished,
            jnp.logical_or(jnp.logical_and(live, is_eos),
                           jnp.logical_or(capped,
                                          st.length + 1 >= max_len)))

        logits, pool = paged_forward(params, token, cfg, st.pool,
                                     st.block_tables, st.length, live,
                                     attn_impl, win_pages, mesh)
        return PagedState(tokens, st.length + live.astype(jnp.int32),
                          pool, st.block_tables, logits, presence,
                          st.num_generated + live.astype(jnp.int32),
                          st.cap, finished, rng, st.samp, logps)

    # donate the state: without it every chunk call copies the multi-GB KV
    # pool at program entry (~50 ms/chunk measured at a 16-slot 4 GB pool).
    # The serve scheduler never touches a superseded state handle, so
    # donation is safe there.
    @functools.partial(jax.jit, donate_argnums=(1,))
    def decode_chunk(params, st: PagedState, n_steps, exit_free):
        # early chunk exit: when >= exit_free slots RETIRE inside this
        # chunk, return to the scheduler immediately so queued requests
        # re-fill them instead of idling to the chunk boundary (the
        # in-chunk-re-admission half of vLLM mixed batches; the host
        # passes slots+1 when the queue is empty, disabling it)
        fin0 = st.finished

        def cond(c):
            s, i = c
            newly = jnp.sum(jnp.logical_and(s.finished, ~fin0))
            return jnp.logical_and(
                jnp.logical_and(i < n_steps, jnp.any(~s.finished)),
                newly < exit_free)

        def body(c):
            s, i = c
            return step_body(params, s), i + 1

        st, i = jax.lax.while_loop(cond, body,
                                   (st, jnp.zeros((), jnp.int32)))
        # executed step count: the scheduler folds it into its one batched
        # post-chunk device_get (occupancy accounting, no extra sync)
        return st, i

    return decode_chunk


class _AdmissionQueue:
    """Admission-ordered request queue (PagedEngine.admission_policy).

    fifo preserves deque semantics exactly (appendleft = front of queue,
    the recompute-preemption fast path). Priority policies keep the queue
    sorted by key with a stable arrival tiebreak; preempted requests
    re-insert by their CURRENT key (a shortest_job request's remaining
    budget shrinks while resident, so it re-queues ahead of equal-length
    fresh work)."""

    def __init__(self, policy: str):
        self.policy = policy
        self._items = deque()
        self._seq = 0

    def _key(self, r):
        if self.policy == "shortest_job":
            return r["cap"] - len(r["gen"])
        if self.policy == "deadline":
            dl = r.get("dl")
            return dl if dl is not None else float("inf")
        return len(r["ids"])

    def append(self, r) -> None:
        if "_seq" not in r:
            r["_seq"] = self._seq
            self._seq += 1
        if self.policy == "fifo":
            self._items.append(r)
            return
        k = (self._key(r), r["_seq"])
        for i, q in enumerate(self._items):
            if (self._key(q), q["_seq"]) > k:
                self._items.insert(i, r)
                return
        self._items.append(r)

    def appendleft(self, r) -> None:
        if self.policy == "fifo":
            self._items.appendleft(r)
        else:
            self.append(r)

    def popleft(self):
        return self._items.popleft()

    def shed_expired(self, t_now: float):
        """Remove and return queued requests whose TTFT deadline passed
        before they produced ANY token (load shedding under overload).
        Requests already holding generated tokens (preempted residents)
        met their first-token deadline and are never shed."""
        def past_due(r):
            return (r.get("dl") is not None and t_now > r["dl"]
                    and not r["gen"] and "t_first" not in r)
        expired = [r for r in self._items if past_due(r)]
        if expired:
            self._items = deque(r for r in self._items if not past_due(r))
        return expired

    def __getitem__(self, i):
        return self._items[i]

    def __len__(self) -> int:
        return len(self._items)

    def __iter__(self):
        return iter(self._items)


class PagePool:
    """Host-side ref-counted page allocator (the vLLM block manager,
    minus GPU-specific swap: preemption here is recompute-mode)."""

    def __init__(self, num_pages: int):
        self._free = list(range(num_pages - 1, -1, -1))
        self._ref = {}

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> Optional[List[int]]:
        if n > len(self._free):
            return None
        pages = [self._free.pop() for _ in range(n)]
        for p in pages:
            self._ref[p] = 1
        return pages

    def share(self, pages: Sequence[int]) -> None:
        for p in pages:
            self._ref[p] += 1

    def free(self, pages: Sequence[int]) -> None:
        for p in pages:
            self._ref[p] -= 1
            if self._ref[p] == 0:
                del self._ref[p]
                self._free.append(p)

    def refcount(self, p: int) -> int:
        return self._ref.get(p, 0)


class PrefixRegistry:
    """Automatic prefix caching (the vLLM feature): full, page-aligned
    prompt prefixes are keyed by their token tuple and mapped to resident
    pool pages. A registered page carries one registry reference, so it
    outlives the stream that computed it; under pool pressure, entries
    whose page is held ONLY by the registry are evicted LRU-first (before
    any live stream is preempted).

    Keys are exact token tuples — no hash chains, so a collision can never
    alias two different prefixes onto the same KV page."""

    def __init__(self):
        self._map = {}          # tuple(ids[:i*ps]) -> {"page", "last"}
        self._clock = 0

    def _tick(self) -> int:
        self._clock += 1
        return self._clock

    def match(self, ids: Sequence[int], ps: int,
              max_pages: int) -> List[int]:
        """Longest registered page-aligned prefix of ``ids`` (capped at
        ``max_pages`` so the caller can keep at least one suffix token to
        prefill). Returns the matched page ids, root-first."""
        pages = []
        for i in range(min(len(ids) // ps, max_pages)):
            e = self._map.get(tuple(ids[:(i + 1) * ps]))
            if e is None:
                break
            e["last"] = self._tick()
            pages.append(e["page"])
        return pages

    def register(self, ids: Sequence[int], stream_pages: Sequence[int],
                 ps: int, pool: PagePool) -> None:
        """Record every full page of ``ids`` (pages beyond the last full
        one are mutable — never registered). Each new entry takes its own
        pool reference."""
        for i in range(len(ids) // ps):
            key = tuple(ids[:(i + 1) * ps])
            if key not in self._map:
                pool.share([stream_pages[i]])
                self._map[key] = {"page": stream_pages[i],
                                  "last": self._tick()}

    def evict_one(self, pool: PagePool) -> bool:
        """Free the LRU entry whose page no live stream holds."""
        best = None
        for key, e in self._map.items():
            if pool.refcount(e["page"]) == 1 and \
                    (best is None or e["last"] < self._map[best]["last"]):
                best = key
        if best is None:
            return False
        pool.free([self._map.pop(best)["page"]])
        return True

    def alloc(self, pool: PagePool, n: int) -> Optional[List[int]]:
        """pool.alloc with LRU cache eviction under pressure."""
        while True:
            got = pool.alloc(n)
            if got is not None or not self.evict_one(pool):
                return got


class PagedEngine:
    """Slot scheduler over the paged decode program.

    Same serve() contract as ContinuousEngine (order-preserving outputs,
    per-request caps), plus: KV memory bounded by ``num_pages`` rather than
    slots*max_len, and vLLM-style recompute preemption when the pool runs
    dry. ``num_pages >= ceil(max_len / page_size)`` is required so a lone
    stream can always run to max_len after preempting everyone else."""

    stateful = False   # generate() takes full context; no caller-held state

    def __init__(self, params, cfg: Qwen3Config, sp: SamplingParams,
                 slots: int = 8, max_len: int = 4096,
                 num_pages: Optional[int] = None, page_size: int = 128,
                 chunk_steps: int = 32, seed: int = 0,
                 cache_dtype=jnp.bfloat16, attn_impl: str = "auto",
                 prefix_sharing: bool = True,
                 prefill_chunk: Optional[int] = None,
                 attn_win_pages: int = 4, mesh=None,
                 native_runtime: Optional[bool] = None,
                 admit_batch_max_width: int = 1024,
                 chunk_exit_free: Optional[int] = None,
                 per_request_sampling: bool = False,
                 return_logprobs: bool = False,
                 admission_policy: str = "fifo"):
        self.params = params
        self.cfg = cfg
        self.sp = sp
        self.slots = slots
        self.max_len = max_len
        self.ps = page_size
        self.max_pages = _ceil_div(max_len, page_size)
        self.num_pages = (num_pages if num_pages is not None
                          else slots * self.max_pages)
        if self.num_pages < self.max_pages:
            raise ValueError(
                f"num_pages={self.num_pages} cannot hold one max_len stream "
                f"({self.max_pages} pages)")
        self.chunk_steps = chunk_steps
        # early chunk exit: return to the scheduler once this many slots
        # retire inside a chunk while requests wait (None/0 = run chunks
        # to the boundary). Raises occupancy under sustained load at the
        # cost of more chunk dispatches.
        self.chunk_exit_free = chunk_exit_free
        self.admit_batch_max_width = admit_batch_max_width
        # per-request sampling params (vLLM SamplingParams-per-request):
        # the state carries a [B, 4] row of (temperature, top_p,
        # repetition_penalty, min_tokens) that overrides the engine-global
        # SamplingParams per slot; serve(sampling_per_request=[...]) fills
        # them. top_k / RAS stay engine-global (structural: they fix the
        # sampler's k-space shape and window).
        self.per_request_sampling = per_request_sampling
        # per-token logprobs (vLLM SamplingParams.logprobs): the state
        # carries a [B, max_len] f32 buffer filled at each generated
        # token's column with its logprob under the sampler's closed-form
        # output distribution; serve() exposes them per request via
        # ``request_logprobs`` (and generate() returns "logprobs")
        self.return_logprobs = return_logprobs
        self.request_logprobs: List[Optional[List[float]]] = []
        # admission order under contention (vLLM scheduling policy):
        #   fifo           arrival order (default; fair, max-wait optimal)
        #   shortest_job   ascending remaining generation budget (the
        #                  declared per-request cap) — short turns stop
        #                  queueing behind long ones, cutting TTFT
        #                  percentiles under sustained load at unchanged
        #                  device throughput
        #   shortest_prompt ascending prompt length (prefill-cost proxy
        #                  when caps are uniform/unknown)
        #   deadline       earliest TTFT deadline first (EDF) — pairs with
        #                  serve(ttft_deadline_s=...); requests without a
        #                  deadline sort last. Under overload, combine
        #                  with shedding (deadline-expired unstarted
        #                  requests are dropped, see serve()) so capacity
        #                  goes to requests that can still meet theirs.
        # Preempted requests re-queue by the same key (their shrunken
        # remaining budget under shortest_job), never behind fresh work of
        # equal key (stable seq tiebreak).
        if admission_policy not in ("fifo", "shortest_job",
                                    "shortest_prompt", "deadline"):
            raise ValueError(f"unknown admission_policy "
                             f"{admission_policy!r}")
        self.admission_policy = admission_policy
        self.cache_dtype = cache_dtype
        # int8 pools (vLLM quantized KV cache): the pool stores int8 +
        # per-token scales; the CONTIGUOUS temp cache prefill runs through
        # stays bf16 (quantization happens at page scatter)
        self._tmp_cache_dtype = (jnp.bfloat16 if cache_dtype == jnp.int8
                                 else cache_dtype)
        if attn_impl == "auto":
            attn_impl = ("kernel" if jax.default_backend() == "tpu"
                         else "xla")
        self.prefix_sharing = prefix_sharing
        # chunked prefill (the vLLM scheduler feature): cap how many prompt
        # tokens one admission may prefill before live slots get their next
        # decode chunk. Page-aligned so partial pages never exist; None =
        # whole-prompt prefill (the latency-insensitive default).
        if prefill_chunk is not None:
            prefill_chunk = max(page_size,
                                (prefill_chunk // page_size) * page_size)
        self.prefill_chunk = prefill_chunk
        # None = auto (native if it builds; SDT_NATIVE=0 disables),
        # True = require native, False = Python twins
        if native_runtime is None and os.environ.get("SDT_NATIVE",
                                                     "1") == "0":
            native_runtime = False
        self.native_runtime = native_runtime
        self.mesh = mesh
        if mesh is not None:
            dp = int(dict(mesh.shape).get("dp", 1))
            tp = int(dict(mesh.shape).get("tp", 1))
            if slots % dp != 0:
                raise ValueError(f"slots={slots} not divisible by dp={dp}")
            if cfg.num_key_value_heads % tp != 0:
                raise ValueError(
                    f"KV heads {cfg.num_key_value_heads} not divisible "
                    f"by tp={tp}")
        self._decode = make_paged_decode_fn(cfg, sp, attn_impl=attn_impl,
                                            win_pages=attn_win_pages,
                                            mesh=mesh)
        self._admit = self._make_admit()
        self._admit_batch = self._make_admit_batch()
        self._prefill_part = self._make_prefill_part()
        self._finish_slot = jax.jit(
            lambda st, b: st._replace(finished=st.finished.at[b].set(True)),
            donate_argnums=(0,))
        self._rng = jax.random.PRNGKey(seed)
        # persistent serving state (created lazily on first serve())
        self._state: Optional[PagedState] = None
        self._pool: Optional[PagePool] = None
        self._registry: Optional[PrefixRegistry] = None

    def _make_runtime(self):
        """(PagePool, PrefixRegistry) — the native C++ serving runtime
        (allocator + prefix trie, native/serving_runtime.cc) when built,
        else the Python twins. Both behave identically (tested); the trie
        walks O(n) tokens per match/register where the Python flat map
        hashes every full prefix (O(n^2/ps) per admission)."""
        if self.native_runtime is not False:
            from speech_distill_tpu.native import serving
            if serving.available():
                return (serving.NativePagePool(self.num_pages),
                        serving.NativePrefixRegistry())
            if self.native_runtime is True:     # explicitly requested
                raise RuntimeError("native serving runtime unavailable")
        return PagePool(self.num_pages), PrefixRegistry()

    def state_shardings(self) -> Optional[PagedState]:
        """NamedSharding tree for PagedState on ``self.mesh`` (None off
        mesh): slot rows over dp, pool KV heads over tp, everything else
        replicated. last_logits stays vocab-replicated per dp shard so
        the sampler's top-k runs without a gather."""
        if self.mesh is None:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as PS

        def sh(*spec):
            return NamedSharding(self.mesh, PS(*spec))

        pool = PagedKVCache(
            k=sh(None, None, "tp", None, None),
            v=sh(None, None, "tp", None, None),
            ks=sh(None, None, "tp", None) if self.cache_dtype == jnp.int8
            else None,
            vs=sh(None, None, "tp", None) if self.cache_dtype == jnp.int8
            else None)
        return PagedState(
            tokens=sh("dp", None), length=sh("dp"), pool=pool,
            block_tables=sh("dp", None), last_logits=sh("dp", None),
            presence=sh("dp", None), num_generated=sh("dp"),
            cap=sh("dp"), finished=sh("dp"), rng=sh(),
            samp=sh("dp", None) if self.per_request_sampling else None,
            logps=sh("dp", None) if self.return_logprobs else None)

    def _default_samp(self):
        """Engine-global sampling params as a [4] row (the per-request
        default when a request specifies nothing)."""
        return [float(self.sp.temperature), float(self.sp.top_p),
                float(self.sp.repetition_penalty), float(self.sp.min_tokens)]

    def new_state(self) -> PagedState:
        B, V = self.slots, self.cfg.vocab_size
        pool = PagedKVCache.create(self.cfg, self.num_pages, self.ps,
                                   self.cache_dtype)
        self._rng, sub = jax.random.split(self._rng)
        state = PagedState(
            tokens=jnp.zeros((B, self.max_len), jnp.int32),
            length=jnp.zeros((B,), jnp.int32),
            pool=pool,
            block_tables=jnp.zeros((B, self.max_pages), jnp.int32),
            last_logits=jnp.zeros((B, V), jnp.float32),
            presence=jnp.zeros((B, V), bool),
            num_generated=jnp.zeros((B,), jnp.int32),
            cap=jnp.zeros((B,), jnp.int32),
            finished=jnp.ones((B,), bool),     # all slots start idle
            rng=sub,
            samp=(jnp.tile(jnp.asarray(self._default_samp(), jnp.float32),
                           (B, 1))
                  if self.per_request_sampling else None),
            logps=(jnp.zeros((B, self.max_len), jnp.float32)
                   if self.return_logprobs else None))
        shardings = self.state_shardings()
        if shardings is not None:
            state = jax.tree.map(jax.device_put, state, shardings)
        return state

    @staticmethod
    def _scatter_impl(pool: PagedKVCache, tmp_k, tmp_v,
                      page_ids) -> PagedKVCache:
        """Install a contiguous prefill cache [L, B, W, KV, Dh] into
        ``len(page_ids)`` pool pages (len(page_ids) == B * W/page_size;
        rows flatten page-major, so batched admission scatters every
        row's pages in ONE update). int8 pools quantize here — per token
        per head, so the result is independent of how prefill was
        chunked or batched."""
        L, B, W, KV, Dh = tmp_k.shape
        n = page_ids.shape[0]
        ps = (B * W) // n
        kk = tmp_k.reshape(L, n, ps, KV, Dh).transpose(0, 1, 3, 2, 4)
        vv = tmp_v.reshape(L, n, ps, KV, Dh).transpose(0, 1, 3, 2, 4)
        if pool.quantized:
            kk, ksc = quantize_kv(kk)
            vv, vsc = quantize_kv(vv)
            pool = pool._replace(ks=pool.ks.at[:, page_ids].set(ksc),
                                 vs=pool.vs.at[:, page_ids].set(vsc))
        return pool._replace(
            k=pool.k.at[:, page_ids].set(kk.astype(pool.k.dtype)),
            v=pool.v.at[:, page_ids].set(vv.astype(pool.v.dtype)))

    @staticmethod
    def _gather_impl(pool: PagedKVCache, page_ids,
                     total_w: int) -> "qwen3.KVCache":
        """Assemble a contiguous B=1 prefill cache [L, 1, total_w, KV, Dh]
        from ``len(page_ids)`` shared pool pages (the prefix-cache hit
        path: the suffix then prefills on top of it). One compile per
        (page count, total_w) bucket. int8 pools dequantize here — the
        suffix attends over exactly what decode attends over."""
        L, _, KV, ps, Dh = pool.k.shape
        m = page_ids.shape[0]

        def gx(a, scl):
            g = a[:, page_ids]                         # [L, m, KV, ps, Dh]
            if scl is not None:
                g = (g.astype(jnp.float32)
                     * scl[:, page_ids][..., None]).astype(jnp.bfloat16)
            g = g.transpose(0, 1, 3, 2, 4).reshape(L, 1, m * ps, KV, Dh)
            return jnp.pad(g, ((0, 0), (0, 0), (0, total_w - m * ps),
                               (0, 0), (0, 0)))
        return qwen3.KVCache(gx(pool.k, pool.ks), gx(pool.v, pool.vs),
                             jnp.asarray(m * ps, jnp.int32))

    @staticmethod
    def _insert_impl(state: PagedState, b, token_row, n, logits_row,
                     presence_row, n_gen0, cap, samp_row) -> PagedState:
        dus = jax.lax.dynamic_update_slice
        if state.samp is not None:
            state = state._replace(
                samp=dus(state.samp, samp_row[None], (b, 0)))
        if state.logps is not None:
            # fresh residency: prompt columns carry no logprobs, and a
            # resumed request's previous logprobs were harvested at preempt
            state = state._replace(logps=dus(
                state.logps,
                jnp.zeros((1, state.logps.shape[1]), state.logps.dtype),
                (b, 0)))
        return state._replace(
            tokens=dus(state.tokens, token_row[None], (b, 0)),
            length=dus(state.length, jnp.reshape(n, (1,)), (b,)),
            last_logits=dus(state.last_logits, logits_row[None], (b, 0)),
            presence=dus(state.presence, presence_row[None], (b, 0)),
            num_generated=dus(state.num_generated,
                              jnp.reshape(n_gen0, (1,)), (b,)),
            cap=dus(state.cap, jnp.reshape(cap, (1,)), (b,)),
            finished=dus(state.finished, jnp.zeros((1,), bool), (b,)))

    def _make_admit(self):
        """ONE jitted program per (shared-page count, width bucket) doing
        gather-or-create → suffix prefill → page scatter → slot insert.
        Admissions used to be 4 separate dispatches; through the axon
        relay each dispatch costs ~ms of host time the device spends
        idle, and admissions sit on the critical path between decode
        chunks (measured: fusing cut the admit phase ~3x)."""
        cfg, ps, cdt = self.cfg, self.ps, self._tmp_cache_dtype

        @functools.partial(jax.jit, static_argnames=("m", "width"),
                           donate_argnums=(1,))
        def admit(params, state: PagedState, b, arr, mask, pages, n,
                  token_row, presence_row, n_gen0, cap, samp_row, *,
                  m: int, width: int) -> PagedState:
            pre = m * ps
            if m > 0:
                tmp = PagedEngine._gather_impl(state.pool, pages[:m], width)
            else:
                tmp = qwen3.KVCache.create(cfg, 1, width, cdt)
            # unembed ONLY the last prompt position (a width-2048 prompt's
            # full fp32 logits are ~1.3 GB)
            hidden, tmp = qwen3.forward(params, arr, cfg,
                                        attention_mask=mask, cache=tmp,
                                        return_hidden=True)
            pool = PagedEngine._scatter_impl(state.pool, tmp.k[:, :, pre:],
                                             tmp.v[:, :, pre:], pages[m:])
            state = state._replace(pool=pool)
            h_row = jax.lax.dynamic_index_in_dim(
                hidden, n - pre - 1, axis=1, keepdims=True)   # [1, 1, D]
            logits_row = qwen3.unembed(params, h_row,
                                       cfg)[0, 0].astype(jnp.float32)
            return PagedEngine._insert_impl(
                state, b, token_row, n, logits_row, presence_row,
                n_gen0, cap, samp_row)

        return admit

    def _make_admit_batch(self):
        """Batched admission: ``n`` FRESH (no shared prefix, no resumed
        generation) requests of one width bucket prefill as a single
        [n, width] forward + ONE page scatter + vectorized slot inserts.
        Sequential per-request admissions cost a full program dispatch +
        an underfilled B=1 forward each. Rows are independent (per-row
        masks), so batched == sequential.

        Only 5 small arrays cross the host boundary: the mask, the
        max_len token rows and the [n, V] presence reset are built
        in-device from ``arrs``/``ns`` (shipping them cost more admit
        wall time than the batching saved — ~1.2 MB presence per call
        through the relay)."""
        cfg, cdt = self.cfg, self._tmp_cache_dtype

        @functools.partial(jax.jit, static_argnames=("width",),
                           donate_argnums=(1,))
        def admit_batch(params, state: PagedState, bs, arrs, pages_flat,
                        ns, caps, samps, *, width: int) -> PagedState:
            n = arrs.shape[0]
            max_len = state.tokens.shape[1]
            masks = (jnp.arange(width)[None] < ns[:, None]).astype(
                jnp.int32)
            tmp = qwen3.KVCache.create(cfg, n, width, cdt)
            # unembed ONLY each row's last prompt position: the full
            # [n, width, 159k] fp32 logits would be ~0.65 GB per batch
            # (1.3 GB at width 2048) — it OOM'd the 64-slot pool config
            hidden, tmp = qwen3.forward(params, arrs, cfg,
                                        attention_mask=masks, cache=tmp,
                                        return_hidden=True)
            pool = PagedEngine._scatter_impl(state.pool, tmp.k, tmp.v,
                                             pages_flat)
            rows = jnp.arange(n)
            h_rows = hidden[rows, ns - 1][:, None]          # [n, 1, D]
            logits_rows = qwen3.unembed(params, h_rows,
                                        cfg)[:, 0].astype(jnp.float32)
            token_rows = jnp.pad(arrs, ((0, 0), (0, max_len - width)))
            if state.samp is not None:
                state = state._replace(samp=state.samp.at[bs].set(samps))
            if state.logps is not None:
                state = state._replace(logps=state.logps.at[bs].set(0.0))
            return state._replace(
                pool=pool,
                tokens=state.tokens.at[bs].set(token_rows),
                length=state.length.at[bs].set(ns),
                last_logits=state.last_logits.at[bs].set(logits_rows),
                presence=state.presence.at[bs].set(False),
                num_generated=state.num_generated.at[bs].set(0),
                cap=state.cap.at[bs].set(caps),
                finished=state.finished.at[bs].set(False))

        return admit_batch

    def _make_prefill_part(self):
        """Chunked-prefill step: gather the ``m`` pages already holding
        this prompt's KV, run the next page-aligned token chunk through
        the model on top of them, scatter the fresh pages back — and stop
        (no slot insert, no logits kept). The final chunk goes through the
        normal ``admit`` program with these pages as its shared prefix, so
        chunked and whole-prompt prefill compute identical KV (bit-equal
        for bf16 pools; int8 pools quantize per token so the STORED pages
        are chunk-independent, but a later chunk attends over the
        dequantized earlier pages, so logits can differ at int8's noise
        floor)."""
        cfg, ps, cdt = self.cfg, self.ps, self._tmp_cache_dtype

        @functools.partial(jax.jit, static_argnames=("m", "width"),
                           donate_argnums=(1,))
        def part(params, state: PagedState, arr, mask, pages, *, m: int,
                 width: int) -> PagedState:
            pre = m * ps
            if m > 0:
                tmp = PagedEngine._gather_impl(state.pool, pages[:m], width)
            else:
                tmp = qwen3.KVCache.create(cfg, 1, width, cdt)
            _, tmp = qwen3.forward(params, arr, cfg, attention_mask=mask,
                                   cache=tmp)
            pool = PagedEngine._scatter_impl(state.pool, tmp.k[:, :, pre:],
                                             tmp.v[:, :, pre:], pages[m:])
            return state._replace(pool=pool)

        return part

    def _prefill_slot(self, state: PagedState, b: int, ids: Sequence[int],
                      pages: List[int], prev_gen: Sequence[int],
                      shared: int = 0, cap: int = 1 << 30,
                      samp=None) -> PagedState:
        """Prefill slot ``b``. The first ``shared`` entries of ``pages``
        are prefix-cache hits already holding this prompt's KV: only the
        suffix runs through the model (attending over the gathered shared
        pages), and only the fresh pages are scattered back."""
        n = len(ids)
        if n >= self.max_len:
            raise ValueError(f"prompt length {n} leaves no room to "
                             f"generate (max_len={self.max_len})")
        width = _ceil_div(n, self.ps) * self.ps
        pre = shared * self.ps
        ws = width - pre                         # suffix width (>= 1 token)
        arr = np.zeros((1, ws), np.int32)
        arr[0, :n - pre] = ids[pre:]
        mask = (np.arange(width) < n).astype(np.int32)[None]
        token_row = np.zeros((self.max_len,), np.int32)
        token_row[:n] = ids
        # resume parity after preemption: previously generated tokens stay
        # in the repetition-penalty set and in the request-total counter
        # (min_tokens / EOS suppression see the true count)
        presence_row = np.zeros((self.cfg.vocab_size,), bool)
        presence_row[list(prev_gen)] = True
        return self._admit(
            self.params, state, jnp.asarray(b, jnp.int32),
            jnp.asarray(arr), jnp.asarray(mask),
            jnp.asarray(pages[:width // self.ps], jnp.int32),
            jnp.asarray(n, jnp.int32), jnp.asarray(token_row),
            jnp.asarray(presence_row),
            jnp.asarray(len(prev_gen), jnp.int32),
            jnp.asarray(min(cap, 1 << 30), jnp.int32),
            jnp.asarray(samp or self._default_samp(), jnp.float32),
            m=shared, width=width)

    def _flush_admissions(self, state: PagedState, pending,
                          slot_pages) -> PagedState:
        """Run the deferred zero-shared-prefix prefills: group by width
        bucket, flush each group in batch sizes {8, 4, 2} (greedy),
        singles through the per-slot program. Compile count stays
        bounded: one program per (batch size, width) pair."""
        groups: dict = {}
        for b, r in pending:
            width = _ceil_div(len(r["ids"]), self.ps) * self.ps
            if r["gen"] or width > self.admit_batch_max_width:
                # single-row program for: resumed-after-preemption rows
                # (they carry a presence set + generation count), and
                # LONG prompts — their prefill compute dwarfs dispatch
                # overhead, so batching them only multiplies the
                # (batch size, width) compile buckets
                state = self._prefill_slot(state, b, r["ids"],
                                           slot_pages[b], r["gen"],
                                           0, cap=r["cap"],
                                           samp=r.get("samp"))
                continue
            groups.setdefault(width, []).append((b, r))
        for width, jobs in groups.items():
            i = 0
            while i < len(jobs):
                sz = next(s for s in (8, 4, 2, 1) if len(jobs) - i >= s)
                chunk = jobs[i:i + sz]
                i += sz
                if sz == 1:
                    b, r = chunk[0]
                    state = self._prefill_slot(state, b, r["ids"],
                                               slot_pages[b], r["gen"],
                                               0, cap=r["cap"],
                                               samp=r.get("samp"))
                    continue
                self.n_batched_prefills += sz
                state = self._prefill_batch(state, chunk, slot_pages,
                                            width)
        return state

    def _prefill_batch(self, state: PagedState, jobs, slot_pages,
                       width: int) -> PagedState:
        """Pack ``jobs`` (list of (slot, request), all fresh) into one
        batched admission program call (see _make_admit_batch)."""
        n = len(jobs)
        ps = self.ps
        npg = width // ps
        arrs = np.zeros((n, width), np.int32)
        bs = np.empty(n, np.int32)
        ns = np.empty(n, np.int32)
        caps = np.empty(n, np.int32)
        samps = np.empty((n, 4), np.float32)
        pages_flat = np.empty(n * npg, np.int32)
        for i, (b, r) in enumerate(jobs):
            ids = r["ids"]
            ln = len(ids)
            if ln >= self.max_len:
                raise ValueError(f"prompt length {ln} leaves no room to "
                                 f"generate (max_len={self.max_len})")
            arrs[i, :ln] = ids
            bs[i] = b
            ns[i] = ln
            caps[i] = min(r["cap"], 1 << 30)
            samps[i] = r.get("samp") or self._default_samp()
            pages_flat[i * npg:(i + 1) * npg] = slot_pages[b][:npg]
        return self._admit_batch(
            self.params, state, jnp.asarray(bs), jnp.asarray(arrs),
            jnp.asarray(pages_flat), jnp.asarray(ns), jnp.asarray(caps),
            jnp.asarray(samps), width=width)

    # ------------------------------------------------------------------
    # Scheduler
    # ------------------------------------------------------------------

    def _pages_needed(self, resident: int) -> int:
        """Pages to cover ``resident`` tokens plus one decode chunk."""
        horizon = min(resident + self.chunk_steps + 1, self.max_len)
        return _ceil_div(horizon, self.ps)

    def generate(self, ids: Sequence[int], max_new: Optional[int] = None,
                 state=None, **_) -> dict:
        """DecodeEngine-compatible single-request API — STATELESS: pass
        the full context each call. Multi-turn sessions stay incremental
        through the persistent prefix cache: a finished request registers
        its full prompt+generated pages, so the next turn's context (which
        extends this one) prefills only its new suffix. This is exactly
        how the reference serves SoulX-Podcast through vLLM
        (soulxpodcast/engine/llm_engine.py:78-114: enable_prefix_caching
        + a full-prompt generate per turn). ``state`` is accepted and
        ignored for drop-in orchestrator compatibility."""
        gen = self.serve([list(ids)], max_new=max_new)[0]
        out = {"token_ids": gen, "state": None}
        if self.return_logprobs:
            out["logprobs"] = self.request_logprobs[0]
        return out

    def serve(self, prompts: Sequence[Sequence[int]],
              max_new: Optional[int] = None,
              max_new_per_request: Optional[Sequence[int]] = None,
              on_tokens=None,
              on_logprobs=None,
              on_chunk=None,
              sampling_per_request: Optional[Sequence[Optional[dict]]]
              = None,
              ttft_deadline_s: Optional[float] = None,
              deadline_per_request: Optional[Sequence[Optional[float]]]
              = None,
              arrival_per_request: Optional[Sequence[float]] = None
              ) -> List[List[int]]:
        """Run every prompt to completion through the slot pool; returns
        generated token ids per prompt (order-preserving).

        ``on_tokens(rid, new_token_ids, done)``: optional streaming
        callback (the vLLM incremental-response capability) invoked at
        decode-chunk granularity — the host only observes progress at
        chunk boundaries — with each request's newly generated ids, in
        order, exactly once per token (preemption/resume included: tokens
        a preempted stream already emitted are not re-emitted). The
        concatenation of a request's callbacks equals its entry in the
        returned outputs. Use it to pipeline downstream work (e.g. one
        StreamingTokenToWav per request for concurrent streaming TTS)
        while decode continues.

        With ``PagedEngine(return_logprobs=True)`` each generated token's
        log-probability under the sampler's closed-form output
        distribution (vLLM ``SamplingParams.logprobs``) is recorded;
        after serve() returns, ``self.request_logprobs[rid]`` holds one
        float per token of ``outputs[rid]`` (preemption/resume exact —
        a resumed stream keeps the logprobs it already emitted).

        ``on_logprobs(rid, new_logprobs, done)``: optional streaming
        companion to ``on_tokens`` (requires ``return_logprobs=True``) —
        invoked at the same chunk boundaries with the logprobs aligned
        one-to-one with that call's ``new_token_ids``, so streaming
        consumers (e.g. per-token-confidence TTS gating) see them
        incrementally instead of waiting for serve() to return.

        ``on_chunk()``: invoked once per scheduler pass AFTER every
        per-request callback of that chunk, i.e. the barrier at which a
        downstream consumer has seen all fresh tokens of the chunk — the
        hook a multi-session coordinator uses to run one BATCHED
        downstream tick (e.g. batched flow+vocoder synthesis across all
        dirty TTS sessions, infer/tts_serve.py) instead of per-request
        work inside ``on_tokens``. Host time spent inside is recorded in
        ``phase_seconds['downstream']``.

        ``ttft_deadline_s`` / ``deadline_per_request``: TTFT deadlines
        (seconds from enqueue) enabling LOAD SHEDDING under overload — a
        queued request whose deadline passes before it produced any
        token is dropped (``outputs[rid] == []``,
        ``request_metrics[rid]['shed'] is True``, ``on_tokens(rid, [],
        True)`` closes its stream) so pool+slot capacity goes to
        requests that can still meet theirs. A request that reached its
        first token is never shed (the client is already consuming it).
        Pair with ``admission_policy='deadline'`` (earliest-deadline-
        first) to also ORDER admission by urgency; shedding itself works
        under any policy. ``self.shed_requests`` counts drops.

        ``arrival_per_request``: open-loop arrival process — seconds
        from serve start at which each request becomes visible to the
        scheduler (0/None = immediately). A request joins the admission
        queue only once arrived; its TTFT/e2e clocks and TTFT deadline
        start at ARRIVAL (the latency a client actually sees). With no
        queued work and no live slots the scheduler sleeps until the
        next arrival instead of spinning empty decode chunks. This is
        the load-generator interface for production-shaped benchmarks
        (Poisson arrivals) — the all-at-t0 default measures saturated
        batch throughput instead."""
        cap_default = max_new or self.sp.max_tokens
        if on_logprobs is not None and not self.return_logprobs:
            raise ValueError("on_logprobs needs "
                             "PagedEngine(return_logprobs=True)")
        if on_logprobs is not None and on_tokens is None:
            raise ValueError("on_logprobs is a companion callback: pass "
                             "on_tokens too (emission is aligned to it)")
        if sampling_per_request is not None \
                and not self.per_request_sampling:
            raise ValueError("sampling_per_request needs "
                             "PagedEngine(per_request_sampling=True)")
        t_serve0 = time.perf_counter()
        queue = _AdmissionQueue(self.admission_policy)
        pending_arrivals: List[dict] = []      # future arrivals, by t_arr
        for rid, p in enumerate(prompts):
            samp = None
            if sampling_per_request is not None \
                    and sampling_per_request[rid]:
                o = dict(sampling_per_request[rid])
                d = self._default_samp()
                samp = [float(o.pop("temperature", d[0])),
                        float(o.pop("top_p", d[1])),
                        float(o.pop("repetition_penalty", d[2])),
                        float(o.pop("min_tokens", d[3]))]
                if o:
                    raise ValueError(f"unknown sampling overrides: "
                                     f"{sorted(o)} (top_k/RAS are "
                                     f"engine-global)")
            dl = (deadline_per_request[rid]
                  if deadline_per_request is not None else ttft_deadline_s)
            arr = (float(arrival_per_request[rid] or 0.0)
                   if arrival_per_request is not None else 0.0)
            t_arr = t_serve0 + arr
            r = {"rid": rid, "ids": list(p), "plen0": len(p),
                 "cap": (max_new_per_request[rid]
                         if max_new_per_request is not None
                         else cap_default),
                 "samp": samp,
                 "gen": [], "lps": [], "n_emitted": 0,
                 "t_enq": t_arr, "t_arr": t_arr,
                 "dl": (t_arr + dl if dl is not None else None)}
            if arr <= 0.0:
                queue.append(r)
            else:
                pending_arrivals.append(r)
        pending_arrivals.sort(key=lambda r: (r["t_arr"], r["rid"]))
        outputs: List[Optional[List[int]]] = [None] * len(prompts)
        # per-token logprobs, parallel to outputs (return_logprobs only)
        self.request_logprobs = [None] * len(prompts)
        self.preemptions = 0               # serve-level metrics
        self.shed_requests = 0
        self.prefix_hits = 0
        self.prefix_hit_tokens = 0
        any_deadlines = (ttft_deadline_s is not None
                         or (deadline_per_request is not None
                             and any(d is not None
                                     for d in deadline_per_request)))
        # wall-time anatomy of the scheduler loop (decode_sync includes the
        # device chunk; everything else is host/dispatch time the device
        # spends idle or pipelined)
        self.phase_seconds = {"grow": 0.0, "admit": 0.0,
                              "decode_sync": 0.0, "retire": 0.0,
                              "downstream": 0.0}
        self.n_chunks = 0
        # device-side decode steps actually executed (early chunk exits
        # make this < n_chunks * chunk_steps); tokens/step over live slots
        # is the occupancy metric
        self.n_decode_steps = 0
        self.n_prefills = 0
        self.n_prefill_chunks = 0
        self.n_batched_prefills = 0
        # per-request latency records, chunk-granularity (the host only
        # observes progress at decode-chunk boundaries): ttft = enqueue ->
        # end of the first chunk that produced this request's token(s);
        # e2e = enqueue -> retire. Preemption keeps the ORIGINAL enqueue
        # and first-token stamps (resume is invisible to the client).
        self.request_metrics: List[Optional[dict]] = [None] * len(prompts)
        # pool, registry and device state PERSIST across serve() calls:
        # pages registered by one call (incl. full prompt+generated pages
        # at retire) are prefix-cache hits for the next, which is what
        # makes stateless multi-turn generate() incremental
        if self._state is None:
            self._pool, self._registry = self._make_runtime()
            self._state = self.new_state()
        registry = self._registry
        pool = self._pool
        state = self._state
        # if serve raises mid-loop the local handle may be donated/stale;
        # leaving _state None makes the next call rebuild pool+registry+
        # state as a consistent trio (restored at normal completion)
        self._state = None
        meta: List[Optional[dict]] = [None] * self.slots
        slot_pages: List[List[int]] = [[] for _ in range(self.slots)]
        join_seq = 0
        bt = np.zeros((self.slots, self.max_pages), np.int32)
        shardings = self.state_shardings()
        bt_sharding = None if shardings is None else shardings.block_tables

        def release(b):
            pool.free(slot_pages[b])
            slot_pages[b] = []
            bt[b, :] = 0
            meta[b] = None

        # host mirrors of state.length / state.tokens, refreshed once per
        # chunk in ONE batched device_get (per-slot device reads are
        # relay round-trips — CLAUDE.md)
        lengths_h = np.zeros((self.slots,), np.int32)
        tokens_h = np.zeros((self.slots, self.max_len), np.int32)
        # f32 to match the device mirror; only needed with logprobs on
        lps_h = (np.zeros((self.slots, self.max_len), np.float32)
                 if self.return_logprobs else None)

        def preempt(b, state):
            """vLLM recompute preemption: fold generated tokens back into
            the request and re-queue it at the front."""
            self.preemptions += 1
            r = meta[b]
            L = int(lengths_h[b])
            gen = tokens_h[b, r["plen"]:L].tolist()
            keep = min(len(r["gen"]) + len(gen), r["cap"]) - len(r["gen"])
            if self.return_logprobs:
                r["lps"] += lps_h[b, r["plen"]:L].tolist()[:keep]
            r["gen"] += gen[:keep]
            if len(r["gen"]) >= r["cap"]:
                outputs[r["rid"]] = r["gen"]   # cap reached mid-chunk: done
                if self.return_logprobs:
                    self.request_logprobs[r["rid"]] = r["lps"]
                if on_tokens is not None:
                    on_tokens(r["rid"], r["gen"][r["n_emitted"]:], True)
                    if on_logprobs is not None:
                        on_logprobs(r["rid"], r["lps"][r["n_emitted"]:],
                                    True)
                    r["n_emitted"] = len(r["gen"])
                t_done = time.perf_counter()
                self.request_metrics[r["rid"]] = {
                    "ttft_s": r.get("t_first", t_done) - r["t_enq"],
                    "e2e_s": t_done - r["t_enq"],
                    "n_prompt": r["plen0"], "n_gen": len(r["gen"])}
            else:
                r["ids"] = r["ids"] + gen[:keep]
                queue.appendleft(r)
            release(b)
            return self._finish_slot(state, jnp.asarray(b, jnp.int32))

        while queue or pending_arrivals or any(m is not None for m in meta):
            t_phase = time.perf_counter()
            # 0. open-loop arrivals: requests whose arrival time passed
            # join the admission queue; with nothing queued and nothing
            # resident, sleep to the next arrival instead of spinning
            # empty decode chunks
            if pending_arrivals:
                if (not queue and all(m is None for m in meta)
                        and pending_arrivals[0]["t_arr"] > t_phase):
                    time.sleep(pending_arrivals[0]["t_arr"] - t_phase)
                    t_phase = time.perf_counter()
                while (pending_arrivals
                       and pending_arrivals[0]["t_arr"] <= t_phase):
                    queue.append(pending_arrivals.pop(0))
            # 1. grow live slots (oldest joins first — they keep latency)
            order = sorted((b for b in range(self.slots)
                            if meta[b] is not None),
                           key=lambda b: meta[b]["join"])
            for b in order:
                if meta[b] is None:
                    continue
                resident = int(lengths_h[b])
                need = self._pages_needed(resident) - len(slot_pages[b])
                while need > 0:
                    got = registry.alloc(pool, need)
                    if got is not None:
                        start = len(slot_pages[b])
                        slot_pages[b].extend(got)
                        bt[b, start:start + len(got)] = got
                        break
                    victims = [j for j in range(self.slots)
                               if j != b and meta[j] is not None]
                    if not victims:
                        # last resort before giving up: reclaim pages held
                        # by half-prefilled queued requests (they recompute
                        # from scratch later — recompute preemption applied
                        # to chunked prefill)
                        if any(rq.get("pf") for rq in queue):
                            for rq in queue:
                                if rq.get("pf"):
                                    pool.free(rq.pop("pf"))
                            continue
                        raise RuntimeError(
                            "page pool exhausted by a single stream — "
                            "increase num_pages")
                    victim = max(victims, key=lambda j: meta[j]["join"])
                    state = preempt(victim, state)

            t_now = time.perf_counter()
            self.phase_seconds["grow"] += t_now - t_phase
            t_phase = t_now

            # 1b. load shedding: drop queued requests whose TTFT deadline
            # passed before any token was produced — BEFORE prefill so no
            # compute is spent on doomed work; their chunked-prefill pages
            # (if any) return to the pool
            if any_deadlines:
                for r in queue.shed_expired(t_now):
                    if r.get("pf"):
                        pool.free(r.pop("pf"))
                    self.shed_requests += 1
                    outputs[r["rid"]] = []
                    if self.return_logprobs:
                        self.request_logprobs[r["rid"]] = []
                    self.request_metrics[r["rid"]] = {
                        "shed": True, "wait_s": t_now - r["t_enq"],
                        "n_prompt": r["plen0"], "n_gen": 0}
                    if on_tokens is not None:
                        on_tokens(r["rid"], [], True)
                        if on_logprobs is not None:
                            on_logprobs(r["rid"], [], True)

            # 2a. chunked prefill: advance the head-of-queue request by at
            # most ONE prefill_chunk of page-aligned prompt tokens per
            # scheduler pass, so live slots get a decode chunk between
            # prefill pieces (vLLM chunked prefill — bounds the decode
            # stall a long prompt inflicts on running streams). The pieces
            # accumulate in r["pf"]; the final piece goes through the
            # normal admission below with r["pf"] as its shared prefix.
            if self.prefill_chunk is not None and queue:
                r = queue[0]
                n = len(r["ids"])
                pf = r.setdefault("pf", [])
                if not pf and self.prefix_sharing:
                    hits = registry.match(r["ids"], self.ps,
                                          (n - 1) // self.ps)
                    pool.share(hits)           # the request's own reference
                    pf.extend(hits)
                    if hits:
                        self.prefix_hits += 1
                        self.prefix_hit_tokens += len(hits) * self.ps
                if n - len(pf) * self.ps > self.prefill_chunk:
                    # fresh pages this piece; >=1 token stays for admission
                    cp = min(self.prefill_chunk // self.ps,
                             (n - 1) // self.ps - len(pf))
                    got = registry.alloc(pool, cp) if cp > 0 else None
                    if got is not None:
                        m = len(pf)
                        pages = pf + got
                        width = len(pages) * self.ps
                        arr = np.asarray(r["ids"][m * self.ps:width],
                                         np.int32)[None]
                        state = self._prefill_part(
                            self.params, state, jnp.asarray(arr),
                            jnp.ones((1, width), jnp.int32),
                            jnp.asarray(pages, jnp.int32),
                            m=m, width=width)
                        pf.extend(got)
                        self.n_prefill_chunks += 1
                        if self.prefix_sharing:
                            registry.register(r["ids"][:width], pages,
                                              self.ps, pool)

            # 2. admit queued requests into free slots. Allocation and
            # bookkeeping stay sequential (pool state feeds each next
            # decision); the PREFILL compute of zero-shared-prefix
            # admissions is deferred and flushed in same-width batches
            # (one [n, width] forward instead of n dispatches — rows are
            # independent, so batched == sequential). Prefix-hit rows
            # keep the single-row gather+suffix program.
            pending = []                       # (slot, request) — shared==0
            for b in range(self.slots):
                if meta[b] is not None or not queue:
                    continue
                r = queue[0]
                n = len(r["ids"])
                if "pf" in r:                  # chunked-prefill resident KV
                    if n - len(r["pf"]) * self.ps > (self.prefill_chunk
                                                     or n):
                        break                  # still mid-prefill
                    shared = r["pf"]
                else:
                    shared = []
                    if self.prefix_sharing:
                        # cap so >=1 suffix token remains to prefill
                        shared = registry.match(r["ids"], self.ps,
                                                (n - 1) // self.ps)
                        pool.share(shared)     # the stream's own reference
                got = registry.alloc(pool, self._pages_needed(n)
                                     - len(shared))
                if got is None:
                    if "pf" not in r:
                        pool.free(shared)
                    break                      # pool full; retry next chunk
                queue.popleft()
                if "pf" not in r and shared:
                    self.prefix_hits += 1
                    self.prefix_hit_tokens += len(shared) * self.ps
                r.pop("pf", None)
                slot_pages[b] = shared + got
                bt[b, :len(slot_pages[b])] = slot_pages[b]
                bt[b, len(slot_pages[b]):] = 0
                if shared:
                    state = self._prefill_slot(state, b, r["ids"],
                                               slot_pages[b], r["gen"],
                                               len(shared), cap=r["cap"],
                                               samp=r.get("samp"))
                else:
                    pending.append((b, r))
                self.n_prefills += 1
                if self.prefix_sharing:
                    registry.register(r["ids"], slot_pages[b], self.ps,
                                      pool)
                meta[b] = {**r, "plen": n, "join": join_seq,
                           "ngen0": len(r["gen"])}
                join_seq += 1
                lengths_h[b] = n
            state = self._flush_admissions(state, pending, slot_pages)

            t_now = time.perf_counter()
            self.phase_seconds["admit"] += t_now - t_phase
            t_phase = t_now

            # 3. one decode chunk. With requests still queued, the chunk
            # early-exits once enough slots retire to seat them (capped by
            # chunk_exit_free); with an empty queue it runs to the
            # boundary (slots + 1 can never be reached)
            bt_dev = jnp.asarray(bt)
            if bt_sharding is not None:
                bt_dev = jax.device_put(bt_dev, bt_sharding)
            state = state._replace(block_tables=bt_dev)
            if self.chunk_exit_free and queue:
                exit_free = max(1, min(self.chunk_exit_free, len(queue)))
            else:
                exit_free = self.slots + 1
            state, steps_dev = self._decode(
                self.params, state,
                jnp.asarray(self.chunk_steps, jnp.int32),
                jnp.asarray(exit_free, jnp.int32))
            self.n_chunks += 1

            # 4. retire finished slots (ONE host transfer for every host
            # mirror — per-slot scalars AND the token rows; lengths_h /
            # tokens_h carry into the next grow pass). Caps are enforced
            # device-side (state.cap), so `finished` is exact.
            mirrors = [state.length, state.num_generated, state.finished,
                       state.tokens, steps_dev]
            if self.return_logprobs:
                mirrors.append(state.logps)
            got = [np.array(a) for a in jax.device_get(tuple(mirrors))]
            lengths_h, ngen, fin, tokens_h, steps_h = got[:5]
            if self.return_logprobs:
                lps_h = got[5]
            self.n_decode_steps += int(steps_h)
            t_now = time.perf_counter()
            self.phase_seconds["decode_sync"] += t_now - t_phase
            t_phase = t_now
            for b in range(self.slots):
                # first-token stamp (chunk granularity): this chunk grew
                # the request beyond what it had at admission
                r = meta[b]
                if r is None:
                    continue
                if "t_first" not in r and int(ngen[b]) > r.get("ngen0", 0):
                    r["t_first"] = t_now
                if on_tokens is not None:
                    # stream this chunk's new tokens: request-total ngen
                    # counts across preemptions; tokens before len(gen)
                    # came from a previous residency (already in r["gen"]),
                    # the rest sit in this residency's token row
                    total_now = min(int(ngen[b]), r["cap"])
                    if total_now > r["n_emitted"]:
                        lo, g = r["n_emitted"], len(r["gen"])
                        new = list(r["gen"][lo:min(total_now, g)])
                        if total_now > g:
                            s0 = r["plen"] + max(lo, g) - g
                            new += tokens_h[
                                b, s0:r["plen"] + total_now - g].tolist()
                        if on_logprobs is not None:
                            nl = list(r["lps"][lo:min(total_now, g)])
                            if total_now > g:
                                s0 = r["plen"] + max(lo, g) - g
                                nl += lps_h[
                                    b, s0:r["plen"] + total_now - g
                                ].tolist()
                            on_logprobs(r["rid"], nl, False)
                        r["n_emitted"] = total_now
                        on_tokens(r["rid"], new, False)
            done = [b for b in range(self.slots) if meta[b] is not None
                    and fin[b]]
            for b in done:
                r = meta[b]
                # min() guards the (impossible under device caps) overshoot
                total = min(int(ngen[b]), r["cap"])
                fresh = total - len(r["gen"])
                start = r["plen"]
                if self.return_logprobs:
                    r["lps"] += lps_h[b, start:start + fresh].tolist()
                    self.request_logprobs[r["rid"]] = r["lps"]
                r["gen"] += tokens_h[b, start:start + fresh].tolist()
                outputs[r["rid"]] = r["gen"]
                if on_tokens is not None:
                    on_tokens(r["rid"], r["gen"][r["n_emitted"]:], True)
                    if on_logprobs is not None:
                        on_logprobs(r["rid"], r["lps"][r["n_emitted"]:],
                                    True)
                    r["n_emitted"] = len(r["gen"])
                self.request_metrics[r["rid"]] = {
                    "ttft_s": r.get("t_first", t_now) - r["t_enq"],
                    "e2e_s": t_now - r["t_enq"],
                    "n_prompt": r["plen0"], "n_gen": len(r["gen"])}
                if self.prefix_sharing:
                    # register the full pages of prompt+GENERATED tokens
                    # (KV of a page is determined by its token prefix), so
                    # a later context extending this one — the multi-turn
                    # generate() pattern — prefills only its new suffix
                    L = int(lengths_h[b])
                    registry.register(tokens_h[b, :L].tolist(),
                                      slot_pages[b], self.ps, pool)
                release(b)
            self.phase_seconds["retire"] += time.perf_counter() - t_phase
            if on_chunk is not None:
                t_phase = time.perf_counter()
                on_chunk()
                self.phase_seconds["downstream"] += (time.perf_counter()
                                                     - t_phase)
        self._state = state
        return outputs  # type: ignore[return-value]
