"""Paged-KV engine: block-table serving matches contiguous-cache decode,
including under forced preemption (vLLM recompute mode)."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from speech_distill_tpu.core.config import SamplingParams, qwen3_tiny
from speech_distill_tpu.models import qwen3


def _setup(vocab=48, seed=3, max_tokens=6):
    cfg = qwen3_tiny(vocab)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False})
    params = qwen3.init_params(jax.random.PRNGKey(seed), cfg)
    # greedy argmax decode: deterministic, robust to fp noise
    sp = SamplingParams(stop_token_ids=(vocab - 1,), max_tokens=max_tokens,
                        min_tokens=max_tokens, top_k=1, temperature=1.0,
                        use_ras=False, repetition_penalty=1.0)
    return cfg, params, sp


def _ref_outputs(params, cfg, sp, prompts, max_new):
    from speech_distill_tpu.infer.engine import DecodeEngine
    ref = []
    for p in prompts:
        eng = DecodeEngine(params, cfg, sp, max_len=64, prefill_bucket=8,
                           cache_dtype=jnp.float32)
        ref.append(eng.generate(p)["token_ids"][:max_new])
    return ref


def test_paged_forward_matches_contiguous_decode():
    """Single stream, token by token: paged_forward logits == the
    contiguous KVCache decode path."""
    from speech_distill_tpu.infer.paged import PagedKVCache, paged_forward

    cfg, params, _ = _setup()
    rng = np.random.default_rng(0)
    prompt = rng.integers(1, cfg.vocab_size - 2, 5).tolist()
    ps, n_pages = 8, 6

    # contiguous reference: feed tokens one at a time
    cache = qwen3.KVCache.create(cfg, 1, ps * n_pages, jnp.float32)
    pool = PagedKVCache.create(cfg, n_pages, ps, jnp.float32)
    bt = jnp.arange(n_pages, dtype=jnp.int32)[None]   # identity table
    length = jnp.zeros((1,), jnp.int32)
    live = jnp.ones((1,), bool)
    for t, tok in enumerate(prompt):
        ref_logits, cache = qwen3.forward(
            params, jnp.asarray([[tok]], jnp.int32), cfg, cache=cache)
        got_logits, pool = paged_forward(
            params, jnp.asarray([tok], jnp.int32), cfg, pool, bt,
            length, live, attn_impl="xla")
        np.testing.assert_allclose(np.asarray(got_logits[0]),
                                   np.asarray(ref_logits[0, 0]),
                                   atol=1e-4, rtol=1e-4)
        length = length + 1


def test_paged_serve_matches_per_stream_decode():
    """5 prompts through 2 slots (mid-flight join/leave) == single-stream
    engine run prompt-by-prompt."""
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup()
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, cfg.vocab_size - 2,
                            int(rng.integers(3, 11))).tolist()
               for _ in range(5)]
    ref = _ref_outputs(params, cfg, sp, prompts, 6)

    eng = PagedEngine(params, cfg, sp, slots=2, max_len=64, page_size=8,
                      chunk_steps=3, cache_dtype=jnp.float32,
                      attn_impl="xla")
    got = eng.serve(prompts, max_new=6)
    assert got == ref


def test_paged_serve_under_preemption():
    """A pool too small for all slots forces recompute preemption; outputs
    must still equal the unconstrained run (greedy decode is deterministic,
    and resume re-prefills prompt+generated at the same positions)."""
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup(seed=5, max_tokens=8)
    rng = np.random.default_rng(2)
    prompts = [rng.integers(1, cfg.vocab_size - 2, 9).tolist()
               for _ in range(4)]
    ref = _ref_outputs(params, cfg, sp, prompts, 8)

    # 7 pages of 8 across 3 slots: growing past 9+4 resident tokens per
    # slot exhausts the pool -> youngest stream preempts and resumes
    eng = PagedEngine(params, cfg, sp, slots=3, max_len=48, page_size=8,
                      num_pages=7, chunk_steps=4,
                      cache_dtype=jnp.float32, attn_impl="xla")
    got = eng.serve(prompts, max_new=8)
    assert eng.preemptions > 0, "config failed to force preemption"
    assert got == ref


def test_paged_per_request_caps_and_pool_drains():
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup(seed=4)
    rng = np.random.default_rng(1)
    prompts = [rng.integers(1, cfg.vocab_size - 2, 6).tolist()
               for _ in range(4)]
    caps = [2, 5, 3, 7]
    eng = PagedEngine(params, cfg, sp, slots=4, max_len=64, page_size=8,
                      chunk_steps=2, cache_dtype=jnp.float32,
                      attn_impl="xla")
    full = eng.serve(prompts, max_new=8)
    ref = [f[:c] for f, c in zip(full, caps)]
    capped = eng.serve(prompts, max_new_per_request=caps)
    assert capped == ref


def test_allocator_refcounts():
    from speech_distill_tpu.infer.paged import PagePool

    pool = PagePool(4)
    a = pool.alloc(2)
    b = pool.alloc(2)
    assert pool.alloc(1) is None
    pool.share(a)
    pool.free(a)
    assert pool.free_pages == 0          # still referenced once
    pool.free(a)
    pool.free(b)
    assert pool.free_pages == 4


def test_prefix_sharing_parity_and_hits():
    """Prompts sharing a page-aligned prefix: later admits reuse the
    registered pages (suffix-only prefill) and outputs still equal the
    per-stream reference."""
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup(seed=7)
    rng = np.random.default_rng(3)
    common = rng.integers(1, cfg.vocab_size - 2, 16).tolist()
    prompts = [common + rng.integers(1, cfg.vocab_size - 2, k).tolist()
               for k in (3, 5, 7, 2)]
    # one full-match edge case: prompt == the shared prefix exactly
    prompts.append(list(common))
    ref = _ref_outputs(params, cfg, sp, prompts, 6)

    eng = PagedEngine(params, cfg, sp, slots=2, max_len=64, page_size=8,
                      chunk_steps=3, cache_dtype=jnp.float32,
                      attn_impl="xla")
    got = eng.serve(prompts, max_new=6)
    assert got == ref
    assert eng.prefix_hits >= 3
    assert eng.prefix_hit_tokens >= 3 * 16


def test_prefix_sharing_off_matches_on():
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup(seed=9)
    rng = np.random.default_rng(4)
    common = rng.integers(1, cfg.vocab_size - 2, 8).tolist()
    prompts = [common + rng.integers(1, cfg.vocab_size - 2, 4).tolist()
               for _ in range(3)]
    kw = dict(slots=2, max_len=64, page_size=8, chunk_steps=4,
              cache_dtype=jnp.float32, attn_impl="xla")
    on = PagedEngine(params, cfg, sp, **kw).serve(prompts, max_new=5)
    off = PagedEngine(params, cfg, sp, prefix_sharing=False,
                      **kw).serve(prompts, max_new=5)
    assert on == off


def test_registry_eviction_under_pool_pressure():
    """Registered pages (held only by the registry) are evicted LRU
    before live streams get preempted; outputs stay exact."""
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup(seed=11, max_tokens=8)
    rng = np.random.default_rng(6)
    prompts = [rng.integers(1, cfg.vocab_size - 2, 8).tolist()
               for _ in range(5)]
    ref = _ref_outputs(params, cfg, sp, prompts, 8)

    # 6 pages of 8, 2 slots: each finished prompt leaves 1 registered
    # page; without eviction the pool would run dry on later admits
    eng = PagedEngine(params, cfg, sp, slots=2, max_len=32, page_size=8,
                      num_pages=6, chunk_steps=4,
                      cache_dtype=jnp.float32, attn_impl="xla")
    got = eng.serve(prompts, max_new=8)
    assert got == ref


def test_chunked_prefill_matches_whole_prompt():
    """Long prompts prefilled in page-aligned chunks (decode chunks of
    live slots interleaved between pieces) produce identical outputs to
    whole-prompt prefill (vLLM chunked prefill)."""
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup(seed=13)
    rng = np.random.default_rng(7)
    lens = (29, 4, 33, 7, 18)
    prompts = [rng.integers(1, cfg.vocab_size - 2, k).tolist()
               for k in lens]
    ref = _ref_outputs(params, cfg, sp, prompts, 6)

    eng = PagedEngine(params, cfg, sp, slots=2, max_len=64, page_size=8,
                      chunk_steps=3, cache_dtype=jnp.float32,
                      attn_impl="xla", prefill_chunk=8)
    got = eng.serve(prompts, max_new=6)
    assert got == ref
    # the 29er needs ceil((29-1)/8)=3 part pieces, the 33er 4, the 18er 2
    assert eng.n_prefill_chunks >= 5


def test_chunked_prefill_with_prefix_sharing():
    """Chunked prefill composes with the prefix cache: a repeated long
    prompt's second admission rides the registered pages (including ones
    registered by the first prompt's partial chunks)."""
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup(seed=15)
    rng = np.random.default_rng(8)
    long = rng.integers(1, cfg.vocab_size - 2, 27).tolist()
    prompts = [long,
               rng.integers(1, cfg.vocab_size - 2, 5).tolist(),
               list(long),
               long + rng.integers(1, cfg.vocab_size - 2, 3).tolist()]
    ref = _ref_outputs(params, cfg, sp, prompts, 6)

    eng = PagedEngine(params, cfg, sp, slots=2, max_len=64, page_size=8,
                      chunk_steps=3, cache_dtype=jnp.float32,
                      attn_impl="xla", prefill_chunk=8)
    got = eng.serve(prompts, max_new=6)
    assert got == ref
    assert eng.prefix_hits >= 2


def test_chunked_prefill_reclaim_under_pressure():
    """A half-prefilled queued request's pages are reclaimed (recompute)
    when live slots need to grow and no victim slot exists; outputs stay
    exact."""
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup(seed=17, max_tokens=8)
    rng = np.random.default_rng(9)
    prompts = [rng.integers(1, cfg.vocab_size - 2, 9).tolist(),
               rng.integers(1, cfg.vocab_size - 2, 25).tolist()]
    ref = _ref_outputs(params, cfg, sp, prompts, 8)

    # one slot, 5 pages of 8: the queued 25er chunk-prefills into the
    # pool while slot 0 decodes; slot 0's growth then needs the pages
    # back (no victim slots — reclaim path)
    eng = PagedEngine(params, cfg, sp, slots=1, max_len=40, page_size=8,
                      num_pages=5, chunk_steps=4,
                      cache_dtype=jnp.float32, attn_impl="xla",
                      prefill_chunk=8)
    got = eng.serve(prompts, max_new=8)
    assert got == ref


def test_cross_call_prefix_reuse_and_generate_api():
    """serve()/generate() calls share one persistent pool + prefix
    registry: a second call whose context extends a finished request's
    full prompt+generated sequence prefills only its suffix, and outputs
    equal the stateless reference."""
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup(seed=21)
    rng = np.random.default_rng(11)
    turn1 = rng.integers(1, cfg.vocab_size - 2, 18).tolist()

    eng = PagedEngine(params, cfg, sp, slots=2, max_len=64, page_size=8,
                      chunk_steps=3, cache_dtype=jnp.float32,
                      attn_impl="xla")
    out1 = eng.generate(turn1, max_new=6)["token_ids"]
    # next turn: previous context + generated + new text
    turn2 = turn1 + out1 + rng.integers(1, cfg.vocab_size - 2, 5).tolist()
    out2 = eng.generate(turn2, max_new=6)["token_ids"]
    # the second call must hit pages registered at the first retire
    # (including GENERATED-token pages: (18+6)//8 = 3 full pages)
    assert eng.prefix_hits == 1
    assert eng.prefix_hit_tokens >= 24 // 8 * 8

    ref = _ref_outputs(params, cfg, sp, [turn1, turn2], 6)
    assert [out1, out2] == ref


# ---------------------------------------------------------------------------
# int8 quantized KV pool (the vLLM quantized-KV-cache capability)
# ---------------------------------------------------------------------------

def test_int8_pool_layout_and_bytes():
    from speech_distill_tpu.infer.paged import PagedKVCache

    cfg, _, _ = _setup()
    pool = PagedKVCache.create(cfg, 6, 8, jnp.int8)
    assert pool.quantized
    assert pool.k.dtype == jnp.int8 and pool.v.dtype == jnp.int8
    assert pool.ks.shape == pool.k.shape[:-1]
    assert pool.ks.dtype == jnp.float32
    bf16 = PagedKVCache.create(cfg, 6, 8, jnp.bfloat16)
    assert pool.k.nbytes * 2 == bf16.k.nbytes


def test_paged_forward_int8_close_to_fp32():
    """Token-by-token decode over an int8 pool tracks the fp32 pool's
    logits within quantization noise."""
    from speech_distill_tpu.infer.paged import PagedKVCache, paged_forward

    cfg, params, _ = _setup()
    rng = np.random.default_rng(1)
    prompt = rng.integers(1, cfg.vocab_size - 2, 9).tolist()
    ps, n_pages = 8, 6
    pool_f = PagedKVCache.create(cfg, n_pages, ps, jnp.float32)
    pool_q = PagedKVCache.create(cfg, n_pages, ps, jnp.int8)
    bt = jnp.arange(n_pages, dtype=jnp.int32)[None]
    length = jnp.zeros((1,), jnp.int32)
    live = jnp.ones((1,), bool)
    for tok in prompt:
        t = jnp.asarray([tok], jnp.int32)
        lf, pool_f = paged_forward(params, t, cfg, pool_f, bt, length,
                                   live, attn_impl="xla")
        lq, pool_q = paged_forward(params, t, cfg, pool_q, bt, length,
                                   live, attn_impl="xla")
        scale = max(1.0, float(np.abs(np.asarray(lf)).max()))
        assert np.abs(np.asarray(lq) - np.asarray(lf)).max() / scale < 0.03
        length = length + 1


def test_int8_serve_slot_invariant_and_prefix_modes():
    """Quantization is per token — a stream's KV never depends on which
    slot it ran in, so int8 serve is exactly slot-count invariant (with
    prefix sharing off: a prefix-cache hit attends over dequantized pages
    while a fresh prefill attends over exact bf16, so ON may differ at
    the noise floor but must still satisfy the caps contract)."""
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup()
    rng = np.random.default_rng(2)
    common = rng.integers(1, cfg.vocab_size - 2, 8).tolist()
    prompts = [common + rng.integers(1, cfg.vocab_size - 2,
                                     int(rng.integers(3, 9))).tolist()
               for _ in range(5)]
    kw = dict(max_len=64, page_size=8, chunk_steps=3,
              cache_dtype=jnp.int8, attn_impl="xla",
              prefix_sharing=False)
    got2 = PagedEngine(params, cfg, sp, slots=2, **kw).serve(
        prompts, max_new=6)
    got1 = PagedEngine(params, cfg, sp, slots=1, **kw).serve(
        prompts, max_new=6)
    assert got2 == got1
    assert all(len(o) == 6 for o in got2)

    eng = PagedEngine(params, cfg, sp, slots=2,
                      **{**kw, "prefix_sharing": True})
    caps = [3, 6, 2, 5, 4]
    outs = eng.serve(prompts, max_new_per_request=caps)
    assert [len(o) for o in outs] == caps
    assert eng.prefix_hits > 0


def test_int8_chunked_prefill_and_preemption_complete():
    """Chunked prefill + recompute preemption both run on int8 pools; the
    caps contract holds (stored pages are chunk-independent by per-token
    quantization, so resume-after-preemption stays self-consistent)."""
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup()
    rng = np.random.default_rng(3)
    prompts = [rng.integers(1, cfg.vocab_size - 2, 19).tolist()
               for _ in range(4)]
    eng = PagedEngine(params, cfg, sp, slots=3, max_len=48, page_size=8,
                      num_pages=8, chunk_steps=3, cache_dtype=jnp.int8,
                      attn_impl="xla", prefill_chunk=8)
    outs = eng.serve(prompts, max_new=6)
    assert all(len(o) == 6 for o in outs)
    assert eng.n_prefill_chunks > 0


def test_batched_admission_matches_per_stream():
    """8 same-width requests admitted in one scheduler pass (batch of 8
    through the [n, width] admission program) == per-stream decode."""
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup()
    rng = np.random.default_rng(4)
    prompts = [rng.integers(1, cfg.vocab_size - 2, 7).tolist()
               for _ in range(10)]
    ref = _ref_outputs(params, cfg, sp, prompts, 5)
    eng = PagedEngine(params, cfg, sp, slots=8, max_len=64, page_size=8,
                      chunk_steps=3, cache_dtype=jnp.float32,
                      attn_impl="xla", prefix_sharing=False)
    got = eng.serve(prompts, max_new=5)
    assert got == ref
    assert eng.n_batched_prefills >= 8


def test_request_metrics_recorded():
    """Every request gets a latency record (ttft <= e2e, chunk
    granularity), including requests finished via cap-reached
    preemption resume."""
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup()
    rng = np.random.default_rng(6)
    prompts = [rng.integers(1, cfg.vocab_size - 2,
                            int(rng.integers(3, 9))).tolist()
               for _ in range(5)]
    eng = PagedEngine(params, cfg, sp, slots=2, max_len=48, page_size=8,
                      num_pages=7, chunk_steps=3, cache_dtype=jnp.float32,
                      attn_impl="xla")
    outs = eng.serve(prompts, max_new=6)
    assert all(m is not None for m in eng.request_metrics)
    for m, p, o in zip(eng.request_metrics, prompts, outs):
        assert 0.0 <= m["ttft_s"] <= m["e2e_s"]
        assert m["n_prompt"] == len(p) and m["n_gen"] == len(o)


def test_admit_batch_width_gate():
    """Prompts wider than admit_batch_max_width use the single-row
    program (batching long widths only multiplies compile buckets);
    short ones still batch."""
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup()
    rng = np.random.default_rng(7)
    long_prompts = [rng.integers(1, cfg.vocab_size - 2, 17).tolist()
                    for _ in range(4)]
    kw = dict(max_len=64, page_size=8, chunk_steps=3,
              cache_dtype=jnp.float32, attn_impl="xla",
              admit_batch_max_width=8)
    ref = _ref_outputs(params, cfg, sp, long_prompts, 4)
    eng = PagedEngine(params, cfg, sp, slots=4, **kw)
    assert eng.serve(long_prompts, max_new=4) == ref
    assert eng.n_batched_prefills == 0        # width 24 > gate 8

    short_prompts = [rng.integers(1, cfg.vocab_size - 2, 6).tolist()
                     for _ in range(4)]
    eng2 = PagedEngine(params, cfg, sp, slots=4, **kw)
    ref2 = _ref_outputs(params, cfg, sp, short_prompts, 4)
    assert eng2.serve(short_prompts, max_new=4) == ref2
    assert eng2.n_batched_prefills >= 4       # width 8 <= gate 8


def test_chunk_exit_free_exact_and_triggers():
    """Early chunk exit (in-chunk re-admission) only changes SCHEDULING:
    greedy outputs equal the run-to-boundary engine, early exits actually
    fire (device steps < chunks * chunk_steps), and with an empty queue
    chunks still run to the boundary."""
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup(max_tokens=8)
    rng = np.random.default_rng(9)
    # mixed caps so slots retire at different steps inside a chunk
    prompts = [rng.integers(1, cfg.vocab_size - 2,
                            int(rng.integers(3, 11))).tolist()
               for _ in range(9)]
    caps = [2, 8, 3, 7, 2, 6, 4, 8, 3]
    kw = dict(slots=3, max_len=64, page_size=8, chunk_steps=8,
              cache_dtype=jnp.float32, attn_impl="xla")
    base = PagedEngine(params, cfg, sp, **kw)
    ref = base.serve(prompts, max_new_per_request=caps)

    eng = PagedEngine(params, cfg, sp, chunk_exit_free=1, **kw)
    got = eng.serve(prompts, max_new_per_request=caps)
    assert got == ref
    # early exits must have fired: with caps << chunk_steps and a deep
    # queue, some chunk returned before its boundary
    assert eng.n_decode_steps < eng.n_chunks * eng.chunk_steps
    # and re-admission used them: more chunks than the boundary engine
    assert eng.n_chunks > base.n_chunks

    # empty queue from the start (fewer prompts than slots): exit_free is
    # disabled, chunks run to boundary/all-finished exactly as baseline
    eng2 = PagedEngine(params, cfg, sp, chunk_exit_free=1, **kw)
    base2 = PagedEngine(params, cfg, sp, **kw)
    p2 = prompts[:3]
    assert eng2.serve(p2, max_new=5) == base2.serve(p2, max_new=5)
    assert eng2.n_chunks == base2.n_chunks


def test_streaming_token_callback():
    """serve(on_tokens=...): chunk-granularity streaming of generated ids —
    per-request concatenation equals the returned outputs, every token is
    emitted exactly once (preemption/resume included), done fires exactly
    once per request as the final event."""
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup(seed=5, max_tokens=8)
    rng = np.random.default_rng(2)
    prompts = [rng.integers(1, cfg.vocab_size - 2, 9).tolist()
               for _ in range(4)]

    # pool too small for all slots: forces recompute preemption mid-stream
    eng = PagedEngine(params, cfg, sp, slots=3, max_len=48, page_size=8,
                      num_pages=7, chunk_steps=3,
                      cache_dtype=jnp.float32, attn_impl="xla")
    events = []
    outs = eng.serve(prompts, max_new=8,
                     on_tokens=lambda rid, toks, done:
                     events.append((rid, list(toks), done)))
    assert eng.preemptions > 0
    for rid in range(len(prompts)):
        ev = [(t, d) for r, t, d in events if r == rid]
        assert sum(d for _, d in ev) == 1 and ev[-1][1]   # one final done
        got = [tok for t, _ in ev for tok in t]
        assert got == outs[rid]
    # streamed: some request produced tokens across >= 2 callbacks
    assert any(len([1 for r, t, d in events if r == rid and t]) >= 2
               for rid in range(len(prompts)))


def test_per_request_sampling_params():
    """serve(sampling_per_request=...): each request's temperature/top_p/
    repetition_penalty/min_tokens override the engine globals per slot —
    greedy rows with different penalties served TOGETHER equal each served
    ALONE under an engine whose globals match (incl. across preemption
    resume), and min_tokens gates EOS per row."""
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, _ = _setup(max_tokens=8)
    rng = np.random.default_rng(3)
    prompts = [rng.integers(1, cfg.vocab_size - 2, 9).tolist()
               for _ in range(4)]
    reqs = [{"repetition_penalty": 1.0},
            {"repetition_penalty": 8.0},
            None,                                  # engine defaults
            {"repetition_penalty": 8.0, "min_tokens": 2}]

    def sp_for(over):
        base = dict(temperature=1.0, top_k=1, top_p=1.0, use_ras=False,
                    repetition_penalty=1.0, max_tokens=8, min_tokens=8,
                    stop_token_ids=(cfg.vocab_size - 1,))
        base.update({k: v for k, v in (over or {}).items()
                     if k != "min_tokens"})
        if over and "min_tokens" in over:
            base["min_tokens"] = over["min_tokens"]
        return SamplingParams(**base)

    # reference: each request alone under matching engine-global params
    refs = []
    for p, over in zip(prompts, reqs):
        e = PagedEngine(params, cfg, sp_for(over), slots=1, max_len=48,
                        page_size=8, chunk_steps=3,
                        cache_dtype=jnp.float32, attn_impl="xla")
        refs.append(e.serve([p], max_new=8)[0])

    # together, through a pool small enough to force preemption/resume
    eng = PagedEngine(params, cfg, sp_for(None), slots=3, max_len=48,
                      page_size=8, num_pages=7, chunk_steps=3,
                      cache_dtype=jnp.float32, attn_impl="xla",
                      per_request_sampling=True)
    got = eng.serve(prompts, max_new=8, sampling_per_request=reqs)
    assert eng.preemptions > 0
    assert got == refs
    assert got[0] != got[1]        # the penalty actually changed sampling

    with pytest.raises(ValueError, match="per_request_sampling"):
        PagedEngine(params, cfg, sp_for(None), slots=2, max_len=48,
                    page_size=8, chunk_steps=3, cache_dtype=jnp.float32,
                    attn_impl="xla").serve(prompts[:2],
                                           sampling_per_request=reqs[:2])
    with pytest.raises(ValueError, match="unknown sampling"):
        eng.serve(prompts[:1], max_new=2,
                  sampling_per_request=[{"top_k": 3}])


def test_logprobs_greedy_structural_and_preemption_invariant():
    """return_logprobs: one logprob per generated token; under top_k=1 the
    sampling distribution is a point mass so every logprob is exactly 0;
    and a preemption/resume run reports the same logprobs as an
    unconstrained run (harvest-at-preempt + re-admission zeroing exact)."""
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup(seed=5, max_tokens=8)
    rng = np.random.default_rng(2)
    prompts = [rng.integers(1, cfg.vocab_size - 2, 9).tolist()
               for _ in range(4)]
    kw = dict(max_len=48, page_size=8, chunk_steps=4,
              cache_dtype=jnp.float32, attn_impl="xla",
              return_logprobs=True)

    free = PagedEngine(params, cfg, sp, slots=4, **kw)
    ref = free.serve(prompts, max_new=8)
    ref_lps = list(free.request_logprobs)

    eng = PagedEngine(params, cfg, sp, slots=3, num_pages=7, **kw)
    got = eng.serve(prompts, max_new=8)
    assert eng.preemptions > 0, "config failed to force preemption"
    assert got == ref
    for g, a, b in zip(got, eng.request_logprobs, ref_lps):
        assert len(a) == len(g) and a == b
        assert all(x == 0.0 for x in a)   # point-mass distribution

    # engines built without the flag don't pay for (or report) logprobs
    off = PagedEngine(params, cfg, sp, slots=2, max_len=48, page_size=8,
                      chunk_steps=4, cache_dtype=jnp.float32,
                      attn_impl="xla")
    off.serve(prompts[:1], max_new=4)
    assert off.request_logprobs == [None]


def test_serve_logprobs_match_closed_form_target():
    """Sampled RAS serving: every reported logprob equals the closed-form
    per-step emission distribution (speculative.target_probs — the same
    oracle that validates the sampler itself) evaluated at the emitted
    token, on a teacher-forced replay of the request."""
    from speech_distill_tpu.infer.paged import PagedEngine
    from speech_distill_tpu.infer import speculative

    cfg, params, _ = _setup(seed=6)
    V = cfg.vocab_size
    win = 6
    sp = SamplingParams(stop_token_ids=(V - 1,), max_tokens=8,
                        min_tokens=2, top_k=8, top_p=0.9, temperature=0.8,
                        repetition_penalty=1.2, use_ras=True,
                        win_size=win, tau_r=0.2)
    rng = np.random.default_rng(4)
    prompts = [rng.integers(1, V - 2, 7).tolist() for _ in range(3)]
    eng = PagedEngine(params, cfg, sp, slots=2, max_len=64, page_size=8,
                      chunk_steps=3, cache_dtype=jnp.float32,
                      attn_impl="xla", return_logprobs=True)
    outs = eng.serve(prompts, max_new=8)

    checked = 0
    for p, gen, lps in zip(prompts, outs, eng.request_logprobs):
        assert len(lps) == len(gen) > 0
        ids = jnp.asarray([p + gen], jnp.int32)
        logits = qwen3.forward(params, ids, cfg)
        for i, (t, lp) in enumerate(zip(gen, lps)):
            raw = logits[:, len(p) + i - 1].astype(jnp.float32)
            seq = p + gen[:i]
            pos = len(seq) - win + np.arange(win)
            recent = jnp.asarray(
                [[seq[max(j, 0)] for j in pos]], jnp.int32)
            recent_valid = jnp.asarray([(pos >= 0).astype(np.int32)])
            presence = jnp.zeros((1, V), bool).at[0,
                                                  jnp.asarray(gen[:i],
                                                              jnp.int32)
                                                  ].set(bool(i))
            target = np.asarray(speculative.target_probs(
                raw, presence, jnp.asarray([i]), recent, recent_valid,
                sp, tuple(sp.stop_token_ids), win))[0]
            assert abs(lp - np.log(max(target[t], 1e-38))) < 5e-3, \
                (i, t, lp, np.log(target[t]))
            checked += 1
    assert checked >= 10


def test_ras_sample_logprob_matches_numpy_oracle():
    """Full-vocab (top_k=0) path: ras_sample's reported logprob equals an
    independent numpy evaluation of the mixture
    p(x) = proc(x)[not rep(x)] + P_rep * softmax(raw)(x)."""
    from speech_distill_tpu.ops import sampling

    V, win, B = 40, 8, 4
    rng = np.random.default_rng(7)
    raw = rng.normal(size=(B, V)).astype(np.float32) * 2.0
    processed = rng.normal(size=(B, V)).astype(np.float32)
    recent = rng.integers(0, 10, size=(B, win)).astype(np.int32)
    recent_valid = (rng.random((B, win)) < 0.8).astype(np.int32)
    tau_r, = (0.25,)

    res = sampling.ras_sample(
        jax.random.PRNGKey(1), jnp.asarray(raw), jnp.asarray(processed),
        jnp.asarray(recent), jnp.asarray(recent_valid),
        use_ras=True, win_size=win, tau_r=tau_r, return_logprob=True)
    tok = np.asarray(res.token)
    lp = np.asarray(res.logprob)

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    proc_p, raw_p = softmax(processed), softmax(raw)
    for b in range(B):
        counts = np.zeros(V)
        for j in range(win):
            if recent_valid[b, j]:
                counts[recent[b, j]] += 1
        rep = (counts + 1) >= win * tau_r
        p_rep = proc_p[b][rep].sum()
        t = tok[b]
        p = (0.0 if rep[t] else proc_p[b, t]) + p_rep * raw_p[b, t]
        np.testing.assert_allclose(lp[b], np.log(p), atol=1e-5)


def test_streaming_logprobs_callback():
    """serve(on_logprobs=...): chunk-granularity streaming of per-token
    logprobs aligned one-to-one with on_tokens emissions — per-request
    concatenation equals request_logprobs, exactly once per token through
    preemption/resume, and validation rejects misconfigured engines."""
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup(seed=5, max_tokens=8)
    rng = np.random.default_rng(2)
    prompts = [rng.integers(1, cfg.vocab_size - 2, 9).tolist()
               for _ in range(4)]

    # pool too small for all slots: forces recompute preemption mid-stream
    eng = PagedEngine(params, cfg, sp, slots=3, max_len=48, page_size=8,
                      num_pages=7, chunk_steps=3, cache_dtype=jnp.float32,
                      attn_impl="xla", return_logprobs=True)
    tok_ev, lp_ev = [], []
    outs = eng.serve(
        prompts, max_new=8,
        on_tokens=lambda rid, t, d: tok_ev.append((rid, list(t), d)),
        on_logprobs=lambda rid, l, d: lp_ev.append((rid, list(l), d)))
    assert eng.preemptions > 0
    for rid in range(len(prompts)):
        toks = [(t, d) for r, t, d in tok_ev if r == rid]
        lps = [(lp, d) for r, lp, d in lp_ev if r == rid]
        # aligned one-to-one with the token emissions (lengths + done flags)
        assert [(len(t), d) for t, d in toks] == \
            [(len(lp), d) for lp, d in lps]
        flat = [x for lp, _ in lps for x in lp]
        assert flat == eng.request_logprobs[rid]
        assert len(flat) == len(outs[rid])

    # companion-callback validation
    with pytest.raises(ValueError, match="return_logprobs"):
        PagedEngine(params, cfg, sp, slots=2, max_len=48, page_size=8,
                    chunk_steps=3, cache_dtype=jnp.float32,
                    attn_impl="xla").serve(
                        prompts[:1], max_new=2,
                        on_tokens=lambda *a: None,
                        on_logprobs=lambda *a: None)
    with pytest.raises(ValueError, match="companion"):
        eng.serve(prompts[:1], max_new=2, on_logprobs=lambda *a: None)


def test_admission_policy_shortest_job():
    """shortest_job admission: outputs still match the per-stream oracle
    (order-preserving, policy only reorders WHO gets a slot first), and
    short-budget requests reach their first token before long ones."""
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup(max_tokens=12)
    rng = np.random.default_rng(2)
    prompts = [rng.integers(1, cfg.vocab_size - 2, 6).tolist()
               for _ in range(4)]
    caps = [12, 2, 12, 2]
    ref = _ref_outputs(params, cfg, sp, prompts, 12)

    first_seen = []

    def on_tokens(rid, new, done):
        if rid not in first_seen and new:
            first_seen.append(rid)

    eng = PagedEngine(params, cfg, sp, slots=1, max_len=64, page_size=8,
                      chunk_steps=2, cache_dtype=jnp.float32,
                      attn_impl="xla", admission_policy="shortest_job")
    got = eng.serve(prompts, max_new_per_request=caps,
                    on_tokens=on_tokens)
    assert got == [r[:c] for r, c in zip(ref, caps)]
    # the two 2-token turns got the single slot before either 12-token one
    assert set(first_seen[:2]) == {1, 3}

    # fifo on the same workload starts rid 0 first (arrival order)
    eng2 = PagedEngine(params, cfg, sp, slots=1, max_len=64, page_size=8,
                       chunk_steps=2, cache_dtype=jnp.float32,
                       attn_impl="xla", admission_policy="fifo")
    first2 = []
    eng2.serve(prompts, max_new_per_request=caps,
               on_tokens=lambda rid, new, done:
               first2.append(rid) if rid not in first2 and new else None)
    assert first2[0] == 0


def test_admission_policy_shortest_prompt():
    """shortest_prompt admission orders by prompt length; outputs match
    the oracle."""
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup()
    rng = np.random.default_rng(5)
    lens = [10, 3, 7, 4]
    prompts = [rng.integers(1, cfg.vocab_size - 2, n).tolist()
               for n in lens]
    ref = _ref_outputs(params, cfg, sp, prompts, 6)
    first_seen = []
    eng = PagedEngine(params, cfg, sp, slots=1, max_len=64, page_size=8,
                      chunk_steps=2, cache_dtype=jnp.float32,
                      attn_impl="xla",
                      admission_policy="shortest_prompt")
    got = eng.serve(prompts, max_new=6,
                    on_tokens=lambda rid, new, done:
                    first_seen.append(rid)
                    if rid not in first_seen and new else None)
    assert got == ref
    assert first_seen == [1, 3, 2, 0]    # ascending prompt length


def test_admission_policy_deadline_edf():
    """deadline admission is earliest-deadline-first: with one slot, the
    tightest TTFT deadline gets it first (outputs stay oracle-exact —
    policies only reorder WHO is seated, never what a stream computes)."""
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup()
    rng = np.random.default_rng(7)
    prompts = [rng.integers(1, cfg.vocab_size - 2, 6).tolist()
               for _ in range(4)]
    ref = _ref_outputs(params, cfg, sp, prompts, 6)
    first_seen = []
    eng = PagedEngine(params, cfg, sp, slots=1, max_len=64, page_size=8,
                      chunk_steps=2, cache_dtype=jnp.float32,
                      attn_impl="xla", admission_policy="deadline")
    # deadlines generous enough that nothing sheds; order is pure EDF
    got = eng.serve(prompts, max_new=6,
                    deadline_per_request=[1000.0, 10.0, 100.0, 50.0],
                    on_tokens=lambda rid, new, done:
                    first_seen.append(rid)
                    if rid not in first_seen and new else None)
    assert got == ref
    assert eng.shed_requests == 0
    assert first_seen == [1, 3, 2, 0]    # ascending deadline


def test_deadline_load_shedding():
    """Requests whose TTFT deadline expires before any token are SHED:
    empty output, shed-marked metrics, done-callback fired, pages
    reclaimed; served requests still match the oracle."""
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup(seed=6)
    rng = np.random.default_rng(3)
    prompts = [rng.integers(1, cfg.vocab_size - 2, 6).tolist()
               for _ in range(4)]
    ref = _ref_outputs(params, cfg, sp, prompts, 6)

    done_rids = []

    def on_tokens(rid, new, done):
        if done:
            done_rids.append(rid)

    eng = PagedEngine(params, cfg, sp, slots=2, max_len=64, page_size=8,
                      chunk_steps=2, cache_dtype=jnp.float32,
                      attn_impl="xla", prefix_sharing=False)
    # rids 2 and 3 carry an already-expired deadline (0.0 s): the first
    # scheduler pass sheds them before any prefill; 0 and 1 fill the two
    # slots and run to completion untouched
    got = eng.serve(prompts,
                    max_new=6,
                    deadline_per_request=[None, 1000.0, 0.0, 0.0],
                    on_tokens=on_tokens)
    assert got[0] == ref[0] and got[1] == ref[1]
    assert got[2] == [] and got[3] == []
    assert eng.shed_requests == 2
    for rid in (2, 3):
        m = eng.request_metrics[rid]
        assert m["shed"] is True and m["n_gen"] == 0 and m["wait_s"] >= 0
    for rid in (0, 1):
        assert not eng.request_metrics[rid].get("shed")
        assert eng.request_metrics[rid]["n_gen"] == 6
    # every rid closed its stream exactly once (shed included)
    assert sorted(done_rids) == [0, 1, 2, 3]
    # no page leak: all pages return to the pool after serve
    assert eng._pool.free_pages == eng.num_pages


def test_deadline_shed_mid_prefill_frees_pages():
    """A queued request shed while mid-way through chunked prefill
    returns its accrued prefill pages to the pool (no leak), and the
    resident stream is unaffected."""
    import time as _time
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup(seed=8, max_tokens=40)
    rng = np.random.default_rng(4)
    short = rng.integers(1, cfg.vocab_size - 2, 6).tolist()
    long_prompt = rng.integers(1, cfg.vocab_size - 2, 30).tolist()
    ref = _ref_outputs(params, cfg, sp, [short], 40)

    eng = PagedEngine(params, cfg, sp, slots=1, max_len=64, page_size=8,
                      num_pages=16, chunk_steps=2,
                      cache_dtype=jnp.float32, attn_impl="xla",
                      prefill_chunk=8, prefix_sharing=False)
    eng.serve([short], max_new=2)          # compile programs (cached)
    # rid 0 holds the single slot for 20 chunks; rid 1 (30-token prompt,
    # 8-token prefill chunks) accrues prefill pages while queued, then its
    # 0.22 s deadline expires (each pass sleeps 0.05 s via on_chunk) and
    # it sheds mid-prefill
    got = eng.serve([short, long_prompt],
                    max_new_per_request=[40, 4],
                    deadline_per_request=[None, 0.22],
                    on_chunk=lambda: _time.sleep(0.05))
    assert got[0] == ref[0][:40]
    assert got[1] == [] and eng.shed_requests == 1
    assert eng.request_metrics[1]["shed"] is True
    # chunked prefill ran at least one piece for the shed request
    assert eng.n_prefill_chunks >= 1
    # and its pages (plus everything else) are back in the pool
    assert eng._pool.free_pages == eng.num_pages


def test_arrival_process_open_loop():
    """Open-loop arrivals: a request is invisible to the scheduler until
    its arrival time; early requests are seated first regardless of rid
    order, outputs stay oracle-exact, and TTFT clocks start at arrival."""
    import time as _time
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup(seed=9)
    rng = np.random.default_rng(6)
    prompts = [rng.integers(1, cfg.vocab_size - 2, 6).tolist()
               for _ in range(4)]
    ref = _ref_outputs(params, cfg, sp, prompts, 6)

    eng = PagedEngine(params, cfg, sp, slots=2, max_len=64, page_size=8,
                      chunk_steps=2, cache_dtype=jnp.float32,
                      attn_impl="xla")
    eng.serve(prompts[:2], max_new=2)     # compile
    first_seen = []
    # rids 2,3 arrive immediately; rids 0,1 arrive much later (after the
    # first two finish — each pass sleeps 0.05 s so 0.8 s >> 3 chunks)
    got = eng.serve(prompts, max_new=6,
                    arrival_per_request=[0.8, 0.8, 0.0, 0.0],
                    on_tokens=lambda rid, new, done:
                    first_seen.append(rid)
                    if rid not in first_seen and new else None,
                    on_chunk=lambda: _time.sleep(0.05))
    assert got == ref
    assert set(first_seen[:2]) == {2, 3}
    # TTFT is measured from ARRIVAL, not serve start: the late arrivals
    # found free slots, so their TTFT is far below their 0.8 s arrival
    for rid in (0, 1):
        assert eng.request_metrics[rid]["ttft_s"] < 0.6


def test_arrival_idle_sleeps_not_spins():
    """With nothing resident and nothing queued, the scheduler sleeps to
    the next arrival instead of dispatching empty decode chunks."""
    from speech_distill_tpu.infer.paged import PagedEngine

    cfg, params, sp = _setup(seed=9)
    rng = np.random.default_rng(6)
    prompt = rng.integers(1, cfg.vocab_size - 2, 6).tolist()
    ref = _ref_outputs(params, cfg, sp, [prompt], 6)

    eng = PagedEngine(params, cfg, sp, slots=2, max_len=64, page_size=8,
                      chunk_steps=2, cache_dtype=jnp.float32,
                      attn_impl="xla")
    eng.serve([prompt], max_new=2)        # compile
    t0 = __import__("time").perf_counter()
    got = eng.serve([prompt], max_new=6, arrival_per_request=[0.5])
    dt = __import__("time").perf_counter() - t0
    assert got == ref
    assert dt >= 0.5                      # waited for the arrival
    # 6 tokens / 2-step chunks = 3 decode chunks; no pre-arrival spinning
    assert eng.n_chunks <= 4
