"""Native C++ serving runtime (allocator + prefix trie) == Python twins.

Differential test: drive both implementations through the same randomized
operation sequence (alloc/free/share/match/register/evict) and assert every
observable (returned pages, free counts, refcounts, match results, eviction
outcomes) is identical. Then: a full serve() with the native runtime equals
one with the Python runtime token-for-token."""
import numpy as np
import pytest
import jax.numpy as jnp

from speech_distill_tpu.native import serving


pytestmark = pytest.mark.skipif(not serving.available(),
                                reason="native serving runtime not built")


def test_pool_differential():
    from speech_distill_tpu.infer.paged import PagePool

    rng = np.random.default_rng(0)
    py, nat = PagePool(24), serving.NativePagePool(24)
    held = []   # parallel lists of held page sets
    for step in range(500):
        op = rng.integers(0, 3)
        if op == 0:                                   # alloc
            n = int(rng.integers(1, 6))
            a, b = py.alloc(n), nat.alloc(n)
            assert a == b, f"step {step}: alloc {a} != {b}"
            if a is not None:
                held.append(list(a))
        elif op == 1 and held:                        # free
            pages = held.pop(int(rng.integers(0, len(held))))
            py.free(pages)
            nat.free(pages)
        elif op == 2 and held:                        # share + free later
            pages = held[int(rng.integers(0, len(held)))]
            py.share(pages)
            nat.share(pages)
            held.append(list(pages))
        assert py.free_pages == nat.free_pages, f"step {step}"
        for p in range(24):
            assert py.refcount(p) == nat.refcount(p), f"step {step} pg {p}"


def test_registry_differential():
    from speech_distill_tpu.infer.paged import PagePool, PrefixRegistry

    rng = np.random.default_rng(1)
    ps = 4
    py_pool, nat_pool = PagePool(64), serving.NativePagePool(64)
    py_reg, nat_reg = PrefixRegistry(), serving.NativePrefixRegistry()
    # a small universe of prompts with heavy shared prefixes
    base = rng.integers(0, 9, 16).tolist()
    prompts = [base[:int(rng.integers(4, 17))]
               + rng.integers(0, 9, int(rng.integers(0, 13))).tolist()
               for _ in range(12)]
    for step in range(300):
        op = rng.integers(0, 4)
        ids = prompts[int(rng.integers(0, len(prompts)))]
        if op == 0:                                   # match
            mp = int(rng.integers(1, 8))
            a = py_reg.match(ids, ps, mp)
            b = nat_reg.match(ids, ps, mp)
            assert a == b, f"step {step}: match {a} != {b}"
        elif op == 1:                                 # register
            n_pages = len(ids) // ps
            if n_pages == 0:
                continue
            a = py_pool.alloc(n_pages)
            b = nat_pool.alloc(n_pages)
            assert a == b
            if a is None:
                continue
            py_reg.register(ids, a, ps, py_pool)
            nat_reg.register(ids, b, ps, nat_pool)
            # the stream itself releases its reference (registry keeps its
            # own), as serve() does at retire
            py_pool.free(a)
            nat_pool.free(b)
        elif op == 2:                                 # evict_one
            a = py_reg.evict_one(py_pool)
            b = nat_reg.evict_one(nat_pool)
            assert a == b, f"step {step}: evict {a} != {b}"
        else:                                         # alloc w/ eviction
            n = int(rng.integers(1, 10))
            a = py_reg.alloc(py_pool, n)
            b = nat_reg.alloc(nat_pool, n)
            assert a == b, f"step {step}: reg.alloc {a} != {b}"
            if a is not None:
                py_pool.free(a)
                nat_pool.free(b)
        assert py_pool.free_pages == nat_pool.free_pages, f"step {step}"


def test_serve_native_matches_python_runtime():
    import jax

    from speech_distill_tpu.core.config import SamplingParams, qwen3_tiny
    from speech_distill_tpu.infer.paged import PagedEngine
    from speech_distill_tpu.models import qwen3

    vocab = 48
    cfg = qwen3_tiny(vocab)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False})
    params = qwen3.init_params(jax.random.PRNGKey(3), cfg)
    sp = SamplingParams(stop_token_ids=(vocab - 1,), max_tokens=6,
                        min_tokens=6, top_k=1, temperature=1.0,
                        use_ras=False, repetition_penalty=1.0)
    rng = np.random.default_rng(0)
    common = rng.integers(1, vocab - 2, 8).tolist()
    prompts = [common + rng.integers(1, vocab - 2,
                                     int(rng.integers(3, 11))).tolist()
               for _ in range(6)]
    kw = dict(max_len=64, page_size=8, chunk_steps=3, num_pages=12,
              cache_dtype=jnp.float32, attn_impl="xla")
    py_eng = PagedEngine(params, cfg, sp, slots=2, native_runtime=False,
                         **kw)
    nat_eng = PagedEngine(params, cfg, sp, slots=2, native_runtime=True,
                          **kw)
    a = py_eng.serve(prompts, max_new=6)
    b = nat_eng.serve(prompts, max_new=6)
    assert a == b
    assert (py_eng.prefix_hits, py_eng.preemptions) == \
        (nat_eng.prefix_hits, nat_eng.preemptions)
    # second call: cross-call prefix reuse identical too
    a2 = py_eng.serve(prompts[:3], max_new=4)
    b2 = nat_eng.serve(prompts[:3], max_new=4)
    assert a2 == b2
    assert py_eng.prefix_hit_tokens == nat_eng.prefix_hit_tokens
