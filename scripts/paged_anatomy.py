"""Decode-step anatomy: paged (kernel vs XLA-gather) vs contiguous cache.

Times ONE jitted decode step at serving shape (B rows, 0.6B student,
int8-quantized weights) with realistic occupancy, isolating the attention
path from the serve scheduler. Timed programs return a scalar (sum of
logits) so the relay's host-transfer stalls stay out of the measurement
(CLAUDE.md round-2 notes).

Usage: python scripts/paged_anatomy.py [--rows 16] [--len 400]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from speech_distill_tpu.core.config import qwen3_student_0p6b
from speech_distill_tpu.models import qwen3
from speech_distill_tpu.infer.paged import PagedKVCache, paged_forward
from speech_distill_tpu.ops.quant import quantize_params


def timeit(fn, *args, n=20):
    out = fn(*args)
    float(out)                       # sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    s = float(out)                   # scalar readback forces completion
    del s
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16)
    ap.add_argument("--len", type=int, default=400, dest="length")
    ap.add_argument("--max_len", type=int, default=1024)
    ap.add_argument("--page_size", type=int, default=128)
    ap.add_argument("--unrolls", default="",
                    help="comma list of layer-scan unroll factors to "
                         "sweep (donated kernel variant), e.g. 2,4,7")
    args = ap.parse_args()

    cfg = qwen3_student_0p6b()
    params = qwen3.init_params_on_device(0, cfg)
    params = jax.jit(lambda p: quantize_params(
        p, bits=8, quantize_embed=True, method="int8"))(params)

    B, ps = args.rows, args.page_size
    mp = args.max_len // ps
    num_pages = B * mp
    rng = np.random.default_rng(0)
    token = jnp.asarray(rng.integers(0, cfg.vocab_size, B), jnp.int32)
    lengths = jnp.full((B,), args.length, jnp.int32)
    live = jnp.ones((B,), bool)
    bt = jnp.asarray(
        rng.permutation(num_pages)[:B * mp].reshape(B, mp), jnp.int32)
    pool = PagedKVCache.create(cfg, num_pages, ps, jnp.bfloat16)

    @jax.jit
    def step_paged_kernel(p, pool, token):
        logits, pool = paged_forward(p, token, cfg, pool, bt, lengths,
                                     live, attn_impl="kernel")
        return jnp.sum(logits)

    @jax.jit
    def step_paged_xla(p, pool, token):
        logits, pool = paged_forward(p, token, cfg, pool, bt, lengths,
                                     live, attn_impl="xla")
        return jnp.sum(logits)

    # created lazily in its variant: at B=64 the contiguous cache is
    # 7.5 GB and cannot co-reside with the page pool
    def mk_cache():
        c = qwen3.KVCache.create(cfg, B, args.max_len, jnp.bfloat16)
        return c._replace(length=jnp.asarray(args.length, jnp.int32))

    cache_positions = jnp.full((B,), args.length, jnp.int32)

    @jax.jit
    def step_contiguous(p, cache, token):
        logits, cache = qwen3.forward(
            p, token[:, None], cfg, cache=cache,
            cache_positions=cache_positions)
        return jnp.sum(logits)

    # scatter-ablated variant: skip the per-layer pool writes (STALE KV —
    # wrong values, right timing) to isolate the XLA scatters' share
    import speech_distill_tpu.infer.paged as paged_mod

    @jax.jit
    def step_paged_noscatter(p, pool, token):
        logits, _ = paged_mod.paged_forward(
            p, token, cfg, pool, bt, lengths, live,
            attn_impl="kernel", _skip_kv_write=True)
        return jnp.sum(logits)

    # donated variants (serve-faithful: the decode chunk donates the
    # state, so the pool is never copied at entry) — the new pool must be
    # returned and re-threaded or the donated buffer dies after one call
    import functools

    @functools.partial(jax.jit, donate_argnums=(1,))
    def step_kernel_donated(p, pool, token):
        logits, pool = paged_forward(p, token, cfg, pool, bt, lengths,
                                     live, attn_impl="kernel")
        return jnp.sum(logits), pool

    @functools.partial(jax.jit, donate_argnums=(1,))
    def step_noscat_donated(p, pool, token):
        logits, _ = paged_mod.paged_forward(
            p, token, cfg, pool, bt, lengths, live,
            attn_impl="kernel", _skip_kv_write=True)
        return jnp.sum(logits), pool

    def time_donated(fn, st, n=20):
        out, st = fn(params, st, token)
        float(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out, st = fn(params, st, token)
        float(out)
        return (time.perf_counter() - t0) / n * 1e3, st

    variants_d = [("kernel_donated", step_kernel_donated),
                  ("noscat_donated", step_noscat_donated)]
    def mk_unrolled(u):
        @functools.partial(jax.jit, donate_argnums=(1,))
        def step(p, pool, token):
            logits, pool = paged_forward(p, token, cfg, pool, bt,
                                         lengths, live,
                                         attn_impl="kernel",
                                         scan_unroll=u)
            return jnp.sum(logits), pool
        return step

    for u in [int(v) for v in args.unrolls.split(",") if v]:
        variants_d.append((f"kernel_unroll{u}", mk_unrolled(u)))

    for name, fn in variants_d:
        st = PagedKVCache.create(cfg, num_pages, ps, jnp.bfloat16)
        ms, st = time_donated(fn, st)
        print(f"{name:>14}: {ms:7.2f} ms/step "
              f"({B / ms * 1e3:7.0f} tok/s at B={B})", flush=True)
        del st

    # run sequentially and FREE each state before the next — bf16 pool +
    # int8 pool + contiguous cache do not co-reside at rows>=32
    variants = [
        ("paged_kernel", step_paged_kernel,
         lambda: PagedKVCache.create(cfg, num_pages, ps, jnp.bfloat16)),
        ("paged_noscat", step_paged_noscatter,
         lambda: PagedKVCache.create(cfg, num_pages, ps, jnp.bfloat16)),
        ("paged_kernel_q", step_paged_kernel,
         lambda: PagedKVCache.create(cfg, num_pages, ps, jnp.int8)),
        ("paged_xla", step_paged_xla,
         lambda: PagedKVCache.create(cfg, num_pages, ps, jnp.bfloat16)),
        ("contiguous", step_contiguous, mk_cache),
    ]
    del pool
    for name, fn, mk in variants:
        st = mk()
        ms = timeit(fn, params, st, token)
        print(f"{name:>14}: {ms:7.2f} ms/step "
              f"({B / ms * 1e3:7.0f} tok/s at B={B})", flush=True)
        del st

    # the sampler's share: full serving step = forward + sample
    from speech_distill_tpu.core.config import SamplingParams
    from speech_distill_tpu.infer.engine import sample_next_token
    from speech_distill_tpu.infer.paged import PagedState
    sp = SamplingParams(max_tokens=512, min_tokens=1,
                        stop_token_ids=(cfg.eos_token_id,),
                        topk_method="approx")
    st = PagedState(
        tokens=jnp.zeros((B, args.max_len), jnp.int32),
        length=lengths,
        pool=PagedKVCache.create(cfg, 1, ps, jnp.bfloat16),  # unused
        block_tables=bt,
        last_logits=jnp.asarray(
            rng.normal(size=(B, cfg.vocab_size)), jnp.float32),
        presence=jnp.zeros((B, cfg.vocab_size), bool),
        num_generated=jnp.zeros((B,), jnp.int32),
        cap=jnp.full((B,), 1 << 30, jnp.int32),
        finished=jnp.zeros((B,), bool),
        rng=jax.random.PRNGKey(0))

    @jax.jit
    def step_sample(state):
        tok, _ = sample_next_token(sp, state, sp.win_size,
                                   tuple(sp.stop_token_ids))
        return jnp.sum(tok)

    ms = timeit(step_sample, st)
    print(f"{'sample_only':>14}: {ms:7.2f} ms/step")


if __name__ == "__main__":
    main()
