"""Admission (prefill) anatomy for the paged engine at long prompt widths.

The long-distinct-context serve run measured ~4.6 s per request end-to-end
(221 s / 48 requests) while the decode step itself is only ~22 ms — this
isolates the admit program (gather-or-create -> suffix prefill -> page
scatter -> slot insert) to find where the time goes.

Usage: python scripts/prefill_anatomy.py [--width 1792] [--slots 16]
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

from speech_distill_tpu.core.config import (SamplingParams,
                                            qwen3_student_0p6b)
from speech_distill_tpu.infer.paged import PagedEngine
from speech_distill_tpu.models import qwen3
from speech_distill_tpu.ops.quant import quantize_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1792)
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--pool_pages", type=int, default=192)
    ap.add_argument("--kv_quant", action="store_true")
    ap.add_argument("--n", type=int, default=6)
    args = ap.parse_args()

    cfg = qwen3_student_0p6b()
    params = qwen3.init_params_on_device(0, cfg)
    params = jax.jit(lambda p: quantize_params(
        p, bits=8, quantize_embed=True, method="int8"))(params)
    sp = SamplingParams(max_tokens=512, min_tokens=1,
                        stop_token_ids=(cfg.eos_token_id,),
                        topk_method="approx")
    eng = PagedEngine(params, cfg, sp, slots=args.slots, max_len=4096,
                      num_pages=args.pool_pages, page_size=128,
                      chunk_steps=32,
                      cache_dtype=(jnp.int8 if args.kv_quant
                                   else jnp.bfloat16))
    state = eng.new_state()
    rng = np.random.default_rng(0)
    n_ids = args.width - 7            # not page-aligned, like real prompts
    ps = eng.ps
    pages_per = -(-n_ids // ps)

    def admit_once(b, page0):
        ids = rng.integers(1, cfg.vocab_size - 2, n_ids).tolist()
        pages = list(range(page0, page0 + pages_per))
        return eng._prefill_slot(state, b, ids, pages, [], 0, cap=64)

    # warm (compiles admit width bucket)
    t0 = time.perf_counter()
    state = admit_once(0, 0)
    jax.block_until_ready(state.length)
    float(jnp.sum(state.length))
    print(f"first admit (compile + run): {time.perf_counter()-t0:.2f} s")

    t0 = time.perf_counter()
    for i in range(args.n):
        state = admit_once(i % args.slots,
                           (i + 1) * pages_per % (args.pool_pages
                                                  - pages_per))
        float(jnp.sum(state.length))     # sync each admission
    dt = (time.perf_counter() - t0) / args.n
    print(f"admit width={args.width} ({n_ids} ids, {pages_per} pages): "
          f"{dt*1e3:.1f} ms per admission")

    # decode chunk on top (all slots idle except those admitted)
    t0 = time.perf_counter()
    state = eng._decode(params, state, jnp.asarray(32, jnp.int32), jnp.asarray(99, jnp.int32))
    float(jnp.sum(state.length))
    print(f"decode chunk (32 steps) incl. compile: "
          f"{time.perf_counter()-t0:.2f} s")
    t0 = time.perf_counter()
    state = state._replace(finished=state.finished.at[:].set(False),
                           cap=state.cap.at[:].set(1 << 30))
    state = eng._decode(params, state, jnp.asarray(32, jnp.int32), jnp.asarray(99, jnp.int32))
    float(jnp.sum(state.length))
    print(f"decode chunk (32 steps) warm: {time.perf_counter()-t0:.2f} s")


if __name__ == "__main__":
    main()
