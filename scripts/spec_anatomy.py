"""Speculative-decode anatomy: acceptance rate + per-iteration cost.

For each (workload, sampling, gamma): prefill a 128-token prompt on the
0.6B student, run the speculative loop for 256 tokens with the iteration
counter on, and report tokens/iteration (acceptance), ms/iteration, and
tok/s next to the non-speculative baseline.

Usage: python scripts/spec_anatomy.py [--gammas 2,4,7] [--max_new 256]
"""
import argparse
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from speech_distill_tpu.core.config import (SamplingParams,   # noqa: E402
                                            qwen3_student_0p6b)
from speech_distill_tpu.models import qwen3                   # noqa: E402
from speech_distill_tpu.infer.engine import DecodeEngine      # noqa: E402
from speech_distill_tpu.infer.speculative import \
    make_spec_decode_fn                                       # noqa: E402


def make_prompt(cfg, kind: str):
    rng = np.random.default_rng(0)
    if kind == "repetitive":
        motif = rng.integers(cfg.speech_token_offset, cfg.vocab_size,
                             8).tolist()
        return (motif * 16)[:128]
    return rng.integers(0, cfg.vocab_size, 128).tolist()


def fresh_state(eng, prompt):
    st = eng.prefill(eng.new_state(1), prompt)
    return st._replace(presence=jnp.zeros_like(st.presence),
                       num_generated=jnp.zeros_like(st.num_generated),
                       finished=jnp.zeros_like(st.finished))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gammas", default="2,4,7")
    ap.add_argument("--max_new", type=int, default=256)
    ap.add_argument("--max_len", type=int, default=1024)
    ap.add_argument("--draft", default="ngram",
                    choices=["ngram", "layer_skip"])
    ap.add_argument("--layers", default="7",
                    help="comma list of layer-skip draft depths K")
    args = ap.parse_args()
    gammas = [int(g) for g in args.gammas.split(",")]

    cfg = qwen3_student_0p6b()
    params = qwen3.init_params_on_device(0, cfg)
    mn = jnp.asarray(args.max_new, jnp.int32)

    for sampling in ("greedy", "sampled"):
        kw = {}
        if sampling == "greedy":
            kw = dict(temperature=1.0, top_k=1, top_p=1.0, use_ras=False,
                      repetition_penalty=1.0)
        sp = SamplingParams(max_tokens=args.max_new,
                            min_tokens=args.max_new,
                            stop_token_ids=(cfg.eos_token_id,),
                            topk_method="approx", **kw)
        eng = DecodeEngine(params, cfg, sp, max_len=args.max_len)
        for workload in ("repetitive", "random"):
            prompt = make_prompt(cfg, workload)
            base = fresh_state(eng, prompt)

            st = eng._decode(params, base, mn)       # compile + baseline
            float(st.num_generated[0])
            st = eng._decode(params, fresh_state(eng, prompt), mn)
            t0 = time.perf_counter()
            float(st.num_generated[0])
            dt0 = time.perf_counter() - t0
            print(f"[{sampling:7s} {workload:10s}] baseline: "
                  f"{args.max_new/dt0:7.1f} tok/s "
                  f"({dt0/args.max_new*1e3:.2f} ms/tok)")

            for g in gammas:
              for K in ([None] if args.draft == "ngram"
                        else [int(x) for x in args.layers.split(",")]):
                spec = make_spec_decode_fn(cfg, sp, g, with_stats=True,
                                           draft=args.draft,
                                           draft_layers=K)
                st, it = spec(params, fresh_state(eng, prompt), mn)
                float(st.num_generated[0])           # compile
                st, it = spec(params, fresh_state(eng, prompt), mn)
                t0 = time.perf_counter()
                n = float(st.num_generated[0])
                iters = int(it) + 1                  # + init sample
                dt = time.perf_counter() - t0
                tag = f"gamma={g}" + (f" K={K}" if K else "")
                print(f"  {tag}: {n/dt:7.1f} tok/s  "
                      f"{n/iters:5.2f} tok/iter  "
                      f"{dt/iters*1e3:5.2f} ms/iter  ({iters} iters)")


if __name__ == "__main__":
    main()
