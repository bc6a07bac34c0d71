"""Headline benchmark: stage-2 KD step throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the reference's hot path (train.py:43-116) rebuilt TPU-native:
student Qwen3-0.6B + LoRA(r=32, rsLoRA) forward/backward + AdamW with
sparse top-K distillation loss (precomputed-logits mode, the reference's
recommended configuration) at bs=4 x seq=512, the reference defaults.

The reference publishes no throughput numbers (BASELINE.json "published": {}),
so ``vs_baseline`` reports measured-MFU / 0.35 — the driver-supplied
north-star target of >=35% MFU.
"""
import argparse
import json
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="precomputed",
                   choices=["precomputed", "online_sparse", "online_dense",
                            "decode", "serve", "tts", "tts_streaming",
                            "tts_serve", "stage1", "s3", "extract", "eval",
                            "all"])
    p.add_argument("--bench_only", default="",
                   help="--mode all: comma-separated bench names to "
                        "(re)run; other entries are carried over from the "
                        "existing BENCH_ALL.json (selective refresh)")
    # per-device batch 8: the reference's effective batch is 16
    # (bs4 x grad-accum 4, train.py:333-334); 8 feeds the MXU better than 4
    # while staying inside that envelope
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--top_k", type=int, default=128)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--fused_loss", action="store_true",
                   help="chunked fused lm-head loss (memory-bound configs)")
    p.add_argument("--fused_backend", default="xla",
                   choices=["xla", "pallas"])
    p.add_argument("--no_remat", action="store_true",
                   help="disable per-layer rematerialization (activations "
                        "fit at short seq; saves the recompute pass)")
    p.add_argument("--remat_policy", default="full",
                   choices=["full", "dots", "half", "everything"],
                   help="jax.checkpoint policy ('everything' saves all "
                        "residuals = no recompute, keeps checkpoint HLO)")
    p.add_argument("--attn", default="auto",
                   choices=["auto", "xla", "pallas"])
    p.add_argument("--decode_max_len", type=int, default=4096,
                   help="decode mode: KV cache capacity per stream")
    p.add_argument("--decode_streams", type=int, default=1,
                   help="decode mode: concurrent sequences (batched serving)")
    p.add_argument("--spec_gamma", type=int, default=0,
                   help="decode mode (B=1): prompt-lookup speculative "
                        "decoding with this many draft tokens per step "
                        "(0 = off; vLLM ngram speculative equivalent)")
    p.add_argument("--spec_ngram", type=int, default=3,
                   help="max n-gram length for the prompt-lookup draft")
    p.add_argument("--spec_draft", default="ngram",
                   choices=["ngram", "layer_skip"],
                   help="speculative draft: prompt lookup, or layer-skip "
                        "self-drafting (first --spec_layers layers + lm "
                        "head; survives the RAS sampler)")
    p.add_argument("--spec_layers", type=int, default=None,
                   help="layer_skip draft depth K (e.g. 7 of 28)")
    p.add_argument("--decode_prompt", default="random",
                   choices=["random", "repetitive"],
                   help="decode mode B=1 prompt/workload shape: random "
                        "ids, or a repetitive speech-token-like stream "
                        "(the prompt-lookup speculation sweet spot)")
    p.add_argument("--decode_sampling", default="sampled",
                   choices=["sampled", "greedy"],
                   help="decode mode: reference sampling params (T=0.6, "
                        "RAS) or greedy top-1 (the predictable-output "
                        "regime where speculation accepts most drafts)")
    p.add_argument("--prefix_len", type=int, default=0,
                   help="decode mode: shared prompt-prefix length — measures "
                        "the prefix-KV-cache serving path vs cold prefill")
    p.add_argument("--quant", default="none",
                   choices=["none", "int8", "int8_embed", "int4",
                            "int4_embed", "nf4"],
                   help="decode mode: weight-only quantized serving "
                        "(*_embed also quantizes the tied embed/lm-head "
                        "to int8; int4 layer weights use the fused "
                        "dequant-matmul kernel)")
    p.add_argument("--serve_phase", default="both",
                   choices=["both", "continuous", "static", "paged",
                            "compare"],
                   help="serve mode: run one phase (continuous slots / "
                        "static batches / paged-KV slots), 'both' "
                        "(continuous vs static) or 'compare' (all three) "
                        "via subprocesses")
    p.add_argument("--serve_admission", default="fifo",
                   choices=["fifo", "shortest_job", "shortest_prompt",
                            "deadline"],
                   help="paged serve: admission order under contention "
                        "(shortest_job = ascending declared generation "
                        "budget, cuts TTFT percentiles under sustained "
                        "load; deadline = earliest-TTFT-deadline first, "
                        "pair with --serve_ttft_deadline)")
    p.add_argument("--serve_ttft_deadline", type=float, default=0.0,
                   help="paged serve: per-request TTFT deadline in "
                        "seconds (0 = off). Queued requests past their "
                        "deadline before any token are SHED; percentiles "
                        "are then over served requests, with shed count "
                        "and goodput reported alongside")
    p.add_argument("--serve_arrival_rate", type=float, default=0.0,
                   help="paged serve: open-loop Poisson arrival rate in "
                        "requests/s (0 = all requests arrive at t0 — the "
                        "saturated-batch default). TTFT/e2e clocks start "
                        "at each request's arrival, so percentiles are "
                        "production-shaped latency under offered load")
    p.add_argument("--paged_pool_frac", type=float, default=1.0,
                   help="paged serve: KV pool size as a fraction of "
                        "slots*max_len (paged attention reads resident "
                        "tokens only, so <1.0 trades preemption risk for "
                        "HBM; 1.0 = same memory as the contiguous engine)")
    p.add_argument("--page_size", type=int, default=128,
                   help="paged serve: tokens per KV page")
    p.add_argument("--no_prefix_sharing", action="store_true",
                   help="paged serve: disable the automatic prefix cache "
                        "(ablation baseline)")
    p.add_argument("--serve_chunk_steps", type=int, default=32,
                   help="serve: decode steps per jitted chunk between "
                        "host scheduling passes (smaller = faster slot "
                        "refill, more host syncs)")
    p.add_argument("--serve_prefill_chunk", type=int, default=0,
                   help="paged serve: chunked prefill — max prompt tokens "
                        "prefilled per scheduler pass (0 = whole prompt)")
    p.add_argument("--serve_request_factor", type=int, default=3,
                   help="serve: requests = factor * slots (raise for "
                        "sustained-load steady state — the fixed default "
                        "workload tails off to low occupancy)")
    p.add_argument("--serve_win_pages", type=int, default=4,
                   help="paged serve: pages per attention DMA window")
    p.add_argument("--serve_chunk_exit_free", type=int, default=0,
                   help="paged serve: early-exit a decode chunk once this "
                        "many slots retire while requests queue (0 = run "
                        "chunks to the boundary; raises occupancy under "
                        "sustained load at the cost of more dispatches)")
    p.add_argument("--serve_prompt_min", type=int, default=64,
                   help="serve: min DISTINCT context tokens per request")
    p.add_argument("--serve_prompt_max", type=int, default=128,
                   help="serve: max DISTINCT context tokens per request "
                        "(long distinct contexts = the KV-capacity regime "
                        "where the int8 pool pays)")
    p.add_argument("--serve_kv_quant", action="store_true",
                   help="paged serve: int8 KV pool with per-token scales "
                        "(half the pool HBM / page DMA bytes — the vLLM "
                        "quantized-KV-cache capability)")
    p.add_argument("--serve_prefix_len", type=int, default=0,
                   help="serve: prepend a common prefix of this many "
                        "tokens to every request (the longform-TTS "
                        "regime: shared dialogue history; the paged "
                        "engine's prefix cache prefills it once)")
    p.add_argument("--tts_gen_tokens", type=int, default=150,
                   help="tts_streaming: generated speech tokens per turn "
                        "(25/s; longer turns grow the offline pipeline's "
                        "first-audio latency linearly, streaming's stays "
                        "flat)")
    p.add_argument("--topk_recall", type=float, default=None,
                   help="online_sparse: approx_max_k recall target "
                        "(default: DistillConfig.online_topk_recall=0.95)")
    p.add_argument("--online_topk_method", default=None,
                   choices=["approx", "exact"],
                   help="online_sparse: teacher top-K extraction method "
                        "(exact = segmented bit-parity selection)")
    p.add_argument("--extract_impl", default="materialized",
                   choices=["fused", "materialized", "chunked"],
                   help="extract mode: fused chunked scan; materialized "
                        "logits + segmented exact top-k (default); or the "
                        "old materialized + chunked exact top-k")
    p.add_argument("--tts_incremental", action="store_true",
                   help="tts_streaming mode: per-Euler-step cached flow "
                        "(O(n) total) instead of the prefix recompute "
                        "(O(n^2/chunk)) — per-chunk latency stays flat "
                        "in turn length; extras report first-vs-last "
                        "chunk-gap medians as the evidence")
    p.add_argument("--tts_batch", type=int, default=1,
                   help="tts mode: concurrent turns through flow+vocoder")
    p.add_argument("--tts_serve_sessions", default="4,8,16",
                   help="tts_serve mode: comma list of concurrent-session "
                        "counts to sweep (headline = the largest)")
    p.add_argument("--tts_serve_chunk_steps", type=int, default=16,
                   help="tts_serve mode: LLM decode-chunk steps between "
                        "synthesis ticks")
    p.add_argument("--opt8bit", action="store_true",
                   help="int8-quantized AdamW moments (bnb adamw_8bit "
                        "equivalent) — frees ~1GB of opt-state HBM at the "
                        "headline config; retest larger batches with it")
    p.add_argument("--split_apply", action="store_true",
                   help="KD step as TWO programs (grad + donated apply): "
                        "donation on the full step stalls the axon remote "
                        "compiler, but a standalone apply donates fine — "
                        "in-place state buffers at the cost of one extra "
                        "dispatch (implies donation of the apply inputs)")
    p.add_argument("--donate", action="store_true",
                   help="donate the train state to the step (in-place "
                        "buffer reuse; the trainer always does this — off "
                        "by default here only for state-inspection runs)")
    p.add_argument("--teacher_quant", default="none",
                   choices=["none", "int8", "nf4"],
                   help="online modes: quantize the in-loop teacher "
                        "(reference train.py:139-153; int8/nf4 halve/quarter "
                        "teacher HBM, dequantized per layer in the scan)")
    args = p.parse_args()

    import jax
    # persistent compile cache: compiles through the axon relay are slow,
    # and these exact programs are pre-warmed
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from speech_distill_tpu.core.config import (
        DistillConfig, LoraConfig, qwen3_student_0p6b, qwen3_teacher_1p7b)
    from speech_distill_tpu.distill import train_step
    from speech_distill_tpu.distill.lora import init_lora
    from speech_distill_tpu.models import qwen3

    if args.mode == "all":
        only = {s.strip() for s in args.bench_only.split(",") if s.strip()}
        return bench_all(only=(only or None))
    if args.mode == "decode":
        return bench_decode(args)
    if args.mode == "serve":
        return bench_serve(args)
    if args.mode == "tts":
        return bench_tts(args)
    if args.mode == "tts_streaming":
        return bench_tts_streaming(args)
    if args.mode == "tts_serve":
        return bench_tts_serve(args)
    if args.mode == "stage1":
        return bench_stage1(args)
    if args.mode == "s3":
        return bench_s3(args)
    if args.mode == "extract":
        return bench_extract(args)
    if args.mode == "eval":
        return bench_eval(args)

    import dataclasses
    cfg = dataclasses.replace(qwen3_student_0p6b(),
                              remat=not args.no_remat, attn_impl=args.attn,
                              remat_policy=args.remat_policy)
    dcfg = DistillConfig(top_k=args.top_k,
                         lora=LoraConfig(init_weights="gaussian"))
    if args.topk_recall is not None:
        dcfg = dataclasses.replace(dcfg, online_topk_recall=args.topk_recall)
    if args.online_topk_method is not None:
        dcfg = dataclasses.replace(dcfg,
                                   online_topk_method=args.online_topk_method)
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    lora, base = init_lora(jax.random.PRNGKey(1), params, cfg, dcfg.lora)
    del params
    opt = train_step.make_optimizer(5e-5, 10, 1000,
                                    eight_bit=args.opt8bit)
    state = train_step.init_state(lora, opt)

    teacher_params = None
    teacher_cfg = None
    if args.mode != "precomputed":
        teacher_cfg = qwen3_teacher_1p7b()
        # on-device init: 3.4GB of bf16 teacher weights never cross the host
        teacher_params = qwen3.init_params_on_device(2, teacher_cfg)
        if args.teacher_quant != "none":
            from speech_distill_tpu.ops.quant import quantize_params
            bits = 8 if args.teacher_quant == "int8" else 4
            teacher_params = jax.jit(lambda p: quantize_params(
                p, bits=bits, quantize_embed=args.teacher_quant == "int8",
                method=args.teacher_quant))(teacher_params)

    rng = np.random.default_rng(0)
    B, T, K = args.batch, args.seq, args.top_k
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, cfg.vocab_size, (1, B, T)),
                                 jnp.int32),
        "attention_mask": jnp.ones((1, B, T), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, cfg.vocab_size, (1, B, T)),
                              jnp.int32),
    }
    if args.mode == "precomputed":
        batch["teacher_top_k_v"] = jnp.asarray(
            rng.normal(size=(1, B, T, K)) - 3, jnp.float16)
        batch["teacher_top_k_i"] = jnp.asarray(
            rng.integers(0, cfg.vocab_size, (1, B, T, K)), jnp.int32)

    step = train_step.make_kd_step(cfg, dcfg, opt, mode=args.mode,
                                   teacher_cfg=teacher_cfg,
                                   donate=args.donate or args.split_apply,
                                   split_apply=args.split_apply,
                                   fused_loss=args.fused_loss,
                                   fused_backend=args.fused_backend)

    for _ in range(args.warmup):
        state, metrics = step(state, base, teacher_params, batch)
    # force full execution (block_until_ready is unreliable on relayed
    # platforms; a scalar readback is not)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, base, teacher_params, batch)
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    steps_per_sec = args.steps / dt
    tokens_per_sec = steps_per_sec * B * T

    # MFU: student fwd+bwd ~= 3x fwd; online modes add teacher fwd
    flops_token = 3.0 * qwen3.flops_per_token(cfg, T)
    if teacher_cfg is not None:
        flops_token += qwen3.flops_per_token(teacher_cfg, T)
    achieved = tokens_per_sec * flops_token
    peak = 197e12  # v5e bf16 peak FLOP/s
    mfu = achieved / peak

    print(json.dumps({
        "metric": f"kd_{args.mode}_student_tokens_per_sec_per_chip",
        "value": round(tokens_per_sec, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": round(mfu / 0.35, 3),
        "extra": {"steps_per_sec": round(steps_per_sec, 3),
                  "mfu": round(mfu, 4),
                  "loss": float(metrics["loss"])},
    }))


def bench_decode(args):
    """Single-stream autoregressive decode throughput (the TTS hot loop:
    up to 3000 speech tokens/turn, soulxpodcast/config.py:113)."""
    import jax
    import numpy as np
    from speech_distill_tpu.core.config import (SamplingParams,
                                                qwen3_student_0p6b)
    from speech_distill_tpu.infer.engine import DecodeEngine
    from speech_distill_tpu.models import qwen3

    cfg = qwen3_student_0p6b()
    params = qwen3.init_params_on_device(0, cfg)
    if args.quant != "none":
        from speech_distill_tpu.ops.quant import quantize_params
        method = {"int8": "int8", "int8_embed": "int8",
                  "int4": "int4", "int4_embed": "int4",
                  "nf4": "nf4"}[args.quant]
        bits = 8 if method == "int8" else 4
        params = jax.jit(lambda p: quantize_params(
            p, bits=bits,
            quantize_embed=args.quant.endswith("_embed"),
            method=method))(params)
    sp_kw = {}
    if args.decode_sampling == "greedy":
        # pure argmax (penalty off): the canonical predictable-output
        # regime for speculation — a persistent penalty set keeps even a
        # greedy stream aperiodic, which is a sampling artifact, not a
        # speculation property
        sp_kw = dict(temperature=1.0, top_k=1, top_p=1.0, use_ras=False,
                     repetition_penalty=1.0)
    sp = SamplingParams(max_tokens=256, min_tokens=256,
                        stop_token_ids=(cfg.eos_token_id,),
                        topk_method="approx", **sp_kw)
    eng = DecodeEngine(params, cfg, sp, max_len=args.decode_max_len,
                       spec_gamma=args.spec_gamma,
                       spec_ngram=args.spec_ngram,
                       spec_draft=args.spec_draft,
                       spec_layers=args.spec_layers)
    rng = np.random.default_rng(0)
    B = args.decode_streams
    if B == 1:
        if args.decode_prompt == "repetitive":
            # speech-token-like stream: a short cycling motif (prompt
            # audio tokens repeat at phone/frame granularity) — the
            # regime prompt-lookup speculation targets
            motif = rng.integers(cfg.speech_token_offset,
                                 cfg.vocab_size, 8).tolist()
            prompt = (motif * 16)[:128]
        else:
            prompt = rng.integers(0, cfg.vocab_size, 128).tolist()
        eng.generate(prompt)                     # compile + warmup
        t0 = time.perf_counter()
        out = eng.generate(prompt)
        n = len(out["token_ids"])
    else:
        shared = rng.integers(0, cfg.vocab_size, args.prefix_len).tolist()
        prompts = [shared + rng.integers(0, cfg.vocab_size,
                                         int(rng.integers(64, 128))).tolist()
                   for _ in range(B)]
        eng.generate_batch(prompts, max_new=256)  # compile + warm the cache
        extra = {}
        if args.prefix_len:
            # unmeasured warmup of the no-cache path too: its prefill runs
            # at a wider bucket (prefix folded into the batch), a shape the
            # cached path never compiled — without this, cold_seconds would
            # include a relay XLA compile and inflate the speedup
            eng.generate_batch(prompts, max_new=8, use_prefix_cache=False)
            t0 = time.perf_counter()
            eng.generate_batch(prompts, max_new=256, use_prefix_cache=False)
            extra["cold_seconds"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        outs = eng.generate_batch(prompts, max_new=256)
        n = sum(len(o) for o in outs)
    dt = time.perf_counter() - t0
    extra_d = {"tokens": n, "seconds": round(dt, 3),
               "audio_rtf": round((n / B / 25.0) / dt, 2), "streams": B}
    if args.quant != "none":
        extra_d["quant"] = args.quant
    if args.spec_gamma:
        extra_d["spec_gamma"] = args.spec_gamma
        extra_d["workload"] = args.decode_prompt
    if args.decode_sampling != "sampled":
        extra_d["sampling"] = args.decode_sampling
    if B > 1:
        extra_d.update(extra)
        if args.prefix_len:
            extra_d["prefix_len"] = args.prefix_len
            extra_d["prefix_cache_speedup"] = round(
                extra["cold_seconds"] / dt, 3)
    print(json.dumps({
        "metric": f"decode_tokens_per_sec_b{B}",
        "value": round(n / dt, 2),
        "unit": "tokens/s",
        "vs_baseline": 1.0,
        "extra": extra_d,
    }))


def bench_all(only=None):
    """Every benchmark surface as one reproducible artifact: runs each
    mode in its own subprocess (sequential — the TPU claim is exclusive,
    and per-process isolation keeps one OOM from poisoning the rest),
    streams one JSON line per result, and writes BENCH_ALL.json.

    ``only`` (set of bench names) selectively re-runs those benches and
    carries every other entry over from the existing BENCH_ALL.json, so
    new surfaces can be appended without re-measuring the world. The
    artifact is rewritten after every bench so a partial run still
    persists its progress.
    """
    import subprocess
    import sys
    runs = [
        ("precomputed", []),
        ("online_sparse", []),
        ("online_dense", []),
        ("stage1", []),
        ("extract", []),
        ("decode", []),
        # prompt-lookup speculative decoding in its paying regime
        # (greedy, repetitive speech-token stream); the default RAS
        # sampler rejects n-gram drafts by design (docs/ROUND3.md)
        ("decode_spec_greedy", ["--mode", "decode", "--spec_gamma", "7",
                                "--decode_sampling", "greedy",
                                "--decode_prompt", "repetitive",
                                "--decode_max_len", "1024"]),
        # --decode_max_len 1024: at the 4096 default the contiguous
        # 16-stream cache is 7.5 GB and OOMs depending on when the
        # pre-quantization bf16 params get collected
        ("decode_serving16_int8", ["--mode", "decode", "--decode_streams",
                                   "16", "--decode_max_len", "1024",
                                   "--quant", "int8_embed"]),
        ("serve", ["--mode", "serve", "--quant", "int8_embed",
                   "--decode_streams", "16", "--decode_max_len", "1024",
                   "--serve_phase", "compare"]),
        # serving champion config: 64 slots over a half-size bf16 pool
        # (a full 64-slot pool exceeds HBM; preemption covers the tail)
        ("serve_paged64", ["--mode", "serve", "--serve_phase", "paged",
                           "--quant", "int8_embed",
                           "--decode_streams", "64",
                           "--paged_pool_frac", "0.5"]),
        # sustained load: 10x-slots requests (the 3x default tails off
        # to ~58% occupancy and understates steady state)
        ("serve_sustained", ["--mode", "serve", "--serve_phase", "paged",
                             "--quant", "int8_embed",
                             "--decode_streams", "64",
                             "--paged_pool_frac", "0.5",
                             "--serve_request_factor", "10"]),
        # shortest-job admission: halves TTFT p50 at equal throughput
        # (p95 is admission-capacity-bound at this all-at-t0 load)
        ("serve_sustained_sjf", ["--mode", "serve",
                                 "--serve_phase", "paged",
                                 "--quant", "int8_embed",
                                 "--decode_streams", "64",
                                 "--paged_pool_frac", "0.5",
                                 "--serve_request_factor", "10",
                                 "--serve_admission", "shortest_job"]),
        # open-loop Poisson arrivals at ~80% of measured capacity
        # (capacity ~3.8k tok/s / ~160 tok mean gen = ~24 req/s): TTFT
        # percentiles from ARRIVAL are the production-shaped latency
        # number (the all-at-t0 phases above measure saturated batch
        # throughput, where TTFT is queue-position-dominated)
        ("serve_poisson", ["--mode", "serve", "--serve_phase", "paged",
                           "--quant", "int8_embed",
                           "--decode_streams", "64",
                           "--paged_pool_frac", "0.5",
                           "--serve_request_factor", "10",
                           "--serve_arrival_rate", "20"]),
        # deadline admission + load shedding at the same sustained load:
        # p95 TTFT there is admission-capacity-bound (~24 s structural
        # floor, docs/ROUND4.md), so the remaining latency lever is
        # shedding work that already missed its deadline — quote goodput
        # (served tok/s) + shed rate + percentiles over served
        ("serve_sustained_deadline", ["--mode", "serve",
                                      "--serve_phase", "paged",
                                      "--quant", "int8_embed",
                                      "--decode_streams", "64",
                                      "--paged_pool_frac", "0.5",
                                      "--serve_request_factor", "10",
                                      "--serve_admission", "deadline",
                                      "--serve_ttft_deadline", "12"]),
        # long distinct contexts at equal pool HBM: bf16 vs int8 KV pool
        ("serve_long_bf16", ["--mode", "serve", "--serve_phase", "paged",
                             "--quant", "int8_embed",
                             "--decode_streams", "16",
                             "--serve_prompt_min", "1500",
                             "--serve_prompt_max", "1800",
                             "--paged_pool_frac", "0.375",
                             "--no_prefix_sharing"]),
        ("serve_long_int8kv", ["--mode", "serve", "--serve_phase",
                               "paged", "--quant", "int8_embed",
                               "--decode_streams", "16",
                               "--serve_prompt_min", "1500",
                               "--serve_prompt_max", "1800",
                               "--paged_pool_frac", "0.75",
                               "--serve_kv_quant",
                               "--no_prefix_sharing"]),
        ("serve_paged_prefix", ["--mode", "serve", "--serve_phase", "paged",
                                "--quant", "int8_embed",
                                "--decode_streams", "16",
                                "--decode_max_len", "1024",
                                "--serve_prefix_len", "256"]),
        ("eval", []),
        ("tts", []),
        ("tts_streaming", ["--mode", "tts_streaming",
                           "--quant", "int8_embed"]),
        # long-turn streaming with the O(n) per-Euler-step cached flow;
        # flatness evidence = chunk_gap_ms_first vs _last in extras
        ("tts_streaming_inc", ["--mode", "tts_streaming",
                               "--quant", "int8_embed",
                               "--tts_gen_tokens", "1200",
                               "--tts_incremental"]),
        ("tts_serve", ["--mode", "tts_serve", "--quant", "int8_embed"]),
        ("s3", []),
    ]
    if only:
        unknown = set(only) - {n for n, _ in runs}
        if unknown:
            raise SystemExit(f"--bench_only: unknown benches "
                             f"{sorted(unknown)}")
    # Always seed from the prior artifact: full runs progressively
    # replace entries (an interrupted run keeps not-yet-remeasured
    # results), selective runs refresh only the named benches.
    prior = {}
    try:
        with open("BENCH_ALL.json") as f:
            prior = {e.get("bench"): e for e in json.load(f)}
    except (OSError, ValueError):
        pass
    merged = {name: prior.get(name) for name, _ in runs}
    orphans = [e for n, e in prior.items() if n not in merged]
    for e in orphans:
        print(f"bench_all: retaining prior entry "
              f"{e.get('bench')!r} (no matching run name)",
              file=sys.stderr)

    def persist():
        with open("BENCH_ALL.json", "w") as f:
            json.dump([merged[n] for n, _ in runs if merged[n] is not None]
                      + orphans, f, indent=1)

    for name, extra in runs:
        if only is not None and name not in only:
            continue
        cmd = [sys.executable, __file__] + (extra or ["--mode", name])
        r = subprocess.run(cmd, capture_output=True, text=True)
        if r.returncode != 0:
            entry = {"bench": name, "error": r.stderr[-500:]}
        else:
            entry = {"bench": name,
                     **json.loads(r.stdout.strip().splitlines()[-1])}
        merged[name] = entry
        print(json.dumps(entry), flush=True)
        persist()


def _serve_workload(vocab: int, S: int, prefix_len: int = 0,
                    prompt_min: int = 64, prompt_max: int = 128,
                    factor: int = 3):
    """Seeded workload shared by all serve phases (run in separate
    processes): variable generation lengths (exponential-ish service
    times — the regime where continuous batching wins). ``prefix_len``
    prepends a common token prefix to every request (shared dialogue
    history — the prefix-cache regime). ``prompt_min/max`` set the
    DISTINCT per-request context length (long distinct contexts are the
    KV-capacity regime, where the int8 pool pays)."""
    rng = np.random.default_rng(0)
    N = factor * S
    common = rng.integers(0, vocab, prefix_len).tolist()
    prompts = [common
               + rng.integers(0, vocab,
                              int(rng.integers(prompt_min,
                                               prompt_max))).tolist()
               for _ in range(N)]
    caps = np.clip(rng.exponential(160, N).astype(int), 32, 448).tolist()
    return prompts, caps


def bench_serve(args):
    """Continuous-batching serving throughput: a queue of requests with
    VARIABLE generation lengths through a fixed slot pool — streams retire
    on completion and queued prompts join mid-flight (the vLLM scheduler
    capability, reference llm_engine.py:78-114). Compared against the
    static generate_batch path, where every batch runs until its slowest
    request. Each phase runs in its own process: two engines' KV caches
    (2 x 7.5 GB at 16x4096) do not fit one HBM, and an OOM poisons the
    axon process claim (CLAUDE.md)."""
    if args.serve_phase in ("both", "compare"):
        import subprocess
        import sys
        phases = (("continuous", "static") if args.serve_phase == "both"
                  else ("static", "continuous", "paged"))
        res = {}
        for ph in phases:
            r = subprocess.run(
                [sys.executable, __file__, "--mode", "serve",
                 "--serve_phase", ph, "--quant", args.quant,
                 "--decode_streams", str(args.decode_streams),
                 "--decode_max_len", str(args.decode_max_len),
                 "--paged_pool_frac", str(args.paged_pool_frac),
                 "--page_size", str(args.page_size),
                 "--serve_prefix_len", str(args.serve_prefix_len),
                 "--serve_prefill_chunk", str(args.serve_prefill_chunk),
                 "--serve_chunk_steps", str(args.serve_chunk_steps),
                 "--serve_prompt_min", str(args.serve_prompt_min),
                 "--serve_prompt_max", str(args.serve_prompt_max),
                 "--serve_win_pages", str(args.serve_win_pages),
                 "--serve_chunk_exit_free",
                 str(args.serve_chunk_exit_free),
                 "--serve_request_factor", str(args.serve_request_factor)]
                + (["--serve_kv_quant"] if args.serve_kv_quant else []),
                capture_output=True, text=True)
            if r.returncode != 0:
                raise RuntimeError(f"serve phase {ph} failed:\n{r.stderr[-2000:]}")
            res[ph] = json.loads(r.stdout.strip().splitlines()[-1])
        s = res["static"]
        if args.serve_phase == "compare":
            pg, c = res["paged"], res["continuous"]
            print(json.dumps({
                "metric": f"serve_paged_tokens_per_sec_s{args.decode_streams}",
                "value": pg["tokens_per_sec"],
                "unit": "tokens/s",
                "vs_baseline": round(pg["tokens_per_sec"]
                                     / s["tokens_per_sec"], 3),
                "extra": {"slots": args.decode_streams,
                          "requests": pg["requests"],
                          "tokens": pg["tokens"],
                          "seconds": pg["seconds"],
                          "preemptions": pg.get("preemptions", 0),
                          "pool_frac": args.paged_pool_frac,
                          "page_size": args.page_size,
                          "continuous_tokens_per_sec": c["tokens_per_sec"],
                          "static_tokens_per_sec": s["tokens_per_sec"],
                          "quant": args.quant},
            }))
            return
        c = res["continuous"]
        print(json.dumps({
            "metric": f"serve_continuous_tokens_per_sec_s{args.decode_streams}",
            "value": c["tokens_per_sec"],
            "unit": "tokens/s",
            "vs_baseline": round(c["tokens_per_sec"] / s["tokens_per_sec"], 3),
            "extra": {"slots": args.decode_streams,
                      "requests": c["requests"], "tokens": c["tokens"],
                      "seconds": c["seconds"],
                      "static_tokens_per_sec": s["tokens_per_sec"],
                      "static_seconds": s["seconds"],
                      "quant": args.quant},
        }))
        return

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from speech_distill_tpu.core.config import (SamplingParams,
                                                qwen3_student_0p6b)
    from speech_distill_tpu.models import qwen3

    cfg = qwen3_student_0p6b()
    params = qwen3.init_params_on_device(0, cfg)
    if args.quant != "none":
        from speech_distill_tpu.ops.quant import quantize_params
        method = {"int8": "int8", "int8_embed": "int8",
                  "int4": "int4", "int4_embed": "int4",
                  "nf4": "nf4"}[args.quant]
        bits = 8 if method == "int8" else 4
        params = jax.jit(lambda p: quantize_params(
            p, bits=bits,
            quantize_embed=args.quant.endswith("_embed"),
            method=method))(params)
    S = args.decode_streams
    sp = SamplingParams(max_tokens=512, min_tokens=1,
                        stop_token_ids=(cfg.eos_token_id,),
                        topk_method="approx")
    prompts, caps = _serve_workload(cfg.vocab_size, S,
                                    args.serve_prefix_len,
                                    args.serve_prompt_min,
                                    args.serve_prompt_max,
                                    args.serve_request_factor)
    N = len(prompts)

    if args.serve_phase == "continuous":
        from speech_distill_tpu.infer.continuous import ContinuousEngine
        ceng = ContinuousEngine(params, cfg, sp, slots=S,
                                max_len=args.decode_max_len,
                                chunk_steps=args.serve_chunk_steps,
                                cache_dtype=jnp.bfloat16)
        # warmup/compile: prefill bucket + chunk-decode + insert programs
        ceng.serve(prompts[:S], max_new=8)
        t0 = time.perf_counter()
        outs = ceng.serve(prompts, max_new_per_request=caps)
        dt = time.perf_counter() - t0
        n_tok = sum(len(o) for o in outs)
    elif args.serve_phase == "paged":
        from speech_distill_tpu.infer.paged import PagedEngine
        max_pages = -(-args.decode_max_len // args.page_size)
        num_pages = max(max_pages,
                        int(S * max_pages * args.paged_pool_frac))
        peng = PagedEngine(params, cfg, sp, slots=S,
                           max_len=args.decode_max_len,
                           num_pages=num_pages, page_size=args.page_size,
                           chunk_steps=args.serve_chunk_steps,
                           cache_dtype=(jnp.int8 if args.serve_kv_quant
                                        else jnp.bfloat16),
                           prefix_sharing=not args.no_prefix_sharing,
                           prefill_chunk=(args.serve_prefill_chunk
                                          or None),
                           attn_win_pages=args.serve_win_pages,
                           chunk_exit_free=(args.serve_chunk_exit_free
                                            or None),
                           admission_policy=args.serve_admission)
        peng.serve(prompts[:S], max_new=8)    # warmup/compile
        if not args.no_prefix_sharing:
            # Second warmup pass: the first pass registered prompts[:S]'s
            # prefix pages, so the timed phase admits those prompts down
            # the PREFIX-HIT path, whose (cached-pages, width) admit
            # buckets are distinct programs. Without this pass they
            # compile mid-run (round-4 serve_sustained_sjf: 9.4 s of
            # admit vs 1.8 s warm — CLAUDE.md "serve-bench hygiene").
            peng.serve(prompts[:S], max_new=8)
        arrivals = None
        if args.serve_arrival_rate > 0:
            # seeded Poisson process: exponential inter-arrival gaps
            gaps = np.random.default_rng(11).exponential(
                1.0 / args.serve_arrival_rate, len(prompts))
            arrivals = np.cumsum(gaps).tolist()
        t0 = time.perf_counter()
        outs = peng.serve(prompts, max_new_per_request=caps,
                          ttft_deadline_s=(args.serve_ttft_deadline
                                           or None),
                          arrival_per_request=arrivals)
        dt = time.perf_counter() - t0
        n_tok = sum(len(o) for o in outs)
        # percentiles over SERVED requests; shed ones are reported by count
        lat = [m for m in peng.request_metrics
               if m is not None and not m.get("shed")]
        pct = {}
        if lat:
            tt = np.sort([m["ttft_s"] for m in lat])
            ee = np.sort([m["e2e_s"] for m in lat])

            def q(a, p):
                return round(float(a[min(len(a) - 1,
                                         int(p * len(a)))]), 3)
            pct = {"ttft_p50_s": q(tt, 0.5), "ttft_p95_s": q(tt, 0.95),
                   "e2e_p50_s": q(ee, 0.5), "e2e_p95_s": q(ee, 0.95)}
        print(json.dumps({"phase": "paged", "requests": N, "tokens": n_tok,
                          "seconds": round(dt, 2),
                          "tokens_per_sec": round(n_tok / dt, 1),
                          **pct,
                          "served": len(lat),
                          "shed": peng.shed_requests,
                          "ttft_deadline_s": args.serve_ttft_deadline,
                          "arrival_rate": args.serve_arrival_rate,
                          "preemptions": peng.preemptions,
                          "prefix_hits": peng.prefix_hits,
                          "prefix_hit_tokens": peng.prefix_hit_tokens,
                          "num_pages": num_pages,
                          "page_size": args.page_size,
                          "kv_dtype": ("int8" if args.serve_kv_quant
                                       else "bf16"),
                          "phases": {k: round(v, 2) for k, v in
                                     peng.phase_seconds.items()},
                          "chunks": peng.n_chunks,
                          "decode_steps": peng.n_decode_steps,
                          "chunk_exit_free": args.serve_chunk_exit_free,
                          "admission": args.serve_admission,
                          "prefills": peng.n_prefills,
                          "prefill_chunks": peng.n_prefill_chunks}))
        return
    else:
        from speech_distill_tpu.infer.engine import DecodeEngine
        eng = DecodeEngine(params, cfg, sp, max_len=args.decode_max_len)
        eng.generate_batch(prompts[:S], max_new=8)       # compile
        t0 = time.perf_counter()
        n_tok = 0
        # static baseline: S-wide batches, each runs to its slowest request
        for g in range(0, N, S):
            group_caps = caps[g:g + S]
            bo = eng.generate_batch(prompts[g:g + S],
                                    max_new=int(max(group_caps)))
            n_tok += sum(min(len(o), c) for o, c in zip(bo, group_caps))
        dt = time.perf_counter() - t0

    print(json.dumps({"phase": args.serve_phase, "requests": N,
                      "tokens": n_tok, "seconds": round(dt, 2),
                      "tokens_per_sec": round(n_tok / dt, 1)}))


def bench_s3(args):
    """Audio->token throughput of the S3 semantic tokenizer (the raw-data
    path's bottleneck the reference offloads to dataloader workers,
    README.md:113-131; BASELINE north-star 'audio->token clips/sec').
    Batched jitted encoder+FSQ quantize over 10s clips (1,000 mel frames
    at 100 fps -> 250 codes at 25 Hz)."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from speech_distill_tpu.tokenizer import s3

    cfg = s3.S3Config()
    # on-device init: the ~480MB fp32 encoder is slow through the relay
    params = s3.init_params_on_device(0, cfg)

    rng = np.random.default_rng(0)
    B, T = args.batch * 2, 1024          # 10.24s clips, padded bucket
    mels = jnp.asarray(rng.normal(size=(B, cfg.n_mels, T)) * 0.5,
                       jnp.float32)
    lens = jnp.full((B,), 1000, jnp.int32)

    fn = jax.jit(lambda p, m, l: s3.quantize(p, m, l, cfg))
    codes, clens = fn(params, mels, lens)        # compile + warmup
    float(jnp.sum(codes))
    steps = args.steps
    t0 = time.perf_counter()
    for _ in range(steps):
        codes, clens = fn(params, mels, lens)
    float(jnp.sum(codes))
    dt = (time.perf_counter() - t0) / steps

    clip_s = 10.0
    clips_per_sec = B / dt
    print(json.dumps({
        "metric": "s3_audio_to_token_clips_per_sec",
        "value": round(clips_per_sec, 1),
        "unit": "10s-clips/s/chip",
        "vs_baseline": 1.0,
        "extra": {"batch": B,
                  "x_realtime": round(clips_per_sec * clip_s, 1),
                  "ms_per_batch": round(dt * 1000, 1)},
    }))


def bench_eval(args):
    """Distilled-quality eval harness throughput (distill/evaluate.py):
    exact full-vocab teacher-student agreement / KL(T=1) / CE over held-out
    positions — the product-quality measurement the reference never takes
    (its only signal is train-time sub-loss logging, train.py:107-114).
    Random 0.6B student vs 1.7B teacher; metric is evaluated positions/s."""
    import time
    import jax
    import jax.numpy as jnp
    from speech_distill_tpu.core.config import (qwen3_student_0p6b,
                                                qwen3_teacher_1p7b)
    from speech_distill_tpu.distill import evaluate as ev
    from speech_distill_tpu.models import qwen3

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    cfg = qwen3_student_0p6b()
    t_cfg = qwen3_teacher_1p7b()
    s_params = qwen3.init_params_on_device(0, cfg)
    t_params = qwen3.init_params_on_device(2, t_cfg)

    rng = np.random.default_rng(0)
    B, T = args.batch, args.seq
    smask = np.zeros((B, T), np.float32)
    smask[:, T // 2:] = 1.0
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)),
                                 jnp.int32),
        "attention_mask": jnp.ones((B, T), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)),
                              jnp.int32),
        "speech_token_mask": jnp.asarray(smask),
    }
    step = ev.make_agreement_step(cfg, t_cfg, k=10)

    for _ in range(args.warmup):
        sums = step(s_params, t_params, batch)
    float(sums["kl_all"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        sums = step(s_params, t_params, batch)
    float(sums["kl_all"])
    dt = time.perf_counter() - t0

    positions_per_sec = args.steps * B * T / dt
    flops_token = (qwen3.flops_per_token(cfg, T)
                   + qwen3.flops_per_token(t_cfg, T))
    mfu = positions_per_sec * flops_token / 197e12
    metrics = ev.finalize_metrics(jax.device_get(sums), k=10)
    print(json.dumps({
        "metric": "eval_agreement_positions_per_sec",
        "value": round(positions_per_sec, 1),
        "unit": "positions/s/chip",
        "vs_baseline": round(mfu / 0.35, 3),
        "extra": {"mfu": round(mfu, 4),
                  "top1_all": metrics["all"]["top1_agreement"],
                  "kl_all": metrics["all"]["kl_t1"]},
    }))


def bench_extract(args):
    """Offline teacher top-K logit extraction throughput (the L4 pipeline,
    reference extract_teacher_logits.py:95-129 — a 10-60min one-time GPU
    pass). Teacher 1.7B forward + fused exact top-K (the bit-parity
    artifact path used by pipelines/extract_logits.py)."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from speech_distill_tpu.core.config import (qwen3_student_0p6b,
                                                qwen3_teacher_1p7b)
    from speech_distill_tpu.models import qwen3
    from speech_distill_tpu.ops.fused_lm_loss import fused_extract_top_k

    t_cfg = qwen3_teacher_1p7b()
    s_cfg = qwen3_student_0p6b()
    teacher = qwen3.init_params_on_device(2, t_cfg)
    B, T, K = args.batch, args.seq, args.top_k

    if args.extract_impl == "fused":
        @jax.jit
        def extract(tp, ids, mask):
            hidden = qwen3.forward(tp, ids, t_cfg, attention_mask=mask,
                                   return_hidden=True)
            return fused_extract_top_k(hidden, qwen3.lm_head_weight(tp), K,
                                       s_cfg.vocab_size)
    elif args.extract_impl == "chunked":
        from speech_distill_tpu.distill.losses import chunked_top_k

        @jax.jit
        def extract(tp, ids, mask):
            logits = qwen3.forward(tp, ids, t_cfg, attention_mask=mask)
            logits = logits[..., :s_cfg.vocab_size].astype(jnp.float32)
            lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
            v, i = chunked_top_k(logits, K)
            return (v - lse).astype(jnp.float16), i.astype(jnp.int32)
    else:
        from speech_distill_tpu.distill.losses import extract_top_k

        @jax.jit
        def extract(tp, ids, mask):
            logits = qwen3.forward(tp, ids, t_cfg, attention_mask=mask)
            return extract_top_k(logits, K, s_cfg.vocab_size,
                                 method="exact")

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, s_cfg.vocab_size, (B, T)), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)
    v, i = extract(teacher, ids, mask)       # compile + warmup
    float(jnp.sum(i))
    t0 = time.perf_counter()
    for _ in range(args.steps):
        v, i = extract(teacher, ids, mask)
    float(jnp.sum(i))
    dt = (time.perf_counter() - t0) / args.steps

    tokens_per_sec = B * T / dt
    flops_token = qwen3.flops_per_token(t_cfg, T)
    print(json.dumps({
        "metric": "extract_teacher_topk_tokens_per_sec_per_chip",
        "value": round(tokens_per_sec, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": 1.0,
        "extra": {"batch": B, "seq": T, "top_k": K,
                  "impl": args.extract_impl,
                  "seqs_per_sec": round(B / dt, 2),
                  "teacher_fwd_mfu": round(
                      tokens_per_sec * flops_token / 197e12, 4)},
    }))


def bench_stage1(args):
    """Stage-1 warm-up SFT throughput: packed seq-4096 CE training of the
    new speech-token embedding rows only (reference stage1.py:298-325,
    packing=True, liger fused CE -> ops/fused_lm_loss here). Uses the
    fused lm-head CE: materialized [B*T, 159k] fp32 logits do not fit at
    these shapes."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from speech_distill_tpu.core.config import qwen3_student_0p6b
    from speech_distill_tpu.distill import train_step
    from speech_distill_tpu.models import qwen3

    B, T = max(1, args.batch // 4), 4096
    cfg = qwen3_student_0p6b()
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    trainable = {"embed": {"weight": params["embed"]["weight"]}}
    base = dict(params)
    opt = train_step.make_optimizer(5e-5, 10, 1000)
    state = train_step.init_state(trainable, opt)
    old_vocab = 151936
    step = train_step.make_stage1_step(cfg, opt, old_vocab, donate=False,
                                       fused_loss=True,
                                       fused_backend=args.fused_backend)

    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, cfg.vocab_size, (1, B, T)),
                                 jnp.int32),
        "attention_mask": jnp.ones((1, B, T), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, cfg.vocab_size, (1, B, T)),
                              jnp.int32),
    }
    for _ in range(args.warmup):
        state, metrics = step(state, base, batch)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, base, batch)
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    steps_per_sec = args.steps / dt
    tokens_per_sec = steps_per_sec * B * T
    flops_token = 3.0 * qwen3.flops_per_token(cfg, T)
    mfu = tokens_per_sec * flops_token / 197e12
    print(json.dumps({
        "metric": "stage1_sft_tokens_per_sec_per_chip",
        "value": round(tokens_per_sec, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": round(mfu / 0.35, 3),
        "extra": {"steps_per_sec": round(steps_per_sec, 3),
                  "mfu": round(mfu, 4), "batch": B, "seq": T,
                  "loss": float(metrics["loss"])},
    }))


def bench_tts_streaming(args):
    """End-to-end STREAMING TTS: real 0.6B LLM decode feeding incremental
    flow+HiFT synthesis (infer/streaming_tts.py) — wav chunks emitted while
    the LLM is still generating. Headline: first-audio latency (TTFA) vs
    the offline pipeline, whose TTFA is its entire turn (the reference
    always synthesizes after the full turn, soulxpodcast.py:400-428)."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from speech_distill_tpu.core.config import (SamplingParams,
                                                qwen3_student_0p6b)
    from speech_distill_tpu.infer.engine import DecodeEngine
    from speech_distill_tpu.infer import streaming_tts
    from speech_distill_tpu.models import flow as flow_lib
    from speech_distill_tpu.models import hift as hift_lib
    from speech_distill_tpu.models import qwen3

    cfg = qwen3_student_0p6b()
    params = qwen3.init_params_on_device(0, cfg)
    if args.quant != "none":
        from speech_distill_tpu.ops.quant import quantize_params
        method = {"int8": "int8", "int8_embed": "int8",
                  "int4": "int4", "int4_embed": "int4",
                  "nf4": "nf4"}[args.quant]
        bits = 8 if method == "int8" else 4
        params = jax.jit(lambda p: quantize_params(
            p, bits=bits, quantize_embed=args.quant.endswith("_embed"),
            method=method))(params)
    n_gen = args.tts_gen_tokens             # 150 = a 6 s turn at 25 Hz
    sp = SamplingParams(max_tokens=n_gen + 1, min_tokens=n_gen + 1,
                        stop_token_ids=(cfg.eos_token_id,),
                        topk_method="approx")
    eng = DecodeEngine(params, cfg, sp,
                       max_len=max(1024, 256 + 8 * (n_gen // 8 + 1)))

    fcfg = flow_lib.FlowConfig()
    hcfg = hift_lib.HiFTConfig()
    fparams = flow_lib.init_params(jax.random.PRNGKey(0), fcfg)
    hparams = hift_lib.init_params(jax.random.PRNGKey(1), hcfg)

    rng = np.random.default_rng(0)
    n_prompt = 75
    prompt_speech = rng.integers(0, 6561, n_prompt).tolist()
    prompt_mel = rng.normal(size=(n_prompt * 2, 80)).astype(np.float32) * .1
    spk = rng.normal(size=(192,)).astype(np.float32)
    llm_prompt = rng.integers(0, cfg.vocab_size, 128).tolist()

    programs = streaming_tts.make_stream_programs(fcfg, hcfg)

    inc_kw = {}
    if args.tts_incremental:
        inc_kw = dict(incremental=True,
                      inc_max_frames=2 * (n_prompt + n_gen) + 512)

    def run():
        t0 = time.perf_counter()
        ttfa, samples, marks = None, 0, []
        for wav in streaming_tts.stream_tts(
                eng, fparams, fcfg, hparams, hcfg, llm_prompt,
                cfg.speech_token_offset, prompt_speech, prompt_mel,
                n_prompt * 2, spk, jax.random.PRNGKey(2),
                programs=programs, **inc_kw):
            if ttfa is None:
                ttfa = time.perf_counter() - t0
            samples += wav.shape[0]
            marks.append(time.perf_counter())
        return ttfa, time.perf_counter() - t0, samples, marks

    run()                                   # compile every bucket + warmup
    ttfa, total, samples, marks = run()
    n_chunks = len(marks)
    # chunk-gap medians early vs late in the turn: the flatness evidence
    # for the incremental flow (the recompute form grows linearly as the
    # re-encoded prefix lengthens). Gaps include the interleaved LLM
    # decode chunk (~constant), so growth isolates to synthesis.
    gaps = np.diff(np.asarray(marks)) * 1e3
    k = min(10, max(1, len(gaps) // 3))
    gap_first = float(np.median(gaps[:k])) if len(gaps) else 0.0
    gap_last = float(np.median(gaps[-k:])) if len(gaps) else 0.0

    # offline comparison on the same turn: full decode, then one-shot
    # flow+vocoder (bucketed widths like _token_to_wav)
    flow_fn = jax.jit(lambda fp, t, tl, pf, pfl, emb, rng:
                      flow_lib.forward_flow(fp, t, tl, pf, pfl, emb, fcfg,
                                            rng=rng))
    hift_fn = jax.jit(lambda hp, mel, rng: hift_lib.forward(
        hp, mel, hcfg, rng=rng))

    def run_offline():
        t0 = time.perf_counter()
        out = eng.generate(llm_prompt)
        gen = [t - cfg.speech_token_offset for t in out["token_ids"][:-1]]
        toks = prompt_speech + gen
        W = -(-len(toks) // 64) * 64
        arr = np.zeros((1, W), np.int32)
        arr[0, :len(toks)] = toks
        mels, _ = flow_fn(fparams, jnp.asarray(arr),
                          jnp.asarray([len(toks)], jnp.int32),
                          jnp.asarray(prompt_mel[None]),
                          jnp.asarray([n_prompt * 2], jnp.int32),
                          jnp.asarray(spk[None]), jax.random.PRNGKey(3))
        wav, _ = hift_fn(hparams, mels[:, n_prompt * 2:],
                         jax.random.PRNGKey(4))
        float(np.asarray(wav[0, 0]))
        return time.perf_counter() - t0

    run_offline()                           # compile + warmup
    offline_s = run_offline()

    audio_s = samples / hcfg.sampling_rate
    print(json.dumps({
        "metric": "tts_streaming_first_audio_ms",
        "value": round(ttfa * 1e3, 1),
        "unit": "ms",
        # offline first-audio = the whole turn's wall clock
        "vs_baseline": round(offline_s / ttfa, 2),
        "extra": {"total_s": round(total, 3), "audio_s": round(audio_s, 2),
                  "rtf": round(audio_s / total, 2), "chunks": n_chunks,
                  "offline_turn_s": round(offline_s, 3),
                  "chunk_gap_ms_first": round(gap_first, 1),
                  "chunk_gap_ms_last": round(gap_last, 1),
                  "incremental": bool(args.tts_incremental),
                  "gen_tokens": n_gen, "quant": args.quant},
    }))


def bench_tts_serve(args):
    """Concurrent multi-session TTS serving (infer/tts_serve.py): N podcast
    turns decode through ONE PagedEngine slot pool while flow+HiFT run as
    BATCHED per-chunk ticks — the capability the reference cannot express
    (its flow/vocoder are strictly per-turn B=1 after generation,
    soulxpodcast.py:252-432). Headline: aggregate x-realtime at the largest
    N; extras carry the N sweep and per-session TTFA percentiles.
    vs_baseline = aggregate audio throughput at N_max over the N=1
    single-session rate through the same stack (the reference's serial
    ceiling)."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from speech_distill_tpu.core.config import (SamplingParams,
                                                qwen3_student_0p6b)
    from speech_distill_tpu.infer.paged import PagedEngine
    from speech_distill_tpu.infer import streaming_tts
    from speech_distill_tpu.infer.tts_serve import (MultiSessionTTS,
                                                    TTSSession)
    from speech_distill_tpu.models import flow as flow_lib
    from speech_distill_tpu.models import hift as hift_lib
    from speech_distill_tpu.models import qwen3

    cfg = qwen3_student_0p6b()
    params = qwen3.init_params_on_device(0, cfg)
    if args.quant != "none":
        from speech_distill_tpu.ops.quant import quantize_params
        method = {"int8": "int8", "int8_embed": "int8",
                  "int4": "int4", "int4_embed": "int4",
                  "nf4": "nf4"}[args.quant]
        bits = 8 if method == "int8" else 4
        params = jax.jit(lambda p: quantize_params(
            p, bits=bits, quantize_embed=args.quant.endswith("_embed"),
            method=method))(params)
    n_gen = args.tts_gen_tokens
    sp = SamplingParams(max_tokens=n_gen + 1, min_tokens=n_gen + 1,
                        stop_token_ids=(cfg.eos_token_id,),
                        topk_method="approx")
    ns = [int(x) for x in args.tts_serve_sessions.split(",")]
    n_max = max(ns)
    eng = PagedEngine(params, cfg, sp, slots=n_max,
                      max_len=max(512, 128 + 8 * (n_gen // 8 + 2)),
                      chunk_steps=args.tts_serve_chunk_steps,
                      prefix_sharing=False)

    fcfg = flow_lib.FlowConfig()
    hcfg = hift_lib.HiFTConfig()
    fparams = flow_lib.init_params(jax.random.PRNGKey(0), fcfg)
    hparams = hift_lib.init_params(jax.random.PRNGKey(1), hcfg)
    programs = streaming_tts.make_stream_programs(fcfg, hcfg)
    coord = MultiSessionTTS(eng, fparams, fcfg, hparams, hcfg,
                            cfg.speech_token_offset, programs=programs,
                            mel_pad_to=160)

    rng = np.random.default_rng(0)
    n_prompt = 75

    def make_sessions(n, seed):
        r = np.random.default_rng(seed)
        return [TTSSession(
            llm_ids=r.integers(0, cfg.vocab_size, 128).tolist(),
            flow_prompt_tokens=r.integers(0, 6561, n_prompt).tolist(),
            prompt_mel=(r.normal(size=(n_prompt * 2, 80))
                        .astype(np.float32) * .1),
            prompt_mel_len=n_prompt * 2,
            spk_emb=r.normal(size=(192,)).astype(np.float32),
            rng=jax.random.PRNGKey(seed * 100 + i)) for i in range(n)]

    def run(n, seed):
        t0 = time.perf_counter()
        results = coord.serve(make_sessions(n, seed))
        wall = time.perf_counter() - t0
        audio = sum(r["wav"].shape[0] for r in results) / hcfg.sampling_rate
        ttfas = sorted(r["ttfa_s"] for r in results)
        return {"n": n, "wall_s": round(wall, 3),
                "audio_s": round(audio, 2),
                "xrt": round(audio / wall, 2),
                "ttfa_p50_ms": round(ttfas[len(ttfas) // 2] * 1e3, 1),
                "ttfa_max_ms": round(ttfas[-1] * 1e3, 1)}

    # warm up each phase with the SAME seed it is then timed on: shape
    # groups (flow W buckets, vocode (frames, source-len) keys, pow2
    # sub-batch row counts) depend on session token-arrival alignment,
    # so a different-seed warmup can miss a shape and a ~30s relay
    # compile lands inside the timed run (measured: N=16 collapsed to
    # 2.4x realtime / 31.7s TTFA on a cold shape; 10.4x warm). Identical
    # re-serves are timing-safe here: prefix_sharing is off and the
    # per-session PRNG keys make the two runs bit-identical workloads.
    run(1, seed=2)
    single = run(1, seed=2)
    sweep = []
    for n in ns:
        run(n, seed=n + 50)              # compile this N's row shapes
        sweep.append(run(n, seed=n + 50))

    head = sweep[-1]
    print(json.dumps({
        "metric": "tts_serve_aggregate_x_realtime",
        "value": head["xrt"],
        "unit": f"x realtime ({head['n']} sessions)",
        "vs_baseline": round(head["xrt"] / max(single["xrt"], 1e-9), 2),
        "extra": {"single": single, "sweep": sweep,
                  "gen_tokens": n_gen, "quant": args.quant},
    }))


def bench_tts(args):
    """Flow-matching decoder + HiFT vocoder throughput (the TTS stack's
    second hot loop: 15 CFG-doubled UNet evals + NSF/ISTFT per turn,
    reference soulxpodcast.py:400-428). One typical turn: 75 prompt +
    150 generated speech tokens (6s of audio at 25 Hz)."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from speech_distill_tpu.models import flow as flow_lib
    from speech_distill_tpu.models import hift as hift_lib

    fcfg = flow_lib.FlowConfig()
    hcfg = hift_lib.HiFTConfig()
    fparams = flow_lib.init_params(jax.random.PRNGKey(0), fcfg)
    hparams = hift_lib.init_params(jax.random.PRNGKey(1), hcfg)

    # pass params as ARGUMENTS: anything the jit closes over ships as
    # constants in the relay compile request (HTTP 413 past ~1GB)
    flow_fn = jax.jit(lambda fp, t, tl, pf, pfl, emb, rng:
                      flow_lib.forward_flow(fp, t, tl, pf, pfl, emb, fcfg,
                                            rng=rng))
    hift_fn = jax.jit(lambda hp, mel, rng: hift_lib.forward(hp, mel, hcfg,
                                                            rng=rng))

    rng = np.random.default_rng(0)
    B = args.tts_batch
    n_prompt, n_gen, bucket = 75, 150, 64
    n = n_prompt + n_gen
    width = -(-n // bucket) * bucket
    tokens = np.zeros((B, width), np.int32)
    tokens[:, :n] = rng.integers(0, 6561, (B, n))
    tlen = jnp.full((B,), n, jnp.int32)
    prompt_mel_len = n_prompt * 2
    pf = jnp.asarray(rng.normal(size=(B, prompt_mel_len, 80)) * 0.1,
                     jnp.float32)
    emb = jnp.asarray(rng.normal(size=(B, 192)), jnp.float32)
    key = jax.random.PRNGKey(2)

    def one(key):
        k1, k2 = jax.random.split(key)
        mels, mel_lens = flow_fn(fparams, jnp.asarray(tokens), tlen, pf,
                                 jnp.full((B,), prompt_mel_len, np.int32),
                                 emb, k1)
        wav, _ = hift_fn(hparams, mels[:, prompt_mel_len:], k2)
        return wav

    wav = one(key)                     # compile + warmup
    float(np.asarray(wav[0, 0]))
    steps = max(3, args.steps // 4)
    t0 = time.perf_counter()
    for i in range(steps):
        wav = one(jax.random.fold_in(key, i))
    float(np.asarray(wav[0, 0]))
    dt = (time.perf_counter() - t0) / steps

    audio_s = n_gen / 25.0
    print(json.dumps({
        "metric": f"tts_flow_vocoder_rtf_b{B}",
        "value": round(audio_s * B / dt, 2),
        "unit": "x realtime",
        "vs_baseline": 1.0,
        "extra": {"turn_seconds": audio_s, "wall_seconds": round(dt, 3),
                  "cfm_steps": 15, "tokens": n_gen, "batch": B},
    }))


if __name__ == "__main__":
    main()

