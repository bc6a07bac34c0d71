"""Continuous batching: slot join/leave preserves per-stream outputs."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_distill_tpu.core.config import SamplingParams, qwen3_tiny
from speech_distill_tpu.models import qwen3


def _setup(vocab=48, seed=3):
    cfg = qwen3_tiny(vocab)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False})
    params = qwen3.init_params(jax.random.PRNGKey(seed), cfg)
    # greedy argmax decode: deterministic, robust to fp noise
    sp = SamplingParams(stop_token_ids=(vocab - 1,), max_tokens=6,
                        min_tokens=6, top_k=1, temperature=1.0,
                        use_ras=False, repetition_penalty=1.0)
    return cfg, params, sp


def test_continuous_matches_per_stream_decode():
    """serve() through 2 slots over 5 queued prompts (forces mid-flight
    join/leave) produces the same tokens as the single-stream engine run
    prompt-by-prompt."""
    from speech_distill_tpu.infer.continuous import ContinuousEngine
    from speech_distill_tpu.infer.engine import DecodeEngine

    cfg, params, sp = _setup()
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, cfg.vocab_size - 2,
                            int(rng.integers(3, 11))).tolist()
               for _ in range(5)]

    ref = []
    for p in prompts:
        eng = DecodeEngine(params, cfg, sp, max_len=64, prefill_bucket=8,
                           cache_dtype=jnp.float32)
        ref.append(eng.generate(p)["token_ids"])

    ceng = ContinuousEngine(params, cfg, sp, slots=2, max_len=64,
                            prefill_bucket=8, chunk_steps=3,
                            cache_dtype=jnp.float32)
    got = ceng.serve(prompts, max_new=6)
    assert got == ref


def test_continuous_per_request_caps():
    """Per-request max_new: each stream retires at its own cap and its
    tokens equal the uncapped stream's prefix."""
    from speech_distill_tpu.infer.continuous import ContinuousEngine

    cfg, params, sp = _setup(seed=4)
    rng = np.random.default_rng(1)
    prompts = [rng.integers(1, cfg.vocab_size - 2, 6).tolist()
               for _ in range(4)]
    caps = [2, 5, 3, 7]

    ceng = ContinuousEngine(params, cfg, sp, slots=4, max_len=64,
                            prefill_bucket=8, chunk_steps=2,
                            cache_dtype=jnp.float32)
    full = ceng.serve(prompts, max_new=8)
    capped = ceng.serve(prompts, max_new_per_request=caps)
    for f, c, cap in zip(full, capped, caps):
        want = f[:cap]
        assert c == want
        eos = sp.stop_token_ids[0]
        if eos not in want:
            assert len(c) == min(cap, len(f))


def test_continuous_single_slot_queue_drains():
    """One slot, several prompts: strict sequential reuse of the slot."""
    from speech_distill_tpu.infer.continuous import ContinuousEngine
    from speech_distill_tpu.infer.engine import DecodeEngine

    cfg, params, sp = _setup(seed=5)
    rng = np.random.default_rng(2)
    prompts = [rng.integers(1, cfg.vocab_size - 2, 5).tolist()
               for _ in range(3)]
    ceng = ContinuousEngine(params, cfg, sp, slots=1, max_len=64,
                            prefill_bucket=8, chunk_steps=4,
                            cache_dtype=jnp.float32)
    got = ceng.serve(prompts, max_new=4)
    for p, o in zip(prompts, got):
        eng = DecodeEngine(params, cfg, sp, max_len=64, prefill_bucket=8,
                           cache_dtype=jnp.float32)
        ref = eng.generate(p)["token_ids"][:4]
        assert o == ref
