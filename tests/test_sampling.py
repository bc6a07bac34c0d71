"""Sampling ops vs HF transformers logits processors + decode engine smoke."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_distill_tpu.core.config import SamplingParams, qwen3_tiny
from speech_distill_tpu.models import qwen3
from speech_distill_tpu.ops import sampling

torch = pytest.importorskip("torch")


def test_repetition_penalty_matches_hf():
    from transformers import RepetitionPenaltyLogitsProcessor
    rng = np.random.default_rng(0)
    V = 50
    logits = rng.normal(size=(2, V)).astype(np.float32)
    gen = np.array([[3, 7, 3], [1, 2, 4]])
    proc = RepetitionPenaltyLogitsProcessor(penalty=1.25)
    ref = proc(torch.tensor(gen), torch.tensor(logits)).numpy()

    presence = np.zeros((2, V), bool)
    for b in range(2):
        presence[b, gen[b]] = True
    got = np.asarray(sampling.apply_repetition_penalty(
        jnp.asarray(logits), jnp.asarray(presence), 1.25))
    np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.parametrize("k", [1, 5, 49])
def test_top_k_matches_hf(k):
    from transformers import TopKLogitsWarper
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(3, 49)).astype(np.float32) * 3
    ref = TopKLogitsWarper(top_k=k, filter_value=sampling.NEG_INF)(
        None, torch.tensor(logits)).numpy()
    got = np.asarray(sampling.top_k_filter(jnp.asarray(logits), k))
    np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.parametrize("p", [0.5, 0.9, 0.99])
def test_top_p_matches_hf(p):
    from transformers import TopPLogitsWarper
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(3, 40)).astype(np.float32) * 2
    ref = TopPLogitsWarper(top_p=p, filter_value=sampling.NEG_INF)(
        None, torch.tensor(logits)).numpy()
    got = np.asarray(sampling.top_p_filter(jnp.asarray(logits), p))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_min_tokens_suppression():
    logits = jnp.zeros((2, 10))
    out = sampling.suppress_eos_before_min(
        logits, (9,), jnp.asarray([[2], [6]]), min_tokens=5)
    assert out[0, 9] == sampling.NEG_INF   # 2 < 5: suppressed
    assert out[1, 9] == 0                  # 6 >= 5: untouched


def test_ras_triggers_on_repetition():
    """Candidate sampled from a peaked processed dist; when the candidate
    saturates the window, RAS must resample from raw."""
    V, win = 16, 8
    raw = jnp.zeros((1, V))                               # uniform raw
    processed = jnp.full((1, V), sampling.NEG_INF).at[0, 3].set(0.0)
    recent = jnp.full((1, win), 3, jnp.int32)             # window full of 3
    valid = jnp.ones((1, win), jnp.int32)
    hits = 0
    for s in range(20):
        res = sampling.ras_sample(jax.random.PRNGKey(s), raw, processed,
                                  recent, valid, use_ras=True, win_size=win,
                                  tau_r=0.2)
        assert bool(res.used_raw[0])
        hits += int(res.token[0] != 3)
    assert hits > 5   # raw-resampled tokens are ~uniform, rarely 3

    # no repetition in window -> candidate kept
    recent2 = jnp.arange(win, dtype=jnp.int32)[None] + 4
    res = sampling.ras_sample(jax.random.PRNGKey(0), raw, processed,
                              recent2, valid, use_ras=True, win_size=win,
                              tau_r=0.2)
    assert int(res.token[0]) == 3 and not bool(res.used_raw[0])


def test_topk_sampler_matches_full_pipeline_distribution():
    """The fused k-space warped logits equal the full processor chain's
    values at the surviving tokens (and -inf elsewhere)."""
    rng = np.random.default_rng(9)
    V, k, p, temp, pen = 64, 8, 0.9, 0.7, 1.25
    raw = jnp.asarray(rng.normal(size=(3, V)) * 2, jnp.float32)
    presence = jnp.zeros((3, V), bool).at[0, 5].set(True)
    num_gen = jnp.asarray([[6], [1], [9]])

    full = sampling.process_logits(
        raw, presence, num_gen, temperature=temp, top_k=k, top_p=p,
        repetition_penalty=pen, min_tokens=3, eos_ids=(63,))

    x = sampling.suppress_eos_before_min(raw, (63,), num_gen, 3)
    x = sampling.apply_repetition_penalty(x, presence, pen)
    vals, idx = jax.lax.top_k(x, k)
    vals = vals / temp
    probs = jax.nn.softmax(vals, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    vals = jnp.where((cum - probs) < p, vals, sampling.NEG_INF)

    # scatter k-space values into vocab space and compare
    recon = jnp.full((3, V), sampling.NEG_INF)
    recon = recon.at[jnp.arange(3)[:, None], idx].set(vals)
    np.testing.assert_allclose(
        np.asarray(jax.nn.softmax(recon, axis=-1)),
        np.asarray(jax.nn.softmax(full, axis=-1)), atol=1e-5)


def test_topk_sampler_ras_fallback():
    V, win = 32, 6
    raw = jnp.zeros((1, V))
    presence = jnp.zeros((1, V), bool)
    # uniform raw: top-k=1 candidate is always token 0; window full of 0s
    # triggers RAS, and the raw resample is uniform over 32 tokens
    recent = jnp.zeros((1, win), jnp.int32)
    valid = jnp.ones((1, win), jnp.int32)
    hits = 0
    for s in range(20):
        tok, used_raw = sampling.sample_token_topk(
            jax.random.PRNGKey(s), raw, presence, jnp.asarray([[9]]),
            recent, valid, temperature=1.0, top_k=1, top_p=1.0,
            repetition_penalty=1.0, min_tokens=0, eos_ids=(31,),
            use_ras=True, win_size=win, tau_r=0.2)
        assert bool(used_raw[0])
        hits += int(tok[0] != 0)
    assert hits > 10  # uniform resample rarely lands back on token 0


def test_decode_engine_generates_until_eos():
    from speech_distill_tpu.infer.engine import DecodeEngine
    cfg = qwen3_tiny(64)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False})
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    sp = SamplingParams(temperature=1.0, repetition_penalty=1.1, top_k=20,
                        top_p=0.95, min_tokens=2, max_tokens=12,
                        stop_token_ids=(63,), use_ras=True, win_size=5)
    eng = DecodeEngine(params, cfg, sp, max_len=64, prefill_bucket=16,
                       cache_dtype=jnp.float32)
    out = eng.generate([1, 2, 3, 4, 5])
    toks = out["token_ids"]
    assert 1 <= len(toks) <= 12
    if 63 in toks:
        assert toks[-1] == 63
    # continuation turn reuses the cache
    out2 = eng.generate([7, 8], state=out["state"])
    assert len(out2["token_ids"]) <= 12


@pytest.mark.slow
def test_generate_batch_left_padding_matches_single():
    """Batched (left-padded) prefill logits equal per-row unpadded logits."""
    from speech_distill_tpu.infer.engine import DecodeEngine
    cfg = qwen3_tiny(48)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False})
    params = qwen3.init_params(jax.random.PRNGKey(3), cfg)
    sp = SamplingParams(stop_token_ids=(47,), max_tokens=6, min_tokens=1,
                        top_k=10, temperature=1.0)
    eng = DecodeEngine(params, cfg, sp, max_len=64, prefill_bucket=8,
                       cache_dtype=jnp.float32)
    prompts = [[1, 2, 3, 4, 5, 6, 7], [9, 8, 7]]

    outs = eng.generate_batch(prompts, max_new=5)
    assert len(outs) == 2
    for o in outs:
        assert 1 <= len(o) <= 5

    # prefill parity: batched last-token logits == single-row engine's
    st_single = eng.prefill(eng.new_state(1), prompts[1])
    B = len(prompts)
    width = eng._bucketed(max(len(p) for p in prompts))
    ids = np.zeros((B, width), np.int32)
    pos = np.zeros((B, width), np.int32)
    mask = np.zeros((B, eng.max_len), np.int32)
    for b, p in enumerate(prompts):
        n = len(p)
        ids[b, width - n:] = p
        mask[b, width - n:width] = 1
        pos[b, width - n:] = np.arange(n)
    logits, _ = eng._prefill(params, jnp.asarray(ids), jnp.asarray(mask),
                             eng.new_state(B).cache, jnp.asarray(pos))
    np.testing.assert_allclose(
        np.asarray(logits[1, -1]), np.asarray(st_single.last_logits[0]),
        atol=2e-4, rtol=1e-3)


def test_prefix_cache_same_tokens_and_reuse():
    """generate_batch with a shared prompt prefix: identical output tokens
    with and without the prefix KV cache, and the prefix is prefilled once
    then reused across calls (vLLM enable_prefix_caching parity,
    reference llm_engine.py:78-114)."""
    from speech_distill_tpu.infer.engine import DecodeEngine
    cfg = qwen3_tiny(48)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False})
    params = qwen3.init_params(jax.random.PRNGKey(5), cfg)
    # top_k=1 => deterministic argmax decode, robust to fp noise
    sp = SamplingParams(stop_token_ids=(47,), max_tokens=6, min_tokens=6,
                        top_k=1, temperature=1.0, use_ras=False,
                        repetition_penalty=1.0)
    shared = list(range(1, 13))           # 12-token common system prefix
    prompts = [shared + [20, 21, 22], shared + [30, 31], shared + [40]]

    eng = DecodeEngine(params, cfg, sp, max_len=64, prefill_bucket=8,
                       cache_dtype=jnp.float32, prefix_cache_min=4)
    cached = eng.generate_batch(prompts, max_new=6)
    assert eng._prefix_cache, "common prefix should have been cached"
    plain = eng.generate_batch(prompts, max_new=6, use_prefix_cache=False)
    assert cached == plain

    # cross-call reuse: same prefix key, no new entry
    n_entries = len(eng._prefix_cache)
    again = eng.generate_batch(prompts, max_new=6)
    assert again == plain
    assert len(eng._prefix_cache) == n_entries

    # growing prefix extends the cached entry instead of recomputing it
    longer = shared + [25, 26, 27, 28]
    prompts2 = [longer + [5], longer + [6]]
    out2 = eng.generate_batch(prompts2, max_new=4)
    out2_plain = eng.generate_batch(prompts2, max_new=4,
                                    use_prefix_cache=False)
    assert out2 == out2_plain


def test_prefix_cache_single_prompt_repeat():
    """B=1 repeated calls hit the cache (prompt minus last token)."""
    from speech_distill_tpu.infer.engine import DecodeEngine
    cfg = qwen3_tiny(32)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False})
    params = qwen3.init_params(jax.random.PRNGKey(6), cfg)
    sp = SamplingParams(stop_token_ids=(31,), max_tokens=4, min_tokens=4,
                        top_k=1, temperature=1.0, use_ras=False,
                        repetition_penalty=1.0)
    eng = DecodeEngine(params, cfg, sp, max_len=64, prefill_bucket=8,
                       cache_dtype=jnp.float32, prefix_cache_min=4)
    prompt = list(range(1, 11))
    a = eng.generate_batch([prompt], max_new=4)
    b = eng.generate_batch([prompt], max_new=4)
    c = eng.generate_batch([prompt], max_new=4, use_prefix_cache=False)
    assert a == b == c


def test_prefix_cache_overflow_falls_back():
    """Long prompts sharing a long prefix near max_len: the engine must not
    let prefix + bucketed remainder exceed the cache (ADVICE r2) — it falls
    back to plain prefill and still returns correct tokens; a prompt with no
    room to generate raises."""
    from speech_distill_tpu.infer.engine import DecodeEngine
    cfg = qwen3_tiny(48)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False})
    params = qwen3.init_params(jax.random.PRNGKey(7), cfg)
    sp = SamplingParams(stop_token_ids=(47,), max_tokens=4, min_tokens=4,
                        top_k=1, temperature=1.0, use_ras=False,
                        repetition_penalty=1.0)
    eng = DecodeEngine(params, cfg, sp, max_len=34, prefill_bucket=8,
                       cache_dtype=jnp.float32, prefix_cache_min=4)
    # 32-token prompts sharing a 20-token prefix: plain width = 32 fits
    # (cap 2), but pre(20) + bucketed-remainder(16) = 36 > 34 — the guard
    # must drop the prefix instead of overflowing the cache
    shared = list(range(1, 21))
    prompts = [shared + [30 + i for i in range(12)],
               shared + [20 + i for i in range(12)]]
    cached = eng.generate_batch(prompts, max_new=2)
    plain = eng.generate_batch(prompts, max_new=2, use_prefix_cache=False)
    assert cached == plain
    assert all(len(o) >= 1 for o in cached)
    # prompt >= max_len: no room to generate at all
    with pytest.raises(ValueError):
        eng.generate_batch([list(range(40))])
    # prompt whose bucketed width fills the cache exactly: error, not
    # silently-empty output
    with pytest.raises(ValueError):
        eng.generate_batch([list(range(33))], use_prefix_cache=False)


def test_decode_matches_full_forward_logits():
    """The engine's held last_logits after prefill == full forward logits."""
    from speech_distill_tpu.infer.engine import DecodeEngine
    cfg = qwen3_tiny(32)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False})
    params = qwen3.init_params(jax.random.PRNGKey(1), cfg)
    sp = SamplingParams(stop_token_ids=(31,), max_tokens=4)
    eng = DecodeEngine(params, cfg, sp, max_len=32, prefill_bucket=8,
                       cache_dtype=jnp.float32)
    prompt = [1, 2, 3, 4, 5, 6]
    st = eng.prefill(eng.new_state(1), prompt)
    full = qwen3.forward(params, jnp.asarray([prompt]), cfg)
    np.testing.assert_allclose(np.asarray(st.last_logits[0]),
                               np.asarray(full[0, -1]), atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_windowed_decode_across_window_boundary():
    """Greedy decode whose generation CROSSES the power-of-two cache-window
    boundary (512 -> 1024) must equal greedy decode computed by repeated
    full forward passes with no cache — locks the window hand-off logic
    (engine._run_decode: tokens/valid/cache slab copies between windows)."""
    from speech_distill_tpu.infer.engine import DecodeEngine
    cfg = qwen3_tiny(64)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False})
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    n_gen = 24
    sp = SamplingParams(temperature=1.0, repetition_penalty=1.0, top_k=1,
                        top_p=1.0, min_tokens=n_gen, max_tokens=n_gen,
                        stop_token_ids=(63,), use_ras=False,
                        topk_method="exact")
    eng = DecodeEngine(params, cfg, sp, max_len=2048, prefill_bucket=128,
                       cache_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 62, 500).tolist()   # window 512; crosses at 513
    got = eng.generate(prompt)["token_ids"]

    ids = list(prompt)
    want = []
    for _ in range(n_gen):
        logits = qwen3.forward(params, jnp.asarray([ids], jnp.int32), cfg)
        nxt = int(jnp.argmax(logits[0, -1]))
        want.append(nxt)
        ids.append(nxt)
        if nxt == 63:
            break
    assert got == want, (got, want)
