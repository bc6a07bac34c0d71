"""Speculative (prompt-lookup) decoding: exactness vs the production sampler.

The spec decoder must be *distributionally invisible*: whatever the n-gram
draft proposes, committed tokens are distributed exactly like the
non-speculative decode loop (engine.make_decode_fn + sample_token_topk).
Tested three ways: greedy bit-exactness, a closed-form target oracle vs the
real sampler, and the marginal distribution of a verified token vs that
oracle. Plus KV-cache rollback consistency and EOS/budget semantics.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_distill_tpu.core.config import SamplingParams, qwen3_tiny
from speech_distill_tpu.models import qwen3
from speech_distill_tpu.infer import speculative
from speech_distill_tpu.infer.engine import DecodeEngine
from speech_distill_tpu.ops import sampling


def _tiny(vocab=64, seed=0):
    cfg = qwen3_tiny(vocab)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False})
    return cfg, qwen3.init_params(jax.random.PRNGKey(seed), cfg)


def test_ngram_draft_copies_repeats():
    toks = jnp.asarray([7, 1, 2, 3, 9, 1, 2, 0, 0, 0], jnp.int32)
    # suffix [1, 2] matched at i=5 is the most recent, but has no
    # continuation inside length; i=1 match continues with 3, 9, 1
    d = speculative.ngram_draft(toks, jnp.asarray(7), 3, n_max=2, n_min=1)
    assert d.tolist() == [3, 9, 1]
    # periodic extension: suffix [2, 3] at the very end wraps its period
    toks2 = jnp.asarray([2, 3, 2, 3, 0, 0], jnp.int32)
    d2 = speculative.ngram_draft(toks2, jnp.asarray(4), 4, n_max=2, n_min=1)
    assert d2.tolist() == [2, 3, 2, 3]
    # no match anywhere -> zeros (rejected cheaply by the verifier)
    toks3 = jnp.asarray([5, 6, 7, 8, 0, 0], jnp.int32)
    d3 = speculative.ngram_draft(toks3, jnp.asarray(4), 2, n_max=3, n_min=2)
    assert d3.tolist() == [0, 0]


@pytest.mark.parametrize("penalty", [1.15, 1.5])
def test_spec_greedy_matches_regular(penalty):
    """top_k=1 makes every sampling step deterministic: the speculative
    engine must reproduce the regular engine token-for-token (accepts when
    the draft equals the argmax, deterministic resample otherwise)."""
    cfg, params = _tiny()
    sp = SamplingParams(temperature=0.7, repetition_penalty=penalty,
                        top_k=1, top_p=1.0, min_tokens=3, max_tokens=30,
                        stop_token_ids=(63,), use_ras=False)
    for prompt in ([1, 2, 3, 1, 2, 3, 1, 2], [5, 9, 11], list(range(20))):
        outs = {}
        for g in (0, 3):
            eng = DecodeEngine(params, cfg, sp, max_len=128,
                               prefill_bucket=16, cache_dtype=jnp.float32,
                               spec_gamma=g, seed=7)
            outs[g] = eng.generate(prompt)["token_ids"]
        assert outs[0] == outs[3], (prompt, outs)


def test_target_probs_matches_sampler_empirically():
    """The closed-form mixture p = proc*(1-rep) + P_rep*softmax(raw) is
    exactly sample_token_topk's output distribution (RAS included)."""
    V, win = 48, 8
    rng = np.random.default_rng(3)
    raw = jnp.asarray(rng.normal(size=(1, V)).astype(np.float32) * 2.0)
    presence = jnp.zeros((1, V), bool).at[0, 5].set(True)
    recent = jnp.asarray(rng.integers(0, 6, size=(1, win)), jnp.int32)
    recent_valid = jnp.ones((1, win), jnp.int32)
    num_gen = jnp.asarray([4])
    sp = SamplingParams(temperature=0.8, repetition_penalty=1.2, top_k=10,
                        top_p=0.85, min_tokens=6, stop_token_ids=(47,),
                        use_ras=True, win_size=win, tau_r=0.2)
    target = np.asarray(speculative.target_probs(
        raw, presence, num_gen, recent, recent_valid, sp, (47,), win))[0]
    assert abs(target.sum() - 1.0) < 1e-5

    n = 40000
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    sample = jax.jit(jax.vmap(lambda k: sampling.sample_token_topk(
        k, raw, presence, num_gen[:, None], recent, recent_valid,
        temperature=0.8, top_k=10, top_p=0.85, repetition_penalty=1.2,
        min_tokens=6, eos_ids=(47,), use_ras=True, win_size=win,
        tau_r=0.2)[0][0]))
    toks = np.asarray(sample(keys))
    emp = np.bincount(toks, minlength=V) / n
    tv = 0.5 * np.abs(emp - target).sum()
    assert tv < 0.02, tv
    # EOS stayed suppressed (num_gen < min_tokens) in both
    assert target[47] == 0 and emp[47] == 0


@pytest.mark.parametrize("use_ras", [False, True])
def test_spec_verified_token_matches_target(use_ras):
    """Marginal distribution of the first *verified* token (accepted draft
    or rejection resample) equals the closed-form target, regardless of
    what the n-gram draft proposed."""
    V, win = 64, 6
    cfg, params = _tiny(V, seed=1)
    sp = SamplingParams(temperature=0.9, repetition_penalty=1.2, top_k=12,
                        top_p=0.9, min_tokens=0, max_tokens=8,
                        stop_token_ids=(V - 1,), use_ras=use_ras,
                        win_size=win, tau_r=0.4)
    eng = DecodeEngine(params, cfg, sp, max_len=64, prefill_bucket=16,
                       cache_dtype=jnp.float32, spec_gamma=2)
    prompt = [1, 2, 3, 4, 1, 2, 3]
    A = 4   # forced first token: continues the prompt's repetition so the
    #         n-gram draft proposes a real (sometimes acceptable) token
    base = eng.new_state(1)
    base = eng.prefill(base, prompt)
    base = base._replace(
        presence=jnp.zeros_like(base.presence),
        num_generated=jnp.zeros_like(base.num_generated),
        finished=jnp.zeros_like(base.finished),
        last_logits=jnp.full_like(base.last_logits, -100.0).at[0, A].set(
            100.0))

    spec = eng._spec
    n = 3000
    run = jax.jit(lambda st: spec(params, st, jnp.asarray(2, jnp.int32)))
    toks = np.zeros(n, np.int32)
    for i in range(n):
        st = run(base._replace(rng=jax.random.PRNGKey(i)))
        out = np.asarray(st.tokens[0])
        L0 = len(prompt)
        assert out[L0] == A
        toks[i] = out[L0 + 1]
    emp = np.bincount(toks, minlength=V) / n

    # closed-form target for position 2 given token1 = A
    st1 = eng.prefill(eng.new_state(1), prompt + [A])
    raw2 = st1.last_logits
    presence = jnp.zeros((1, V), bool).at[0, A].set(True)
    seq = prompt + [A]
    recent = jnp.asarray([seq[-win:]], jnp.int32)
    target = np.asarray(speculative.target_probs(
        raw2, presence, jnp.asarray([1]), recent,
        jnp.ones((1, win), jnp.int32), sp, (V - 1,), win))[0]
    tv = 0.5 * np.abs(emp - target).sum()
    assert tv < 0.08, (tv, use_ras)


def test_spec_cache_rollback_consistency():
    """After speculative decode (with rejections rolling the cache back),
    the cache and last_logits must equal a fresh one-pass prefill over the
    same committed tokens."""
    cfg, params = _tiny(seed=2)
    sp = SamplingParams(temperature=1.0, repetition_penalty=1.1, top_k=16,
                        top_p=0.9, min_tokens=0, max_tokens=20,
                        stop_token_ids=(63,), use_ras=True, win_size=5)
    eng = DecodeEngine(params, cfg, sp, max_len=128, prefill_bucket=16,
                       cache_dtype=jnp.float32, spec_gamma=3, seed=11)
    prompt = [1, 2, 3, 1, 2, 3, 9]
    out = eng.generate(prompt)
    st = out["state"]
    L = int(st.length[0])
    assert int(st.cache.length) == L          # finalize gave pending KV

    eng2 = DecodeEngine(params, cfg, sp, max_len=128, prefill_bucket=16,
                        cache_dtype=jnp.float32)
    ref = eng2.prefill(eng2.new_state(1), prompt + out["token_ids"])
    np.testing.assert_allclose(np.asarray(st.last_logits),
                               np.asarray(ref.last_logits),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st.cache.k[:, :, :L]),
                               np.asarray(ref.cache.k[:, :, :L]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(st.cache.v[:, :, :L]),
                               np.asarray(ref.cache.v[:, :, :L]),
                               rtol=1e-4, atol=1e-4)


def test_spec_greedy_matches_regular_left_padded():
    """generate_batch with B=1 left-pads the prompt to the bucket width;
    speculative decode must use real-token RoPE positions (not buffer
    slots) so the outputs still match the regular engine exactly."""
    cfg, params = _tiny(seed=4)
    sp = SamplingParams(temperature=0.7, repetition_penalty=1.3, top_k=1,
                        top_p=1.0, min_tokens=2, max_tokens=16,
                        stop_token_ids=(63,), use_ras=False)
    prompt = [1, 2, 3, 1, 2, 3, 9, 4, 5]     # 9 tokens -> 7 pad slots
    outs = {}
    for g in (0, 3):
        eng = DecodeEngine(params, cfg, sp, max_len=96, prefill_bucket=16,
                           cache_dtype=jnp.float32, spec_gamma=g, seed=7)
        outs[g] = eng.generate_batch([prompt], max_new=16,
                                     use_prefix_cache=False)[0]
    assert outs[0] == outs[3], outs


def test_spec_eos_and_budget_semantics():
    """Stops at EOS (EOS is the last token), never exceeds max_tokens, and
    multi-turn continuation works from the returned state."""
    cfg, params = _tiny(seed=3)
    sp = SamplingParams(temperature=1.0, repetition_penalty=1.0, top_k=8,
                        top_p=1.0, min_tokens=1, max_tokens=11,
                        stop_token_ids=(63,), use_ras=False)
    eng = DecodeEngine(params, cfg, sp, max_len=96, prefill_bucket=16,
                       cache_dtype=jnp.float32, spec_gamma=4, seed=5)
    for s in range(6):
        eng._rng = jax.random.PRNGKey(s)
        out = eng.generate([1, 2, 3, 4, 5])
        toks = out["token_ids"]
        assert 1 <= len(toks) <= 11
        if 63 in toks:
            assert toks[-1] == 63
        else:
            assert len(toks) == 11
        out2 = eng.generate([7, 8], state=out["state"])
        assert len(out2["token_ids"]) <= 11


def _tiny4(vocab=64, seed=0):
    cfg = qwen3_tiny(vocab, num_hidden_layers=4)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False})
    return cfg, qwen3.init_params(jax.random.PRNGKey(seed), cfg)


@pytest.mark.parametrize("penalty", [1.15, 1.5])
def test_spec_layer_skip_greedy_matches_regular(penalty):
    """Layer-skip self-drafting (K=2 of 4 layers) under top_k=1: the
    speculative engine reproduces the regular engine token-for-token —
    the shared-cache draft (layer<K KV written by the draft, overwritten
    bit-identically by the verify) never corrupts the stream."""
    cfg, params = _tiny4()
    sp = SamplingParams(temperature=0.7, repetition_penalty=penalty,
                        top_k=1, top_p=1.0, min_tokens=3, max_tokens=30,
                        stop_token_ids=(63,), use_ras=False)
    for prompt in ([1, 2, 3, 1, 2, 3, 1, 2], [5, 9, 11], list(range(20))):
        outs = {}
        for g, kw in ((0, {}), (3, {"spec_draft": "layer_skip",
                                    "spec_layers": 2})):
            eng = DecodeEngine(params, cfg, sp, max_len=128,
                               prefill_bucket=16, cache_dtype=jnp.float32,
                               spec_gamma=g, seed=7, **kw)
            outs[g] = eng.generate(prompt)["token_ids"]
        assert outs[0] == outs[3], (prompt, outs)


@pytest.mark.parametrize("use_ras", [False, True])
def test_spec_layer_skip_verified_token_matches_target(use_ras):
    """Marginal distribution of the first verified token under layer-skip
    drafting equals the closed-form production-sampler target — the same
    TV-distance harness that proved the n-gram draft exact (a
    distribution-MATCHED draft must be just as invisible)."""
    V, win = 64, 6
    cfg, params = _tiny4(V, seed=1)
    sp = SamplingParams(temperature=0.9, repetition_penalty=1.2, top_k=12,
                        top_p=0.9, min_tokens=0, max_tokens=8,
                        stop_token_ids=(V - 1,), use_ras=use_ras,
                        win_size=win, tau_r=0.4)
    eng = DecodeEngine(params, cfg, sp, max_len=64, prefill_bucket=16,
                       cache_dtype=jnp.float32, spec_gamma=2,
                       spec_draft="layer_skip", spec_layers=2)
    prompt = [1, 2, 3, 4, 1, 2, 3]
    A = 4
    base = eng.new_state(1)
    base = eng.prefill(base, prompt)
    base = base._replace(
        presence=jnp.zeros_like(base.presence),
        num_generated=jnp.zeros_like(base.num_generated),
        finished=jnp.zeros_like(base.finished),
        last_logits=jnp.full_like(base.last_logits, -100.0).at[0, A].set(
            100.0))

    spec = eng._spec
    n = 3000
    run = jax.jit(lambda st: spec(params, st, jnp.asarray(2, jnp.int32)))
    toks = np.zeros(n, np.int32)
    for i in range(n):
        st = run(base._replace(rng=jax.random.PRNGKey(i)))
        out = np.asarray(st.tokens[0])
        L0 = len(prompt)
        assert out[L0] == A
        toks[i] = out[L0 + 1]
    emp = np.bincount(toks, minlength=V) / n

    st1 = eng.prefill(eng.new_state(1), prompt + [A])
    raw2 = st1.last_logits
    presence = jnp.zeros((1, V), bool).at[0, A].set(True)
    seq = prompt + [A]
    recent = jnp.asarray([seq[-win:]], jnp.int32)
    target = np.asarray(speculative.target_probs(
        raw2, presence, jnp.asarray([1]), recent,
        jnp.ones((1, win), jnp.int32), sp, (V - 1,), win))[0]
    tv = 0.5 * np.abs(emp - target).sum()
    assert tv < 0.08, (tv, use_ras)


def test_layer_skip_draft_partial_cache_matches_full_prefix():
    """qwen3.forward(num_layers=K) writes cache layers < K bit-identically
    to the full forward and leaves layers >= K untouched."""
    cfg, params = _tiny4()
    from speech_distill_tpu.models.qwen3 import KVCache
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 60, (1, 6)), jnp.int32)
    c0 = KVCache.create(cfg, 1, 16, jnp.float32)
    _, c_full = qwen3.forward(params, ids, cfg, cache=c0,
                              attention_mask=jnp.ones((1, 16), jnp.int32))
    c1 = KVCache.create(cfg, 1, 16, jnp.float32)
    sentinel_k = c1.k + 7.0
    c1 = c1._replace(k=sentinel_k, v=c1.v + 7.0)
    lg, c_part = qwen3.forward(params, ids, cfg, cache=c1,
                               attention_mask=jnp.ones((1, 16), jnp.int32),
                               num_layers=2)
    np.testing.assert_array_equal(np.asarray(c_part.k[:2, :, :6]),
                                  np.asarray(c_full.k[:2, :, :6]))
    np.testing.assert_array_equal(np.asarray(c_part.v[:2, :, :6]),
                                  np.asarray(c_full.v[:2, :, :6]))
    # untouched layers keep the sentinel
    np.testing.assert_array_equal(np.asarray(c_part.k[2:]),
                                  np.asarray(sentinel_k[2:]))
    assert lg.shape[-1] == cfg.vocab_size
