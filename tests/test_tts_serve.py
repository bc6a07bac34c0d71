"""Concurrent multi-session TTS serving (infer/tts_serve.py).

Exactness: the batched coordinator's per-session wav matches the
single-session StreamingTokenToWav run on the same token stream at the
same tick cadence — bit-equal when a tick's group is a single row (same
program shapes), and to float32 ulp noise when rows batch (XLA batches
the row-independent matmuls; HiFT rows stay bit-equal via per-row NSF
rngs, models/hift.py). Plus the engine-level on_chunk hook contract and
an end-to-end run over a real PagedEngine.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from speech_distill_tpu.core.config import SamplingParams, qwen3_tiny
from speech_distill_tpu.infer.streaming_tts import (StreamingTokenToWav,
                                                    make_stream_programs)
from speech_distill_tpu.infer.tts_serve import MultiSessionTTS, TTSSession
from speech_distill_tpu.models import qwen3
from tests.test_streaming_tts import _tiny_flow, _tiny_hift


class FakeEngine:
    """Delivers predefined token streams with the PagedEngine serve
    contract: per-chunk on_tokens(rid, new, done) for every live request
    (plus aligned on_logprobs when ``lps`` streams are given), then ONE
    on_chunk() per scheduler pass."""

    def __init__(self, streams, chunk=3, lps=None):
        self.streams = [list(s) for s in streams]
        self.chunk = chunk
        self.lps = None if lps is None else [list(l) for l in lps]

    def serve(self, prompts, max_new=None, on_tokens=None, on_chunk=None,
              on_logprobs=None):
        assert len(prompts) == len(self.streams)
        pos = [0] * len(self.streams)
        while any(p < len(s) for p, s in zip(pos, self.streams)):
            for rid, s in enumerate(self.streams):
                if pos[rid] >= len(s):
                    continue
                p0 = pos[rid]
                new = s[p0:p0 + self.chunk]
                pos[rid] += len(new)
                done = pos[rid] >= len(s)
                if on_tokens is not None:
                    on_tokens(rid, new, done)
                if on_logprobs is not None and self.lps is not None:
                    on_logprobs(rid, self.lps[rid][p0:p0 + len(new)],
                                done)
            if on_chunk is not None:
                on_chunk()
        return [list(s) for s in self.streams]


def _session_inputs(n, seed=0):
    rng = np.random.default_rng(seed)
    fp, fc = _tiny_flow()
    out = []
    for i in range(n):
        pml = int(rng.integers(2, 7))
        out.append(dict(
            flow_prompt_tokens=rng.integers(0, fc.vocab_size,
                                            int(rng.integers(1, 4))).tolist(),
            prompt_mel=rng.normal(size=(pml, 8)).astype(np.float32),
            prompt_mel_len=pml,
            spk_emb=rng.normal(size=(6,)).astype(np.float32),
            rng=jax.random.PRNGKey(100 + i)))
    streams = [rng.integers(0, fc.vocab_size - 1,
                            int(rng.integers(9, 19))).tolist() + [49]
               for _ in range(n)]
    return out, streams


def _reference_wavs(inputs, streams, chunk, fp, fc, hp, hc, programs,
                    mel_pad_to):
    """Single-session synthesis at the same tick cadence the FakeEngine
    delivers (the vocoder window sequence depends on cadence)."""
    wavs = []
    for inp, s in zip(inputs, streams):
        synth = StreamingTokenToWav(
            fp, fc, hp, hc, inp["flow_prompt_tokens"], inp["prompt_mel"],
            inp["prompt_mel_len"], inp["spk_emb"], inp["rng"],
            token_bucket=64, max_tokens=4096, programs=programs,
            mel_pad_to=mel_pad_to)
        chunks = []
        for i0 in range(chunk, len(s) + chunk, chunk):
            gen = s[:min(i0, len(s))]
            chunks += synth.push(gen[:-1], final=len(gen) == len(s))
        wavs.append(np.concatenate(chunks) if chunks
                    else np.zeros((0,), np.float32))
    return wavs


def _run_coordinator(n, seed, chunk=3):
    fp, fc = _tiny_flow()
    hp, hc = _tiny_hift()
    programs = make_stream_programs(fc, hc)
    inputs, streams = _session_inputs(n, seed)
    engine = FakeEngine(streams, chunk=chunk)
    coord = MultiSessionTTS(engine, fp, fc, hp, hc, speech_token_offset=0,
                            programs=programs)
    sessions = [TTSSession(llm_ids=[1, 2, 3], **inp) for inp in inputs]
    results = coord.serve(sessions)
    mel_pad_to = max(-(-max(i["prompt_mel"].shape[0]
                            for i in inputs) // 16) * 16, 16)
    refs = _reference_wavs(inputs, streams, chunk, fp, fc, hp, hc,
                           programs, mel_pad_to)
    return results, refs, streams


def test_single_session_is_bit_equal():
    """N=1: every batched group is one row, so program shapes equal the
    single-session path exactly -> bit-equal wav."""
    results, refs, streams = _run_coordinator(1, seed=3)
    assert results[0]["tokens"] == streams[0]
    assert results[0]["wav"].shape == refs[0].shape
    np.testing.assert_array_equal(results[0]["wav"], refs[0])


def test_multi_session_matches_single_session():
    """N=5 staggered sessions: batched rows match single-session synthesis
    (HiFT bit-equal per row; flow rows to ulp noise)."""
    results, refs, streams = _run_coordinator(5, seed=0)
    for r, ref, s in zip(results, refs, streams):
        assert r["tokens"] == s
        assert r["wav"].shape == ref.shape
        np.testing.assert_allclose(r["wav"], ref, atol=2e-4, rtol=1e-4)
        assert r["n_chunks"] >= 1
        assert r["ttfa_s"] is not None and r["ttfa_s"] >= 0
    # the longer sessions actually streamed (several chunks)
    assert max(r["n_chunks"] for r in results) >= 2


def test_paged_engine_on_chunk_hook():
    """Engine contract: on_chunk fires once per scheduler pass, AFTER
    every on_tokens of that chunk; downstream phase time is recorded."""
    from speech_distill_tpu.infer.paged import PagedEngine

    llm_cfg = dataclasses.replace(qwen3_tiny(48), dtype="float32",
                                  remat=False)
    llm_params = qwen3.init_params(jax.random.PRNGKey(3), llm_cfg)
    sp = SamplingParams(stop_token_ids=(47,), max_tokens=10, min_tokens=10,
                        top_k=1, temperature=1.0, use_ras=False,
                        repetition_penalty=1.0)
    eng = PagedEngine(llm_params, llm_cfg, sp, slots=2, max_len=64,
                      page_size=8, chunk_steps=3, cache_dtype=jnp.float32,
                      attn_impl="xla")
    events = []
    rng = np.random.default_rng(1)
    prompts = [rng.integers(1, 46, 6).tolist() for _ in range(3)]
    outs = eng.serve(prompts, max_new=10,
                     on_tokens=lambda rid, new, done: events.append("t"),
                     on_chunk=lambda: events.append("c"))
    assert all(len(o) == 10 for o in outs)
    assert events and events[-1] == "c"
    # every chunk's token callbacks are flushed by an on_chunk before the
    # next chunk's tokens appear: "t" never directly precedes serve() end
    assert "c" in events
    assert eng.phase_seconds["downstream"] >= 0.0
    # at least one pass delivered tokens for multiple requests before the
    # barrier (the batching opportunity the hook exists for)
    bursts = [len(b) for b in "".join(events).split("c") if b]
    assert max(bursts) >= 2


def test_multisession_over_paged_engine():
    """End-to-end: N sessions through a real PagedEngine with batched
    synthesis ticks; wavs are finite, complete, and sized by the token
    count; generated streams match serve outputs."""
    from speech_distill_tpu.infer.paged import PagedEngine

    llm_cfg = dataclasses.replace(qwen3_tiny(48), dtype="float32",
                                  remat=False)
    llm_params = qwen3.init_params(jax.random.PRNGKey(3), llm_cfg)
    sp = SamplingParams(stop_token_ids=(47,), max_tokens=12, min_tokens=12,
                        top_k=1, temperature=1.0, use_ras=False,
                        repetition_penalty=1.0)
    eng = PagedEngine(llm_params, llm_cfg, sp, slots=2, max_len=64,
                      page_size=8, chunk_steps=3, cache_dtype=jnp.float32,
                      attn_impl="xla")
    fp, fc = _tiny_flow(enc_chunk=2)
    hp, hc = _tiny_hift()
    coord = MultiSessionTTS(eng, fp, fc, hp, hc, speech_token_offset=0)
    rng = np.random.default_rng(8)
    pml = 4
    sessions = [TTSSession(
        llm_ids=rng.integers(1, 46, 8).tolist(),
        flow_prompt_tokens=rng.integers(0, fc.vocab_size, 2).tolist(),
        prompt_mel=rng.normal(size=(pml, 8)).astype(np.float32),
        prompt_mel_len=pml,
        spk_emb=rng.normal(size=(6,)).astype(np.float32),
        rng=jax.random.PRNGKey(i)) for i in range(4)]
    streamed = []
    results = coord.serve(sessions, max_new=12,
                          on_wav=lambda sid, w: streamed.append(sid))
    outs = [r["tokens"] for r in results]
    assert all(len(o) == 12 for o in outs)
    for r in results:
        wav = r["wav"]
        assert np.isfinite(wav).all()
        # every (prompt + generated-minus-eos) token became
        # ratio*upsample samples
        n_tok = 2 + len(r["tokens"]) - 1
        assert wav.shape[0] == (2 * n_tok - pml) * hc.upsample_scale
        assert r["ttfa_s"] is not None
    assert len(set(streamed)) == 4       # all sessions streamed chunks


def _gated_setup(seed=3, n_tokens=12):
    """Deterministic single-session fixture for the confidence gate."""
    fp, fc = _tiny_flow()
    hp, hc = _tiny_hift()
    programs = make_stream_programs(fc, hc)
    inputs, _ = _session_inputs(1, seed)
    rng = np.random.default_rng(seed)
    stream = rng.integers(0, fc.vocab_size - 1,
                          n_tokens - 1).tolist() + [fc.vocab_size - 1]
    mel_pad_to = max(-(-inputs[0]["prompt_mel"].shape[0] // 16) * 16, 16)
    return fp, fc, hp, hc, programs, inputs[0], stream, mel_pad_to


def _ref_cadence(inp, pushes, fp, fc, hp, hc, programs, mel_pad_to):
    """Single-session synthesis at an explicit push cadence
    [(tokens, final), ...]."""
    synth = StreamingTokenToWav(
        fp, fc, hp, hc, inp["flow_prompt_tokens"], inp["prompt_mel"],
        inp["prompt_mel_len"], inp["spk_emb"], inp["rng"],
        token_bucket=64, max_tokens=4096, programs=programs,
        mel_pad_to=mel_pad_to)
    chunks = []
    for toks, final in pushes:
        chunks += synth.push(toks, final=final)
    return np.concatenate(chunks) if chunks else np.zeros((0,), np.float32)


def test_confidence_gate_passthrough_when_confident():
    """A gate threshold nothing falls below never defers: wav bit-equal
    to the ungated coordinator (N=1: single-row groups, same programs)."""
    fp, fc, hp, hc, programs, inp, stream, mel_pad_to = _gated_setup()
    lps = [-0.1] * len(stream)

    def run(gate):
        eng = FakeEngine([stream], chunk=3, lps=[lps])
        coord = MultiSessionTTS(eng, fp, fc, hp, hc,
                                speech_token_offset=0, programs=programs,
                                confidence_gate=gate)
        return coord.serve([TTSSession(llm_ids=[1, 2, 3], **inp)])[0]

    gated, ungated = run(-1e9), run(None)
    assert gated["gate_deferrals"] == 0
    assert ungated["gate_deferrals"] == 0
    np.testing.assert_array_equal(gated["wav"], ungated["wav"])


def test_confidence_gate_defers_low_confidence_run():
    """A low-confidence mid-stream tick is deferred exactly once and the
    merged-tick synthesis bit-matches the single-session run at the
    merged cadence (deferral only moves chunk boundaries)."""
    fp, fc, hp, hc, programs, inp, stream, mel_pad_to = _gated_setup()
    # ticks deliver 3 tokens each (gen lengths 3, 6, 9, 12); the flow
    # sees gen[:-1]. Fresh spans per tick: [0:2], [2:5], then (after the
    # deferral) [2:8], then final. lps[2:5] are low (-10); with
    # threshold -6 the tick-2 mean (-10) defers, the tick-3 mean over
    # [2:8] is (3*-10 + 3*-0.1)/6 = -5.05 > -6 and synthesis resumes.
    lps = [-0.1] * len(stream)
    lps[2:5] = [-10.0] * 3
    eng = FakeEngine([stream], chunk=3, lps=[lps])
    coord = MultiSessionTTS(eng, fp, fc, hp, hc, speech_token_offset=0,
                            programs=programs, confidence_gate=-6.0,
                            gate_max_defer=2)
    res = coord.serve([TTSSession(llm_ids=[1, 2, 3], **inp)])[0]
    assert res["gate_deferrals"] == 1
    ref = _ref_cadence(inp, [(stream[:2], False), (stream[:8], False),
                             (stream[:11], True)],
                       fp, fc, hp, hc, programs, mel_pad_to)
    assert res["wav"].shape == ref.shape
    np.testing.assert_array_equal(res["wav"], ref)


def test_confidence_gate_deferral_is_bounded():
    """With uniformly low confidence, gate_max_defer bounds consecutive
    deferrals: synthesis still completes at the forced cadence."""
    fp, fc, hp, hc, programs, inp, stream, mel_pad_to = _gated_setup()
    lps = [-10.0] * len(stream)
    eng = FakeEngine([stream], chunk=3, lps=[lps])
    coord = MultiSessionTTS(eng, fp, fc, hp, hc, speech_token_offset=0,
                            programs=programs, confidence_gate=-3.0,
                            gate_max_defer=1)
    res = coord.serve([TTSSession(llm_ids=[1, 2, 3], **inp)])[0]
    # tick1 defers, tick2 forced (toks=5), tick3 defers, tick4 final
    assert res["gate_deferrals"] == 2
    ref = _ref_cadence(inp, [(stream[:5], False), (stream[:11], True)],
                       fp, fc, hp, hc, programs, mel_pad_to)
    assert res["wav"].shape == ref.shape
    np.testing.assert_array_equal(res["wav"], ref)
