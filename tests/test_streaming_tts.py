"""Streaming TTS: chunk-aligned incremental flow is exact vs the offline
streaming=True computation; LLM token streaming equals generate(); the
end-to-end generator produces the full waveform in chunks."""
import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_distill_tpu.core.config import (EngineConfig, SamplingParams,
                                            qwen3_tiny)
from speech_distill_tpu.infer.engine import DecodeEngine
from speech_distill_tpu.infer.streaming_tts import (StreamingTokenToWav,
                                                    fade_in_out)
from speech_distill_tpu.models import flow as flow_lib
from speech_distill_tpu.models import flow_encoder, hift as hift_lib
from speech_distill_tpu.models import qwen3


def _tiny_flow(enc_chunk=4, la=3):
    enc = flow_encoder.FlowEncoderConfig(
        input_size=16, output_size=16, attention_heads=2, linear_units=32,
        num_blocks=2, num_up_blocks=1, static_chunk_size=enc_chunk,
        pre_lookahead_len=la)
    cfg = flow_lib.FlowConfig(
        input_size=16, output_size=8, spk_embed_dim=6, vocab_size=50,
        n_timesteps=2, est_in_channels=32, est_channels=16, est_n_blocks=1,
        est_num_mid_blocks=1, est_num_heads=2, est_head_dim=8,
        pre_lookahead_len=la, static_chunk_size=enc_chunk * 2, encoder=enc)
    params = flow_lib.init_params(jax.random.PRNGKey(1), cfg)
    return params, cfg


def _tiny_hift():
    cfg = hift_lib.HiFTConfig(
        in_channels=8, base_channels=16, nb_harmonics=2,
        resblock_kernel_sizes=(3,), resblock_dilations=((1,),),
        source_resblock_kernel_sizes=(3, 3, 3),
        source_resblock_dilations=((1,), (1,), (1,)), f0_cond_channels=8)
    return hift_lib.init_params(jax.random.PRNGKey(2), cfg), cfg


def test_enc_len_prefix_is_stable():
    """The core streaming invariant: with chunk-causal masks, causal convs,
    inline lookahead (enc_len) and fixed noise, the mel of every COMPLETED
    chunk is identical no matter how many further tokens exist — incl. the
    final full-sequence call. Bucketed widths differ per call, so this also
    proves padding invariance."""
    fp, fc = _tiny_flow()
    rng = np.random.default_rng(0)
    n_total, chunk, la = 19, 4, fc.pre_lookahead_len
    toks = rng.integers(0, fc.vocab_size, n_total).tolist()
    pml = 6                              # 3 prompt tokens * ratio 2
    pmel = rng.normal(size=(1, pml, 8)).astype(np.float32)
    emb = rng.normal(size=(1, 6)).astype(np.float32)
    noise = jax.random.normal(jax.random.PRNGKey(7), (1, 128, 8))

    def call(n_have, n_enc, W):
        arr = np.zeros((1, W), np.int32)
        arr[0, :n_have] = toks[:n_have]
        mels, _ = flow_lib.forward_flow(
            fp, jnp.asarray(arr), jnp.asarray([n_have], jnp.int32),
            jnp.asarray(pmel), jnp.asarray([pml], jnp.int32),
            jnp.asarray(emb), fc, streaming=True,
            noise=noise[:, :2 * W], enc_len=jnp.asarray([n_enc], jnp.int32))
        return np.asarray(mels)

    full = call(n_total, n_total, 24)    # the final (flush) call
    for m in range(1, (n_total - la) // chunk + 1):
        n_enc = m * chunk
        W = -(-(n_enc + la) // 8) * 8    # bucket of 8 like the streamer
        part = call(n_enc + la, n_enc, W)
        np.testing.assert_allclose(part[:, :2 * n_enc],
                                   full[:, :2 * n_enc], atol=2e-4,
                                   rtol=1e-4)


def test_generate_stream_matches_generate():
    cfg = qwen3_tiny(48)
    cfg = dataclasses.replace(cfg, dtype="float32", remat=False)
    params = qwen3.init_params(jax.random.PRNGKey(3), cfg)
    sp = SamplingParams(stop_token_ids=(47,), max_tokens=17, min_tokens=17,
                        top_k=1, temperature=1.0, use_ras=False,
                        repetition_penalty=1.0)
    prompt = list(range(1, 9))
    eng = DecodeEngine(params, cfg, sp, max_len=64, prefill_bucket=8,
                       cache_dtype=jnp.float32)
    ref = eng.generate(prompt)["token_ids"]
    eng2 = DecodeEngine(params, cfg, sp, max_len=64, prefill_bucket=8,
                        cache_dtype=jnp.float32)
    chunks = list(eng2.generate_stream(prompt, chunk=5))
    assert len(chunks) >= 3              # actually streamed
    assert [t for c in chunks for t in c] == ref


def test_streaming_token_to_wav_emits_full_waveform():
    fp, fc = _tiny_flow()
    hp, hc = _tiny_hift()
    rng = np.random.default_rng(4)
    prompt_toks = rng.integers(0, fc.vocab_size, 3).tolist()
    pmel = rng.normal(size=(6, 8)).astype(np.float32)
    spk = rng.normal(size=(6,)).astype(np.float32)
    gen = rng.integers(0, fc.vocab_size, 18).tolist()

    synth = StreamingTokenToWav(fp, fc, hp, hc, prompt_toks, pmel, 6, spk,
                                jax.random.PRNGKey(5), token_bucket=8,
                                mel_cache_frames=2, max_tokens=64)
    chunks = []
    for i in range(1, len(gen) + 1):     # token-by-token arrival
        chunks += synth.push(gen[:i])
    n_mid = len(chunks)
    chunks += synth.push(gen, final=True)
    assert n_mid >= 2                    # streamed before the final flush
    assert len(chunks) > n_mid
    wav = np.concatenate(chunks)
    # total samples == every generated token's mel frames * upsample
    total_tokens = len(prompt_toks) + len(gen)
    assert wav.shape[0] == (2 * total_tokens - 6) * hc.upsample_scale
    assert np.isfinite(wav).all()
    with pytest.raises(RuntimeError):
        synth.push(gen)                  # stream is closed


def test_streaming_chunk_boundary_validation():
    fp, fc = _tiny_flow()
    hp, hc = _tiny_hift()
    z = np.zeros((2, 8), np.float32)
    with pytest.raises(ValueError, match="multiple"):
        StreamingTokenToWav(fp, fc, hp, hc, [1], z, 2,
                            np.zeros(6, np.float32), jax.random.PRNGKey(0),
                            chunk_tokens=3)
    with pytest.raises(ValueError, match="mel_cache_frames"):
        StreamingTokenToWav(fp, fc, hp, hc, [1], z, 2,
                            np.zeros(6, np.float32), jax.random.PRNGKey(0),
                            mel_cache_frames=0)
    # estimator chunk not divisible by ratio: boundaries must complete the
    # MEL blocks, i.e. chunk*ratio % est == 0 (est 6, ratio 2 -> base
    # includes 3), not ceil(est/ratio)
    import dataclasses as dc
    fc6 = dc.replace(fc, static_chunk_size=6,
                     encoder=dc.replace(fc.encoder, static_chunk_size=2))
    with pytest.raises(ValueError, match="multiple"):
        StreamingTokenToWav(fp, fc6, hp, hc, [1], z, 2,
                            np.zeros(6, np.float32), jax.random.PRNGKey(0),
                            chunk_tokens=2)
    assert StreamingTokenToWav(fp, fc6, hp, hc, [1], z, 2,
                               np.zeros(6, np.float32),
                               jax.random.PRNGKey(0)).chunk == 6


def test_streaming_unaligned_prompt_small_first_chunk():
    """A prompt whose length is NOT chunk-aligned makes the first emitted
    mel region smaller than the vocoder hold window; the pending-mel
    accumulator must merge it into the next window instead of storing an
    undersized cross-fade tail (used to raise a broadcast ValueError)."""
    fp, fc = _tiny_flow()                # chunk = 4 tokens = 8 mel frames
    hp, hc = _tiny_hift()
    rng = np.random.default_rng(11)
    prompt_toks = rng.integers(0, fc.vocab_size, 3).tolist()  # unaligned
    pml = 6
    pmel = rng.normal(size=(pml, 8)).astype(np.float32)
    spk = rng.normal(size=(6,)).astype(np.float32)
    gen = rng.integers(0, fc.vocab_size, 15).tolist()

    # cache 4 >= the 2-frame first emitted region: the old code crashed
    synth = StreamingTokenToWav(fp, fc, hp, hc, prompt_toks, pmel, pml, spk,
                                jax.random.PRNGKey(5), token_bucket=8,
                                mel_cache_frames=4, max_tokens=64)
    chunks = []
    for i in range(1, len(gen) + 1):
        chunks += synth.push(gen[:i])
    assert len(chunks) >= 1              # streamed before the flush
    chunks += synth.push(gen, final=True)
    wav = np.concatenate(chunks)
    total_tokens = len(prompt_toks) + len(gen)
    assert wav.shape[0] == (2 * total_tokens - pml) * hc.upsample_scale
    assert np.isfinite(wav).all()


def test_fade_in_out():
    win = np.hamming(8).astype(np.float32)
    new = np.ones((1, 10), np.float32)
    old = np.full((1, 4), 3.0, np.float32)
    out = fade_in_out(new, old, win)
    np.testing.assert_allclose(out[0, :4], win[:4] * 1.0 + win[4:] * 3.0,
                               atol=1e-6)
    np.testing.assert_allclose(out[0, 4:], 1.0)
    np.testing.assert_allclose(new, 1.0)  # input untouched


@pytest.mark.slow
def test_forward_tts_streaming_e2e():
    """Orchestrator generator: tiny LLM + flow + hift, wav chunks stream
    out and concatenate to a finite waveform of the expected length."""
    from speech_distill_tpu.infer.soulxpodcast import SoulXPodcast
    from speech_distill_tpu.tokenizer import s3

    llm_cfg = qwen3_tiny(64)
    llm_cfg = dataclasses.replace(llm_cfg, dtype="float32", remat=False,
                                  speech_token_offset=40, eos_token_id=63)
    llm_params = qwen3.init_params(jax.random.PRNGKey(0), llm_cfg)
    sp = SamplingParams(temperature=1.0, repetition_penalty=1.1, top_k=0,
                        top_p=1.0, min_tokens=12, max_tokens=14,
                        stop_token_ids=(63,), use_ras=True, win_size=5)
    cfg = EngineConfig(model="", llm=llm_cfg, sampling=sp,
                       max_model_len=256)
    engine = DecodeEngine(llm_params, llm_cfg, sp, max_len=256,
                          prefill_bucket=16, cache_dtype=jnp.float32)
    fp, fc = _tiny_flow(enc_chunk=2)
    hp, hc = _tiny_hift()
    s3_cfg = s3.S3Config(n_mels=16, n_state=16, n_head=2, n_layer=1,
                         fsq_dim=3, fsq_level=3)
    s3_params = s3.init_params(jax.random.PRNGKey(3), s3_cfg)

    def s3_quantize(mels, lens):
        codes, code_lens = s3.quantize(s3_params, mels, lens, s3_cfg)
        return jnp.minimum(codes, fc.vocab_size - 1), code_lens

    model = SoulXPodcast(cfg, engine, s3_quantize, fp, fc, hp, hc)
    rng = np.random.default_rng(0)
    mels = rng.normal(size=(1, 16, 32)).astype(np.float32)
    lens = np.full((1,), 32, np.int32)
    flow_mel = rng.normal(size=(16, 8)).astype(np.float32)
    spk = rng.normal(size=(1, 6)).astype(np.float32)

    chunks = list(model.forward_tts_streaming(
        prompt_mels_for_llm=mels[0], prompt_mels_lens_for_llm=lens[0],
        prompt_text_tokens_for_llm=[1, 2, 3], text_tokens_for_llm=[4, 5],
        prompt_mels_for_flow_ori=flow_mel, spk_emb_for_flow=spk[0],
        llm_chunk=4))
    assert len(chunks) >= 2              # streamed, not single-shot
    wav = np.concatenate(chunks)
    assert wav.ndim == 1 and np.isfinite(wav).all()
    assert wav.shape[0] % hc.upsample_scale == 0 and wav.shape[0] > 0


def test_generate_stream_multi_turn_state():
    """generate_stream continues a caller-held cache across turns exactly
    like generate (greedy)."""
    cfg = qwen3_tiny(48)
    cfg = dataclasses.replace(cfg, dtype="float32", remat=False)
    params = qwen3.init_params(jax.random.PRNGKey(6), cfg)
    sp = SamplingParams(stop_token_ids=(47,), max_tokens=9, min_tokens=9,
                        top_k=1, temperature=1.0, use_ras=False,
                        repetition_penalty=1.0)
    t1, t2 = list(range(1, 7)), [7, 8, 9]

    eng = DecodeEngine(params, cfg, sp, max_len=64, prefill_bucket=8,
                       cache_dtype=jnp.float32)
    s = eng.new_state(1)
    o1 = eng.generate(t1, state=s)
    o2 = eng.generate(t2, state=o1["state"])

    eng2 = DecodeEngine(params, cfg, sp, max_len=64, prefill_bucket=8,
                        cache_dtype=jnp.float32)
    s2 = eng2.new_state(1)
    g1 = [t for c in eng2.generate_stream(t1, chunk=4, state=s2) for t in c]
    assert eng2.last_stream_state is not None
    g2 = [t for c in eng2.generate_stream(t2, chunk=4,
                                          state=eng2.last_stream_state)
          for t in c]
    assert g1 == o1["token_ids"] and g2 == o2["token_ids"]


@pytest.mark.slow
def test_forward_longform_streaming_e2e():
    """Multi-turn streaming longform: chunks stream per turn through the
    eviction policy; every turn yields audio."""
    from speech_distill_tpu.infer.soulxpodcast import SoulXPodcast
    from speech_distill_tpu.tokenizer import s3

    llm_cfg = qwen3_tiny(64)
    llm_cfg = dataclasses.replace(llm_cfg, dtype="float32", remat=False,
                                  speech_token_offset=40, eos_token_id=63)
    llm_params = qwen3.init_params(jax.random.PRNGKey(0), llm_cfg)
    sp = SamplingParams(temperature=1.0, repetition_penalty=1.1, top_k=0,
                        top_p=1.0, min_tokens=8, max_tokens=10,
                        stop_token_ids=(63,), use_ras=True, win_size=5)
    # tight thresholds force at least one eviction rebuild across 4 turns
    cfg = EngineConfig(model="", llm=llm_cfg, sampling=sp,
                       max_model_len=256, max_turn_size=2,
                       turn_tokens_threshold=100)
    engine = DecodeEngine(llm_params, llm_cfg, sp, max_len=256,
                          prefill_bucket=16, cache_dtype=jnp.float32)
    fp, fc = _tiny_flow(enc_chunk=2)
    hp, hc = _tiny_hift()
    s3_cfg = s3.S3Config(n_mels=16, n_state=16, n_head=2, n_layer=1,
                         fsq_dim=3, fsq_level=3)
    s3_params = s3.init_params(jax.random.PRNGKey(3), s3_cfg)

    def s3_quantize(mels, lens):
        codes, code_lens = s3.quantize(s3_params, mels, lens, s3_cfg)
        return jnp.minimum(codes, fc.vocab_size - 1), code_lens

    model = SoulXPodcast(cfg, engine, s3_quantize, fp, fc, hp, hc)
    rng = np.random.default_rng(1)
    n_turns = 4
    mels = rng.normal(size=(1, 16, 32)).astype(np.float32)
    lens = np.full((1,), 32, np.int32)
    flow_mel = [rng.normal(size=(16, 8)).astype(np.float32)]
    spk = rng.normal(size=(1, 6)).astype(np.float32)

    events = list(model.forward_longform_streaming(
        prompt_mels_for_llm=mels, prompt_mels_lens_for_llm=lens,
        prompt_text_tokens_for_llm=[[1, 2, 3]],
        text_tokens_for_llm=[[4 + i, 5] for i in range(n_turns)],
        prompt_mels_for_flow_ori=flow_mel, spk_emb_for_flow=spk,
        llm_chunk=4))
    turns = sorted({t for t, _ in events})
    assert turns == list(range(n_turns))     # every turn produced audio
    for _, w in events:
        assert w.ndim == 1 and np.isfinite(w).all()
    # streaming within turns: more chunks than turns
    assert len(events) > n_turns


@pytest.mark.slow
def test_concurrent_streaming_tts_over_paged_engine():
    """The production-server composition: PagedEngine.serve streams token
    chunks per request (on_tokens) into one StreamingTokenToWav per
    request — N concurrent TTS sessions synthesize audio while decode
    continues, each producing its full waveform."""
    from speech_distill_tpu.core.config import qwen3_tiny
    from speech_distill_tpu.infer.paged import PagedEngine
    from speech_distill_tpu.infer.streaming_tts import make_stream_programs

    llm_cfg = qwen3_tiny(48)
    llm_cfg = dataclasses.replace(llm_cfg, dtype="float32", remat=False)
    llm_params = qwen3.init_params(jax.random.PRNGKey(3), llm_cfg)
    sp = SamplingParams(stop_token_ids=(47,), max_tokens=12, min_tokens=12,
                        top_k=1, temperature=1.0, use_ras=False,
                        repetition_penalty=1.0)
    eng = PagedEngine(llm_params, llm_cfg, sp, slots=2, max_len=64,
                      page_size=8, chunk_steps=3,
                      cache_dtype=jnp.float32, attn_impl="xla")

    fp, fc = _tiny_flow(enc_chunk=2)
    hp, hc = _tiny_hift()
    programs = make_stream_programs(fc, hc)
    rng = np.random.default_rng(8)
    n_req = 4
    prompts = [rng.integers(1, 46, 8).tolist() for _ in range(n_req)]
    pml = 4
    synths = [StreamingTokenToWav(
        fp, fc, hp, hc, rng.integers(0, fc.vocab_size, 2).tolist(),
        rng.normal(size=(pml, 8)).astype(np.float32), pml,
        rng.normal(size=(6,)).astype(np.float32), jax.random.PRNGKey(i),
        token_bucket=8, programs=programs) for i in range(n_req)]
    wavs = [[] for _ in range(n_req)]
    gens = [[] for _ in range(n_req)]

    def on_tokens(rid, toks, done):
        gens[rid].extend(min(t, fc.vocab_size - 1) for t in toks)
        wavs[rid] += synths[rid].push(gens[rid], final=done)

    outs = eng.serve(prompts, max_new=12, on_tokens=on_tokens)
    for rid in range(n_req):
        assert len(gens[rid]) == len(outs[rid]) == 12
        wav = np.concatenate(wavs[rid])
        assert np.isfinite(wav).all()
        # every (prompt + generated) token became ratio*upsample samples
        assert wav.shape[0] == (2 * (2 + 12) - pml) * hc.upsample_scale


def test_incremental_flow_matches_recompute():
    """StreamingTokenToWav(incremental=True) — the per-Euler-step cached
    flow (models/flow.py forward_flow_incremental) — emits the same wav
    chunks as the O(n^2/chunk) prefix-recompute streamer on the same token
    stream (fp32 caches here for tight parity; bf16 is the memory default
    on TPU). Exercises multiple F buckets: the first call covers
    prompt+chunk frames, the flush is a partial chunk."""
    fp, fc = _tiny_flow()
    hp, hc = _tiny_hift()
    rng = np.random.default_rng(6)
    prompt_toks = rng.integers(0, fc.vocab_size, 3).tolist()
    pmel = rng.normal(size=(6, 8)).astype(np.float32)
    spk = rng.normal(size=(6,)).astype(np.float32)
    gen = rng.integers(0, fc.vocab_size, 27).tolist()
    key = jax.random.PRNGKey(5)

    def mk(inc):
        return StreamingTokenToWav(
            fp, fc, hp, hc, prompt_toks, pmel, 6, spk, key,
            token_bucket=8, mel_cache_frames=2, max_tokens=64,
            incremental=inc, inc_max_frames=128,
            inc_kv_dtype=jnp.float32)

    ref, inc = mk(False), mk(True)
    got_ref, got_inc = [], []
    for i in range(1, len(gen) + 1):     # token-by-token arrival
        got_ref += ref.push(gen[:i])
        got_inc += inc.push(gen[:i])
    got_ref += ref.push(gen, final=True)
    got_inc += inc.push(gen, final=True)
    assert len(got_inc) == len(got_ref) and len(got_ref) >= 3
    for a, b in zip(got_ref, got_inc):
        assert a.shape == b.shape
        np.testing.assert_allclose(b, a, atol=2e-4, rtol=1e-4)


def test_incremental_flow_capacity_error():
    fp, fc = _tiny_flow()
    hp, hc = _tiny_hift()
    rng = np.random.default_rng(7)
    synth = StreamingTokenToWav(
        fp, fc, hp, hc, [1, 2, 3],
        rng.normal(size=(6, 8)).astype(np.float32), 6,
        rng.normal(size=(6,)).astype(np.float32), jax.random.PRNGKey(0),
        token_bucket=8, mel_cache_frames=2, max_tokens=64,
        incremental=True, inc_max_frames=16)
    with pytest.raises(ValueError, match="inc_max_frames"):
        synth.push(rng.integers(0, fc.vocab_size, 24).tolist())
