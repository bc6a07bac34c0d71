"""End-to-end TTS orchestration with tiny random components."""
import dataclasses
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_distill_tpu.core.config import (EngineConfig, Qwen3Config,
                                            SamplingParams, qwen3_tiny)
from speech_distill_tpu.infer.engine import DecodeEngine
from speech_distill_tpu.infer.soulxpodcast import SoulXPodcast
from speech_distill_tpu.models import flow as flow_lib
from speech_distill_tpu.models import flow_encoder, hift as hift_lib
from speech_distill_tpu.models import qwen3
from speech_distill_tpu.tokenizer import s3


@pytest.fixture(scope="module")
def tiny_tts():
    # LLM: vocab 64; speech tokens at offset 40, eos 63
    llm_cfg = qwen3_tiny(64)
    llm_cfg = dataclasses.replace(llm_cfg, dtype="float32", remat=False,
                                  speech_token_offset=40, eos_token_id=63)
    llm_params = qwen3.init_params(jax.random.PRNGKey(0), llm_cfg)
    sp = SamplingParams(temperature=1.0, repetition_penalty=1.1, top_k=0,
                        top_p=1.0, min_tokens=2, max_tokens=8,
                        stop_token_ids=(63,), use_ras=True, win_size=5)
    cfg = EngineConfig(model="", llm=llm_cfg, sampling=sp, max_model_len=256,
                       max_turn_size=3, turn_tokens_threshold=120)
    engine = DecodeEngine(llm_params, llm_cfg, sp, max_len=256,
                          prefill_bucket=16, cache_dtype=jnp.float32)

    enc = flow_encoder.FlowEncoderConfig(
        input_size=16, output_size=16, attention_heads=2, linear_units=32,
        num_blocks=1, num_up_blocks=1)
    flow_cfg = flow_lib.FlowConfig(
        input_size=16, output_size=8, spk_embed_dim=6, vocab_size=23,
        n_timesteps=2, est_in_channels=32, est_channels=16, est_n_blocks=1,
        est_num_mid_blocks=1, est_num_heads=2, est_head_dim=8, encoder=enc)
    flow_params = flow_lib.init_params(jax.random.PRNGKey(1), flow_cfg)

    hift_cfg = hift_lib.HiFTConfig(
        in_channels=8, base_channels=16, nb_harmonics=2,
        resblock_kernel_sizes=(3,), resblock_dilations=((1,),),
        source_resblock_kernel_sizes=(3, 3, 3),
        source_resblock_dilations=((1,), (1,), (1,)), f0_cond_channels=8)
    hift_params = hift_lib.init_params(jax.random.PRNGKey(2), hift_cfg)

    s3_cfg = s3.S3Config(n_mels=16, n_state=16, n_head=2, n_layer=1,
                         fsq_dim=3, fsq_level=3)  # 27 codes > vocab 23? clamp

    s3_params = s3.init_params(jax.random.PRNGKey(3), s3_cfg)

    def s3_quantize(mels, lens):
        codes, code_lens = s3.quantize(s3_params, mels, lens, s3_cfg)
        return jnp.minimum(codes, flow_cfg.vocab_size - 1), code_lens

    model = SoulXPodcast(cfg, engine, s3_quantize, flow_params, flow_cfg,
                         hift_params, hift_cfg)
    return model, cfg, s3_cfg


def _prompt_features(s3_cfg, n_prompts=1, mel_T=32, seed=0):
    rng = np.random.default_rng(seed)
    mels = rng.normal(size=(n_prompts, s3_cfg.n_mels, mel_T)).astype(np.float32)
    lens = np.full((n_prompts,), mel_T, np.int32)
    # flow prompt mel: tokens*2 frames at 80->8 mels here
    flow_mel = [rng.normal(size=(mel_T // 2, 8)).astype(np.float32)
                for _ in range(n_prompts)]
    spk = rng.normal(size=(n_prompts, 6)).astype(np.float32)
    return mels, lens, flow_mel, spk


@pytest.mark.slow
def test_forward_tts_produces_waveform(tiny_tts):
    model, cfg, s3_cfg = tiny_tts
    mels, lens, flow_mel, spk = _prompt_features(s3_cfg)
    out = model.forward_tts(
        prompt_mels_for_llm=mels[0], prompt_mels_lens_for_llm=lens[0],
        prompt_text_tokens_for_llm=[1, 2, 3],
        text_tokens_for_llm=[4, 5],
        prompt_mels_for_flow_ori=flow_mel[0], spk_emb_for_flow=spk[0])
    wavs = out["generated_wavs"]
    assert len(wavs) == 1
    assert wavs[0].ndim == 1
    # mel frames * 480 upsampling
    assert wavs[0].shape[0] % model.hift_cfg.upsample_scale == 0
    assert np.isfinite(wavs[0]).all()


def test_forward_tts2_with_raw_inputs(tiny_tts):
    model, cfg, s3_cfg = tiny_tts
    mels, lens, flow_mel, spk = _prompt_features(s3_cfg, seed=1)
    out = model.forward_tts2(
        prompt_mels_for_llm=mels[0], prompt_mels_lens_for_llm=lens[0],
        inputs=[1, 2, 3, 4],
        prompt_mels_for_flow_ori=flow_mel[0], spk_emb_for_flow=spk[0])
    assert len(out["generated_wavs"]) == 1


@pytest.mark.slow
def test_forward_longform_multi_turn_with_eviction(tiny_tts):
    model, cfg, s3_cfg = tiny_tts
    n_prompts = 2
    mels, lens, flow_mel, spk = _prompt_features(s3_cfg, n_prompts, seed=2)
    turns = 5  # > max_turn_size=3 forces at least one eviction/rebuild
    out = model.forward_longform(
        prompt_mels_for_llm=mels, prompt_mels_lens_for_llm=lens,
        prompt_text_tokens_for_llm=[[1, 2], [3, 4]],
        text_tokens_for_llm=[[5, 6]] * turns,
        prompt_mels_for_flow_ori=flow_mel,
        spk_emb_for_flow=spk,
        spk_ids=[0, 1, 0, 1, 0])
    wavs = out["generated_wavs"]
    assert len(wavs) == turns
    for w in wavs:
        assert np.isfinite(w).all()


@pytest.mark.slow
def test_forward_longform_paged_engine_matches_decode_engine(tiny_tts):
    """The orchestrator runs unchanged on the stateless PagedEngine (full
    context per turn + persistent prefix cache — the reference's vLLM
    serving mode, llm_engine.py:78-114) and, under greedy sampling,
    produces bit-identical waveforms to the stateful DecodeEngine path
    across a 5-turn session that forces an eviction rebuild."""
    from speech_distill_tpu.infer.paged import PagedEngine

    model, cfg, s3_cfg = tiny_tts
    llm = model.llm
    greedy = dataclasses.replace(cfg.sampling, top_k=1, use_ras=False,
                                 temperature=1.0, repetition_penalty=1.0)
    cfg2 = dataclasses.replace(cfg, sampling=greedy)
    ref_eng = DecodeEngine(llm.params, llm.cfg, greedy, max_len=256,
                           prefill_bucket=16, cache_dtype=jnp.float32)
    paged_eng = PagedEngine(llm.params, llm.cfg, greedy, slots=2,
                            max_len=256, page_size=16, chunk_steps=4,
                            cache_dtype=jnp.float32, attn_impl="xla")
    n_prompts = 2
    mels, lens, flow_mel, spk = _prompt_features(s3_cfg, n_prompts, seed=5)
    kw = dict(prompt_mels_for_llm=mels, prompt_mels_lens_for_llm=lens,
              prompt_text_tokens_for_llm=[[1, 2], [3, 4]],
              text_tokens_for_llm=[[5, 6]] * 5,
              prompt_mels_for_flow_ori=flow_mel,
              spk_emb_for_flow=spk, spk_ids=[0, 1, 0, 1, 0])

    m_ref = SoulXPodcast(cfg2, ref_eng, model.s3_quantize,
                         model.flow_params, model.flow_cfg,
                         model.hift_params, model.hift_cfg, seed=0)
    m_paged = SoulXPodcast(cfg2, paged_eng, model.s3_quantize,
                           model.flow_params, model.flow_cfg,
                           model.hift_params, model.hift_cfg, seed=0)
    w_ref = m_ref.forward_longform(**kw)["generated_wavs"]
    w_paged = m_paged.forward_longform(**kw)["generated_wavs"]
    assert len(w_ref) == len(w_paged) == 5
    for a, b in zip(w_ref, w_paged):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)
