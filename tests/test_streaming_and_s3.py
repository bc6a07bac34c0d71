"""Streaming flow paths (chunk masks, pre-lookahead context, finalize=False)
and end-to-end audio -> S3 semantic codes."""
import dataclasses
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_distill_tpu.models import flow, flow_encoder
from speech_distill_tpu.tokenizer import s3


def tiny_cfg():
    enc = flow_encoder.FlowEncoderConfig(
        input_size=16, output_size=16, attention_heads=2, linear_units=32,
        num_blocks=1, num_up_blocks=1, static_chunk_size=4)
    return flow.FlowConfig(
        input_size=16, output_size=8, spk_embed_dim=6, vocab_size=30,
        n_timesteps=1, est_in_channels=32, est_channels=16, est_n_blocks=1,
        est_num_mid_blocks=1, est_num_heads=2, est_head_dim=8,
        static_chunk_size=4, encoder=enc)


@pytest.mark.slow
def test_flow_streaming_chunk_mask_runs():
    cfg = tiny_cfg()
    params = flow.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, T = 1, 8
    token = rng.integers(0, cfg.vocab_size, (B, T)).astype(np.int32)
    prompt = rng.normal(size=(B, 4, 8)).astype(np.float32)
    emb = rng.normal(size=(B, 6)).astype(np.float32)
    mel, lens = flow.forward_flow(
        params, jnp.asarray(token), jnp.asarray([T], np.int32),
        jnp.asarray(prompt), jnp.asarray([4], np.int32), jnp.asarray(emb),
        cfg, rng=jax.random.PRNGKey(1), streaming=True)
    assert mel.shape == (B, T * 2, 8)
    assert np.isfinite(np.asarray(mel)).all()

    # streaming chunk masks restrict attention: outputs differ from full
    mel_full, _ = flow.forward_flow(
        params, jnp.asarray(token), jnp.asarray([T], np.int32),
        jnp.asarray(prompt), jnp.asarray([4], np.int32), jnp.asarray(emb),
        cfg, rng=jax.random.PRNGKey(1), streaming=False)
    assert np.abs(np.asarray(mel) - np.asarray(mel_full)).max() > 1e-6


def test_flow_finalize_false_uses_context():
    """finalize=False feeds the last pre_lookahead_len tokens as lookahead
    context (flow.py:174-178)."""
    cfg = tiny_cfg()
    params = flow.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    B, T = 1, 11  # 8 tokens + 3 lookahead context
    token = rng.integers(0, cfg.vocab_size, (B, T)).astype(np.int32)
    prompt = rng.normal(size=(B, 4, 8)).astype(np.float32)
    emb = rng.normal(size=(B, 6)).astype(np.float32)
    mel, lens = flow.forward_flow(
        params, jnp.asarray(token), jnp.asarray([T - 3], np.int32),
        jnp.asarray(prompt), jnp.asarray([4], np.int32), jnp.asarray(emb),
        cfg, rng=jax.random.PRNGKey(2), finalize=False)
    assert mel.shape == (B, (T - 3) * 2, 8)
    np.testing.assert_array_equal(np.asarray(lens), [(T - 3) * 2])


def test_s3_tokenizer_audio_to_codes_end_to_end():
    """Raw audio (any rate) -> resample -> whisper mel -> encoder -> FSQ."""
    cfg = s3.S3Config(n_mels=128, n_state=32, n_head=4, n_layer=1,
                      max_ctx=256)
    params = s3.init_params(jax.random.PRNGKey(0), cfg)
    tok = s3.S3Tokenizer(params, cfg, pad_to_multiple_of=16)
    rng = np.random.default_rng(0)
    audio = rng.normal(size=24000).astype(np.float32) * 0.1  # 1s @ 24kHz
    codes = tok(audio, sr=24000)
    # 1 s -> 100 mel frames -> ~25 codes
    assert 20 <= len(codes) <= 26
    assert all(0 <= c < cfg.codebook_size for c in codes)
    # deterministic
    assert codes == tok(audio, sr=24000)


def test_s3_tokens_feed_processor():
    """S3 tokenizer plugs into the dataset processor as speech_tokens_fn."""
    from speech_distill_tpu.data.processor import SpeechDistillProcessor
    from tests.test_data import make_tokenizer

    cfg = s3.S3Config(n_mels=128, n_state=32, n_head=4, n_layer=1,
                      max_ctx=256)
    params = s3.init_params(jax.random.PRNGKey(0), cfg)
    s3tok = s3.S3Tokenizer(params, cfg, pad_to_multiple_of=16)

    def fn(audio_input):
        if isinstance(audio_input, dict):
            return s3tok(np.asarray(audio_input["array"], np.float32),
                         int(audio_input["sampling_rate"]))
        return s3tok(np.asarray(audio_input, np.float32))

    tok = make_tokenizer(n_speech=7000)
    proc = SpeechDistillProcessor(tok, speech_tokens_fn=fn)
    audio = np.random.default_rng(1).normal(size=8000).astype(np.float32)
    out = proc.process_example(
        {"audio": {"array": audio, "sampling_rate": 16000},
         "text": "hi", "lang": "en"})
    assert len(out["input_ids"]) > 10


def test_s3_tokenizer_batch_matches_single():
    """S3Tokenizer.batch == per-clip calls (reference
    get_speech_tokens_batch vs get_speech_tokens, utils.py:51-147),
    including ragged lengths padded to the batch max."""
    import numpy as np
    from speech_distill_tpu.tokenizer import s3 as s3_mod

    cfg = s3_mod.s3_tiny()
    params = s3_mod.init_params(jax.random.PRNGKey(0), cfg)
    tok = s3_mod.S3Tokenizer(params, cfg, pad_to_multiple_of=16)
    rng = np.random.default_rng(0)
    audios = [rng.normal(size=n).astype(np.float32) * 0.1
              for n in (16000, 9601, 12800)]
    batched = tok.batch(audios)
    singles = [tok(a) for a in audios]
    assert batched == singles
