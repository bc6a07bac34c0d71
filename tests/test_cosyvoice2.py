"""CosyVoice2 split-embedding teacher: parity vs a torch oracle of the
reference wrapper semantics, plus Qwen2-mode backbone parity vs HF."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_distill_tpu.core.config import Qwen3Config
from speech_distill_tpu.models import cosyvoice2 as cv2
from speech_distill_tpu.models import qwen3
from speech_distill_tpu.models.hf_loader import from_state_dict

torch = pytest.importorskip("torch")


def _tiny_qwen2_cfg(vocab=160):
    return Qwen3Config(
        vocab_size=vocab, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, attention_bias=True, qk_norm=False,
        dtype="float32", remat=False, max_position_embeddings=256)


def test_qwen2_backbone_matches_hf():
    from transformers import Qwen2Config as HFQwen2Config, Qwen2ForCausalLM
    cfg = _tiny_qwen2_cfg()
    hf_cfg = HFQwen2Config(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim, rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta, tie_word_embeddings=True,
        attention_bias=True, max_position_embeddings=256)
    torch.manual_seed(0)
    model = Qwen2ForCausalLM(hf_cfg).eval().to(torch.float32)
    params = from_state_dict(model.state_dict(), cfg, dtype="float32")
    ids = np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 11))
    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids)).logits.numpy()
    got = np.asarray(qwen3.forward(params, jnp.asarray(ids), cfg))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def _tiny_cv2():
    backbone = _tiny_qwen2_cfg(vocab=100)
    cfg = cv2.CosyVoice2Config(
        backbone=backbone, text_vocab_size=104, speech_token_size=20,
        unified_vocab_size=104 + 2 + 23 + 1)
    params = cv2.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _torch_oracle_forward(cfg, params, ids_np, jax_hidden_fn):
    """Range-routed embedding + merged logits, torch semantics
    (teacher_wrapper.py:59-162), sharing the JAX backbone for hidden states."""
    text_vocab = cfg.text_vocab_size
    sp_off = cfg.speech_offset
    table_text = np.asarray(params["backbone"]["embed"]["weight"], np.float32)
    emb = np.zeros(ids_np.shape + (table_text.shape[1],), np.float32)
    is_text = ids_np < text_vocab
    is_special = (ids_np >= text_vocab) & (ids_np < sp_off)
    is_speech = ids_np >= sp_off
    llm_emb = np.asarray(params["llm_embedding"], np.float32)
    sp_emb = np.asarray(params["speech_embedding"], np.float32)
    emb[is_text] = table_text[ids_np[is_text]]
    emb[is_special] = llm_emb[ids_np[is_special] - text_vocab]
    emb[is_speech] = sp_emb[ids_np[is_speech] - sp_off]

    hidden = jax_hidden_fn(emb)

    lm_w = np.asarray(qwen3.lm_head_weight(params["backbone"]), np.float32)
    text_logits = hidden @ lm_w.T
    dec_w = np.asarray(params["llm_decoder"]["w"], np.float32)
    dec_b = np.asarray(params["llm_decoder"]["b"], np.float32)
    speech_logits = hidden @ dec_w + dec_b
    V = cfg.unified_vocab_size
    full = np.full(hidden.shape[:2] + (V,), -10000.0, np.float32)
    n_text = min(text_logits.shape[-1], text_vocab)
    full[..., :n_text] = text_logits[..., :n_text]
    n_sp = speech_logits.shape[-1]
    full[..., sp_off:sp_off + n_sp] = speech_logits
    return full


def test_unified_forward_matches_routing_oracle():
    cfg, params = _tiny_cv2()
    rng = np.random.default_rng(1)
    B, T = 2, 9
    # mix of text / special / speech ids
    ids = np.concatenate([
        rng.integers(0, 100, (B, 4)),
        np.full((B, 1), cfg.sos_id),
        rng.integers(cfg.speech_offset, cfg.speech_offset + 20, (B, 3)),
        np.full((B, 1), cfg.eos_unified),
    ], axis=1).astype(np.int32)

    got = np.asarray(cv2.forward(params, jnp.asarray(ids), cfg))

    def hidden_fn(emb):
        return np.asarray(qwen3.forward(
            params["backbone"], None, cfg.backbone,
            inputs_embeds=jnp.asarray(emb), return_hidden=True))

    ref = _torch_oracle_forward(cfg, params, ids, hidden_fn)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_unified_table_zero_pad_rows():
    cfg, params = _tiny_cv2()
    table = np.asarray(cv2.unified_embedding_table(params, cfg))
    assert table.shape == (cfg.unified_vocab_size,
                           cfg.backbone.hidden_size)
    # backbone vocab 100 < text_vocab 104: rows 100..103 are zero
    assert np.abs(table[100:104]).max() == 0
    # last (unmapped) row is zero
    assert np.abs(table[-1]).max() == 0


@pytest.mark.slow
def test_convert_torch_state_and_kd_step():
    """Synthetic torch-named CosyVoice2 checkpoint -> converter -> the KD
    step with the split-embedding teacher_forward runs (online sparse)."""
    from transformers import Qwen2Config as HFQwen2Config, Qwen2ForCausalLM
    backbone = _tiny_qwen2_cfg(vocab=100)
    cfg = cv2.CosyVoice2Config(
        backbone=backbone, text_vocab_size=104, speech_token_size=20,
        unified_vocab_size=104 + 2 + 23 + 1)
    hf_cfg = HFQwen2Config(
        vocab_size=100, hidden_size=backbone.hidden_size,
        intermediate_size=backbone.intermediate_size,
        num_hidden_layers=backbone.num_hidden_layers,
        num_attention_heads=backbone.num_attention_heads,
        num_key_value_heads=backbone.num_key_value_heads,
        head_dim=backbone.head_dim, tie_word_embeddings=True,
        attention_bias=True, max_position_embeddings=256)
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(hf_cfg).to(torch.float32)
    D = backbone.hidden_size
    state = {f"llm.model.{k}": v for k, v in hf.state_dict().items()}
    state["llm_embedding.weight"] = torch.randn(2, D)
    state["speech_embedding.weight"] = torch.randn(cfg.num_decoder_out, D)
    state["llm_decoder.weight"] = torch.randn(cfg.num_decoder_out, D)
    state["llm_decoder.bias"] = torch.randn(cfg.num_decoder_out)

    params = cv2.convert_torch_state(state, cfg)
    ids = np.random.default_rng(0).integers(
        0, cfg.unified_vocab_size - 1, (2, 8)).astype(np.int32)
    logits = cv2.forward(params, jnp.asarray(ids), cfg)
    assert logits.shape == (2, 8, cfg.unified_vocab_size)
    assert np.isfinite(np.asarray(logits)).all()

    # KD step with the cosyvoice2 teacher over the unified vocab
    from speech_distill_tpu.core.config import DistillConfig, LoraConfig, qwen3_tiny
    from speech_distill_tpu.distill import train_step
    from speech_distill_tpu.distill.lora import init_lora
    s_cfg = qwen3_tiny(cfg.unified_vocab_size)
    s_cfg = type(s_cfg)(**{**s_cfg.__dict__, "dtype": "float32",
                           "remat": False})
    s_params = qwen3.init_params(jax.random.PRNGKey(1), s_cfg)
    dcfg = DistillConfig(top_k=8, lora=LoraConfig(r=2, alpha=4,
                                                  init_weights="gaussian"))
    lora, base = init_lora(jax.random.PRNGKey(2), s_params, s_cfg, dcfg.lora)
    opt = train_step.make_optimizer(1e-3, 1, 10)
    step = train_step.make_kd_step(
        s_cfg, dcfg, opt, mode="online_sparse",
        teacher_forward=cv2.make_teacher_forward(cfg), donate=False)
    B, T = 2, 8
    batch = {
        "input_ids": jnp.asarray(ids)[None],
        "attention_mask": jnp.ones((1, B, T), jnp.int32),
        "labels": jnp.asarray(ids.astype(np.int64))[None],
    }
    state0 = train_step.init_state(lora, opt)
    _, metrics = step(state0, base, params, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_prepare_lm_sequences_unistream():
    cfg, _ = _tiny_cv2()
    ids, tgt, lens = cv2.prepare_lm_sequences(
        cfg, [[7, 8]], [[1, 2, 3]], bistream=[False])
    off = cfg.speech_offset
    assert list(ids[0][:lens[0]]) == [cfg.sos_id, 7, 8, cfg.task_id,
                                      off + 1, off + 2, off + 3]
    assert list(tgt[0][:7]) == [cv2.IGNORE_ID] * 3 + [off + 1, off + 2, off + 3,
                                cfg.eos_unified]


def test_prepare_lm_sequences_bistream():
    cfg, _ = _tiny_cv2()
    m_t, m_s = cfg.mix_ratio
    text = list(range(10, 10 + m_t))          # exactly one full chunk
    speech = list(range(m_s + 3))             # full chunk + remainder
    ids, tgt, lens = cv2.prepare_lm_sequences(
        cfg, [text], [speech], bistream=[True])
    off = cfg.speech_offset
    row = list(ids[0][:lens[0]])
    # chunk 0: sos + 5 text + 15 speech; chunk 1: remainder + task + rest
    assert row[0] == cfg.sos_id
    assert row[1:1 + m_t] == text
    assert row[1 + m_t:1 + m_t + m_s] == [off + c for c in speech[:m_s]]
    assert cfg.task_id in row
    t = list(tgt[0])
    assert cfg.fill_unified in t
    assert cfg.eos_unified in t
    # input and target lengths line up
    assert lens[0] == sum(1 for x in t if x != cv2.IGNORE_ID) + \
        sum(1 for x in t[:lens[0]] if x == cv2.IGNORE_ID)


def test_fused_teacher_extract_matches_dense_topk():
    """make_teacher_extract == extract_top_k(forward(...), method='exact')
    over the unified vocab truncated to a student vocab size."""
    from speech_distill_tpu.distill.losses import extract_top_k
    cfg, params = _tiny_cv2()
    rng = np.random.default_rng(4)
    B, T, K = 2, 7, 6
    ids = np.concatenate([
        rng.integers(0, 100, (B, 3)),
        np.full((B, 1), cfg.sos_id),
        rng.integers(cfg.speech_offset, cfg.speech_offset + 20, (B, 3)),
    ], axis=1).astype(np.int32)
    mask = jnp.ones((B, T), jnp.int32)
    svs = cfg.unified_vocab_size  # student vocab covers everything

    dense = cv2.forward(params, jnp.asarray(ids), cfg, attention_mask=mask)
    v_ref, i_ref = extract_top_k(dense, K, student_vocab_size=svs,
                                 method="exact")

    fn = cv2.make_teacher_extract(cfg, K, svs, chunk_size=32)
    v, i = fn(params, jnp.asarray(ids), mask)
    np.testing.assert_array_equal(np.sort(np.asarray(i)),
                                  np.sort(np.asarray(i_ref)))
    np.testing.assert_allclose(np.asarray(v, np.float32),
                               np.asarray(v_ref, np.float32),
                               atol=3e-3, rtol=2e-3)

    # student vocab that cuts into the speech range
    svs2 = cfg.speech_offset + 10
    v_ref2, i_ref2 = extract_top_k(dense, K, student_vocab_size=svs2,
                                   method="exact")
    fn2 = cv2.make_teacher_extract(cfg, K, svs2, chunk_size=32)
    v2, i2 = fn2(params, jnp.asarray(ids), mask)
    np.testing.assert_array_equal(np.sort(np.asarray(i2)),
                                  np.sort(np.asarray(i_ref2)))
    np.testing.assert_allclose(np.asarray(v2, np.float32),
                               np.asarray(v_ref2, np.float32),
                               atol=3e-3, rtol=2e-3)
