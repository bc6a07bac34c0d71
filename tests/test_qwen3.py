"""Qwen3 model parity vs HF transformers (torch CPU oracle) + decode cache."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_distill_tpu.core.config import qwen3_tiny
from speech_distill_tpu.models import qwen3
from speech_distill_tpu.models.hf_loader import from_state_dict, to_state_dict


def _tiny_hf_pair(vocab=512, tie=True, seed=0):
    """Build a tiny torch Qwen3 and the converted JAX params."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config as HFQwen3Config
    from transformers import Qwen3ForCausalLM

    cfg = qwen3_tiny(vocab)
    cfg = type(cfg)(**{**cfg.__dict__, "tie_word_embeddings": tie,
                       "dtype": "float32", "remat": False})
    hf_cfg = HFQwen3Config(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        max_position_embeddings=cfg.max_position_embeddings,
        tie_word_embeddings=tie,
        attention_bias=False,
    )
    torch.manual_seed(seed)
    model = Qwen3ForCausalLM(hf_cfg).eval().to(torch.float32)
    params = from_state_dict(model.state_dict(), cfg, dtype="float32")
    return torch, model, cfg, params


@pytest.mark.parametrize("tie", [True, False])
def test_logits_match_hf(tie):
    torch, model, cfg, params = _tiny_hf_pair(tie=tie)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 17))
    mask = np.ones_like(ids)
    mask[1, 13:] = 0  # right padding

    with torch.no_grad():
        ref = model(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask)).logits.numpy()

    got = np.asarray(qwen3.forward(
        params, jnp.asarray(ids), cfg, attention_mask=jnp.asarray(mask)))

    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], ref[valid], atol=2e-4, rtol=2e-3)


def test_scan_matches_unrolled():
    _, _, cfg, params = _tiny_hf_pair()
    ids = jnp.asarray(np.random.default_rng(1).integers(0, cfg.vocab_size, (2, 9)))
    a = qwen3.forward(params, ids, cfg)
    cfg2 = type(cfg)(**{**cfg.__dict__, "scan_layers": False})
    b = qwen3.forward(params, ids, cfg2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("scan", [True, False])
def test_remat_half_policy_grads_match(scan):
    """remat_policy='half' (both scan and unrolled branches, ADVICE r2)
    gives identical loss and grads to full remat."""
    _, _, cfg, params = _tiny_hf_pair()
    ids = jnp.asarray(
        np.random.default_rng(3).integers(0, cfg.vocab_size, (2, 9)))

    def loss_of(c):
        def f(p):
            lg = qwen3.forward(p, ids, c)
            return jnp.sum(jnp.square(lg.astype(jnp.float32))) * 1e-3
        return jax.value_and_grad(f)(params)

    base = type(cfg)(**{**cfg.__dict__, "scan_layers": scan, "remat": True})
    half = type(base)(**{**base.__dict__, "remat_policy": "half"})
    l0, g0 = loss_of(base)
    l1, g1 = loss_of(half)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5), g0, g1)


@pytest.mark.slow
def test_decode_cache_matches_full_forward():
    _, _, cfg, params = _tiny_hf_pair()
    rng = np.random.default_rng(2)
    B, T = 2, 12
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))

    full = qwen3.forward(params, ids, cfg)

    cache = qwen3.KVCache.create(cfg, B, max_len=T, dtype=jnp.float32)
    # prefill first 8 tokens, then decode one-by-one
    logits, cache = qwen3.forward(params, ids[:, :8], cfg, cache=cache)
    outs = [logits]
    for t in range(8, T):
        step, cache = qwen3.forward(params, ids[:, t:t + 1], cfg, cache=cache)
        outs.append(step)
    stitched = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stitched), np.asarray(full),
                               atol=2e-4, rtol=2e-3)


def test_state_dict_roundtrip():
    _, model, cfg, params = _tiny_hf_pair(tie=False)
    state = to_state_dict(params, cfg)
    params2 = from_state_dict(state, cfg, dtype="float32")
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_init_params_shapes():
    cfg = qwen3_tiny(256)
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    assert params["embed"]["weight"].shape == (256, cfg.hidden_size)
    assert params["layers"]["attn"]["q"].shape == (
        cfg.num_hidden_layers, cfg.hidden_size, cfg.q_dim)
    logits = qwen3.forward(params, jnp.zeros((1, 4), jnp.int32), cfg)
    assert logits.shape == (1, 4, 256)
