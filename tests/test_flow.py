"""Flow-matching decoder: block-level torch oracles + end-to-end shape/mask
invariants on tiny configs."""
import dataclasses
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_distill_tpu.models import flow, flow_encoder

torch = pytest.importorskip("torch")


def tiny_cfg():
    enc = flow_encoder.FlowEncoderConfig(
        input_size=16, output_size=16, attention_heads=2, linear_units=32,
        num_blocks=2, num_up_blocks=1, pre_lookahead_len=3)
    return flow.FlowConfig(
        input_size=16, output_size=8, spk_embed_dim=6, vocab_size=50,
        n_timesteps=2, est_in_channels=32, est_channels=24, est_n_blocks=1,
        est_num_mid_blocks=2, est_num_heads=2, est_head_dim=8, encoder=enc)


# -- estimator block oracles ------------------------------------------------


def torch_causal_block(x, conv_w, conv_b, ln_w, ln_b, mask):
    """CausalConv1d k3 -> LayerNorm -> Mish (estimator.py:519-532)."""
    xt = torch.tensor(np.asarray(x * mask)).transpose(1, 2)      # [B,C,T]
    w = torch.tensor(np.asarray(conv_w)).permute(2, 1, 0)        # [out,in,k]
    h = torch.nn.functional.conv1d(
        torch.nn.functional.pad(xt, (2, 0)), w, torch.tensor(np.asarray(conv_b)))
    h = h.transpose(1, 2)
    h = torch.nn.functional.layer_norm(
        h, h.shape[-1:], torch.tensor(np.asarray(ln_w)),
        torch.tensor(np.asarray(ln_b)))
    h = h * torch.tanh(torch.nn.functional.softplus(h))
    return h.numpy() * np.asarray(mask)


def test_causal_block_matches_torch():
    rng = np.random.default_rng(0)
    B, T, C = 2, 10, 8
    x = rng.normal(size=(B, T, C)).astype(np.float32)
    mask = np.ones((B, T, 1), np.float32)
    mask[1, 7:] = 0
    p = {"conv": {"w": jnp.asarray(rng.normal(size=(3, C, C)), jnp.float32),
                  "b": jnp.asarray(rng.normal(size=(C,)), jnp.float32)},
         "ln": {"scale": jnp.ones((C,)), "bias": jnp.zeros((C,))}}
    got = np.asarray(flow._causal_block(p, jnp.asarray(x), jnp.asarray(mask)))
    ref = torch_causal_block(x, p["conv"]["w"], p["conv"]["b"],
                             p["ln"]["scale"], p["ln"]["bias"], mask)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_transformer_block_matches_torch():
    rng = np.random.default_rng(1)
    B, T, C, H, Dh = 1, 6, 16, 2, 8
    inner = H * Dh
    x = rng.normal(size=(B, T, C)).astype(np.float32)
    p = {
        "norm1": {"scale": jnp.asarray(rng.normal(size=C).astype(np.float32)),
                  "bias": jnp.zeros((C,))},
        "norm3": {"scale": jnp.ones((C,)), "bias": jnp.zeros((C,))},
        "attn": {"q": {"w": jnp.asarray(rng.normal(size=(C, inner)), jnp.float32)},
                 "k": {"w": jnp.asarray(rng.normal(size=(C, inner)), jnp.float32)},
                 "v": {"w": jnp.asarray(rng.normal(size=(C, inner)), jnp.float32)},
                 "out": {"w": jnp.asarray(rng.normal(size=(inner, C)), jnp.float32),
                         "b": jnp.zeros((C,))}},
        "ff1": {"w": jnp.asarray(rng.normal(size=(C, 4 * C)), jnp.float32),
                "b": jnp.zeros((4 * C,))},
        "ff2": {"w": jnp.asarray(rng.normal(size=(4 * C, C)), jnp.float32),
                "b": jnp.zeros((C,))},
    }
    got = np.asarray(flow._transformer_block(p, jnp.asarray(x), None, H, Dh))

    # torch oracle (diffusers BasicTransformerBlock semantics)
    xt = torch.tensor(x)
    h = torch.nn.functional.layer_norm(
        xt, (C,), torch.tensor(np.asarray(p["norm1"]["scale"])),
        torch.zeros(C))
    q = (h @ torch.tensor(np.asarray(p["attn"]["q"]["w"]))).reshape(B, T, H, Dh)
    k = (h @ torch.tensor(np.asarray(p["attn"]["k"]["w"]))).reshape(B, T, H, Dh)
    v = (h @ torch.tensor(np.asarray(p["attn"]["v"]["w"]))).reshape(B, T, H, Dh)
    sc = torch.einsum("bthd,bshd->bhts", q, k) * Dh ** -0.5
    a = torch.softmax(sc, -1)
    o = torch.einsum("bhts,bshd->bthd", a, v).reshape(B, T, inner)
    xt = xt + o @ torch.tensor(np.asarray(p["attn"]["out"]["w"]))
    h = torch.nn.functional.layer_norm(xt, (C,), torch.ones(C), torch.zeros(C))
    h = torch.nn.functional.gelu(h @ torch.tensor(np.asarray(p["ff1"]["w"])))
    ref = (xt + h @ torch.tensor(np.asarray(p["ff2"]["w"]))).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_rel_attention_matches_torch_oracle():
    """Espnet rel-pos attention vs direct torch computation with rel_shift
    (upsample_encoder.py:566-671)."""
    rng = np.random.default_rng(2)
    B, T, D, H = 1, 5, 8, 2
    Dh = D // H
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    lp = {k: {"w": jnp.asarray(rng.normal(size=(D, D)), jnp.float32),
              "b": jnp.asarray(rng.normal(size=(D,)), jnp.float32)}
          for k in ["q", "k", "v", "out"]}
    lp["pos"] = {"w": jnp.asarray(rng.normal(size=(D, D)), jnp.float32)}
    lp["pos_bias_u"] = jnp.asarray(rng.normal(size=(H, Dh)), jnp.float32)
    lp["pos_bias_v"] = jnp.asarray(rng.normal(size=(H, Dh)), jnp.float32)
    pos = jnp.asarray(flow_encoder.rel_pos_encoding(T, D))

    got = np.asarray(flow_encoder._rel_attention(lp, jnp.asarray(x), pos,
                                                 None, H))

    def t(a):
        return torch.tensor(np.asarray(a))

    q = (t(x) @ t(lp["q"]["w"]) + t(lp["q"]["b"])).reshape(B, T, H, Dh)
    k = (t(x) @ t(lp["k"]["w"]) + t(lp["k"]["b"])).reshape(B, T, H, Dh)
    v = (t(x) @ t(lp["v"]["w"]) + t(lp["v"]["b"])).reshape(B, T, H, Dh)
    p = (t(pos) @ t(lp["pos"]["w"])).reshape(1, 2 * T - 1, H, Dh).transpose(1, 2)
    q_u = (q + t(lp["pos_bias_u"])).transpose(1, 2)
    q_v = (q + t(lp["pos_bias_v"])).transpose(1, 2)
    ac = q_u @ k.transpose(1, 2).transpose(-2, -1)
    bd = q_v @ p.transpose(-2, -1)
    zero = torch.zeros((B, H, T, 1))
    bdp = torch.cat([zero, bd], dim=-1).view(B, H, 2 * T, T)
    bd = bdp[:, :, 1:].view(B, H, T, 2 * T - 1)[..., :T]
    scores = (ac + bd) / np.sqrt(Dh)
    attn = torch.softmax(scores, -1)
    o = (attn @ v.transpose(1, 2)).transpose(1, 2).reshape(B, T, D)
    ref = (o @ t(lp["out"]["w"]) + t(lp["out"]["b"])).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-4)


# -- end to end -------------------------------------------------------------


@pytest.mark.slow
def test_forward_flow_shapes_and_mask_invariance():
    cfg = tiny_cfg()
    params = flow.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    B, T = 2, 12
    token = rng.integers(0, cfg.vocab_size, (B, T)).astype(np.int32)
    token_len = np.array([12, 8], np.int32)
    prompt = rng.normal(size=(B, 6, cfg.output_size)).astype(np.float32)
    prompt_len = np.array([6, 4], np.int32)
    emb = rng.normal(size=(B, cfg.spk_embed_dim)).astype(np.float32)

    mel, lens = flow.forward_flow(
        params, jnp.asarray(token), jnp.asarray(token_len),
        jnp.asarray(prompt), jnp.asarray(prompt_len), jnp.asarray(emb), cfg,
        rng=jax.random.PRNGKey(7))
    assert mel.shape == (B, T * 2, cfg.output_size)
    np.testing.assert_array_equal(np.asarray(lens), token_len * 2)
    assert np.isfinite(np.asarray(mel)).all()

    # changing tokens beyond token_len must not change row 1's valid mel
    token2 = token.copy()
    token2[1, 8:] = (token2[1, 8:] + 7) % cfg.vocab_size
    mel2, _ = flow.forward_flow(
        params, jnp.asarray(token2), jnp.asarray(token_len),
        jnp.asarray(prompt), jnp.asarray(prompt_len), jnp.asarray(emb), cfg,
        rng=jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(mel2[1, :16]),
                               np.asarray(mel[1, :16]), atol=1e-4)


@pytest.mark.slow
def test_estimator_cfg_guidance_math():
    """solve_euler applies (1+g)*cond - g*uncond each step."""
    cfg = dataclasses.replace(tiny_cfg(), n_timesteps=1,
                              inference_cfg_rate=0.5)
    params = flow.init_params(jax.random.PRNGKey(0), cfg)["estimator"]
    rng = np.random.default_rng(4)
    B, T, C = 1, 6, cfg.output_size
    z = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    mu = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    spks = jnp.asarray(rng.normal(size=(B, C)), jnp.float32)
    cond = jnp.asarray(rng.normal(size=(B, T, C)), jnp.float32)
    mask = jnp.ones((B, T, 1), jnp.float32)

    out = flow.solve_euler(params, z, mu, mask, spks, cond, cfg)

    t_span = 1 - np.cos(np.linspace(0, 1, 2) * 0.5 * np.pi)
    t0 = jnp.full((B,), t_span[0], jnp.float32)
    v_c = flow.estimator_forward(params, z, mask, mu, t0, spks, cond, cfg)
    v_u = flow.estimator_forward(params, z, mask, jnp.zeros_like(mu), t0,
                                 jnp.zeros_like(spks), jnp.zeros_like(cond),
                                 cfg)
    expect = z + (t_span[1] - t_span[0]) * (1.5 * v_c - 0.5 * v_u)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-4)
