"""End-to-end converter parity vs the ACTUAL reference torch modules
(VERDICT #3): import /root/reference's flow / estimator / upsample-encoder /
hifigan classes, instantiate at reference defaults with random weights,
convert their state dicts through our converters, and assert forward parity.

This closes the round-1 debt of converters tested only on synthetic
name-compatible state dicts — here the names, shapes, and *semantics* come
from the reference's own code (diffusers symbols provided by the functional
stub in tests/oracles/diffusers_stub.py; diffusers is not installed).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tests.oracles.diffusers_stub import load_reference_modules  # noqa: E402

from speech_distill_tpu.models import flow as jflow  # noqa: E402
from speech_distill_tpu.models import flow_encoder as jenc  # noqa: E402
from speech_distill_tpu.models import hift as jhift  # noqa: E402

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ref():
    flow, hifigan, estimator, upsample_encoder = load_reference_modules()
    return {"flow": flow, "hifigan": hifigan, "estimator": estimator,
            "upsample": upsample_encoder}


def _np_state(module):
    return {k: v.detach().cpu().numpy() for k, v in
            module.state_dict().items()}


@pytest.fixture(scope="module")
def flow_pair(ref):
    torch.manual_seed(11)
    tmod = ref["flow"].CausalMaskedDiffWithXvec()   # full reference defaults
    tmod.eval()
    cfg = jflow.FlowConfig()
    params = jflow.convert_torch_state(_np_state(tmod), cfg)
    return tmod, params, cfg


def test_estimator_full_parity(flow_pair):
    """CausalConditionalDecoder at reference defaults (estimator.py:779-792):
    12 mid blocks, 4 transformer blocks, 8 heads, 71M params."""
    tmod, params, cfg = flow_pair
    est_t = tmod.decoder.estimator
    rng = np.random.default_rng(0)
    B, T = 2, 32
    x = rng.normal(size=(B, 80, T)).astype(np.float32)
    mu = rng.normal(size=(B, 80, T)).astype(np.float32)
    spks = rng.normal(size=(B, 80)).astype(np.float32)
    cond = rng.normal(size=(B, 80, T)).astype(np.float32)
    t = rng.uniform(size=(B,)).astype(np.float32)
    mask = np.ones((B, 1, T), np.float32)
    mask[1, :, 24:] = 0.0                       # ragged: mask correctness
    with torch.no_grad():
        out_t = est_t(torch.tensor(x), torch.tensor(mask), torch.tensor(mu),
                      torch.tensor(t), torch.tensor(spks), torch.tensor(cond),
                      False).numpy()
    out_j = np.asarray(jflow.estimator_forward(
        params["estimator"], jnp.asarray(x.transpose(0, 2, 1)),
        jnp.asarray(mask.transpose(0, 2, 1)),
        jnp.asarray(mu.transpose(0, 2, 1)), jnp.asarray(t),
        jnp.asarray(spks), jnp.asarray(cond.transpose(0, 2, 1)),
        cfg)).transpose(0, 2, 1)
    scale = np.abs(out_t).mean()
    assert np.abs(out_j - out_t).max() < 5e-3 * max(scale, 1.0), (
        np.abs(out_j - out_t).max(), scale)
    assert np.abs(out_j - out_t).mean() < 5e-4 * max(scale, 1.0)


def test_upsample_encoder_parity(flow_pair):
    """UpsampleConformerEncoder (upsample_encoder.py:840-997): 6+4 conformer
    layers, rel-pos attention, 3-frame lookahead, 2x upsample."""
    tmod, params, cfg = flow_pair
    enc_t = tmod.encoder
    rng = np.random.default_rng(1)
    B, T, D = 2, 20, 512
    x = rng.normal(size=(B, T, D)).astype(np.float32) * 0.1
    lens = np.asarray([T, T - 6], np.int64)
    with torch.no_grad():
        h_t, h_mask = enc_t(torch.tensor(x), torch.tensor(lens),
                            streaming=False)
        h_t = h_t.numpy()
        lens_t = h_mask.sum(dim=-1).squeeze(1).numpy().reshape(-1)
    h_j, lens_j = jenc.forward(params["encoder"], jnp.asarray(x),
                               jnp.asarray(lens), cfg.encoder)
    h_j = np.asarray(h_j)
    np.testing.assert_array_equal(np.asarray(lens_j), lens_t)
    # compare valid region only (reference zeroes nothing beyond mask)
    for b, L in enumerate(lens_t):
        diff = np.abs(h_j[b, :L] - h_t[b, :L])
        assert diff.max() < 2e-3, (b, diff.max())


def test_flow_full_forward_parity(flow_pair, monkeypatch):
    """CausalMaskedDiffWithXvec.forward at fixed noise: token -> mel through
    encoder + 15-step CFG Euler solve (flow.py:156-197)."""
    tmod, params, cfg = flow_pair
    rng = np.random.default_rng(2)
    B, T = 1, 16
    token = rng.integers(0, 6561, (B, T))
    token_len = np.asarray([T], np.int64)
    T2 = T * 2
    prompt_feat = rng.normal(size=(B, T2, 80)).astype(np.float32) * 0.1
    prompt_feat_len = np.asarray([6], np.int64)
    emb = rng.normal(size=(B, 192)).astype(np.float32)
    noise = rng.normal(size=(B, 80, T2)).astype(np.float32)

    monkeypatch.setattr(torch, "randn_like",
                        lambda t_, **kw: torch.tensor(noise))
    with torch.no_grad():
        feat_t, lens_t = tmod.forward(
            torch.tensor(token), torch.tensor(token_len),
            torch.tensor(prompt_feat), torch.tensor(prompt_feat_len),
            torch.tensor(emb), streaming=False, finalize=True)
    feat_t = feat_t.numpy()                      # [B, 80, T2]

    feat_j, lens_j = jflow.forward_flow(
        params, jnp.asarray(token, jnp.int32), jnp.asarray(token_len),
        jnp.asarray(prompt_feat), jnp.asarray(prompt_feat_len),
        jnp.asarray(emb), cfg,
        noise=jnp.asarray(noise.transpose(0, 2, 1)))
    feat_j = np.asarray(feat_j).transpose(0, 2, 1)
    np.testing.assert_array_equal(np.asarray(lens_j).reshape(-1),
                                  lens_t.numpy().reshape(-1))
    scale = np.abs(feat_t).mean()
    # 15 chained estimator evals accumulate fp error; demand tight agreement
    assert np.abs(feat_j - feat_t).max() < 2e-2 * max(scale, 1.0), (
        np.abs(feat_j - feat_t).max(), scale)
    assert np.abs(feat_j - feat_t).mean() < 2e-3 * max(scale, 1.0)


@pytest.fixture(scope="module")
def hift_pair(ref):
    torch.manual_seed(13)
    tmod = ref["hifigan"].HiFTGenerator()        # reference defaults
    tmod.eval()
    cfg = jhift.HiFTConfig()
    params = jhift.convert_torch_state(_np_state(tmod), cfg)
    return tmod, params, cfg


def test_hift_f0_predictor_parity(hift_pair):
    tmod, params, cfg = hift_pair
    rng = np.random.default_rng(3)
    mel = rng.normal(size=(2, 80, 24)).astype(np.float32)
    with torch.no_grad():
        f0_t = tmod.f0_predictor(torch.tensor(mel)).numpy()
    f0_j = np.asarray(jhift.f0_predict(
        params["f0_predictor"], jnp.asarray(mel.transpose(0, 2, 1))))
    np.testing.assert_allclose(f0_j, f0_t, rtol=1e-4, atol=1e-5)


def test_hift_decode_parity(hift_pair):
    """HiFTGenerator.decode incl. the ISTFT head (hifigan.py:203-235) with a
    provided deterministic source (the stochastic sine-gen noise is injected
    upstream; decode itself must match)."""
    tmod, params, cfg = hift_pair
    rng = np.random.default_rng(4)
    B, T = 1, 12
    mel = rng.normal(size=(B, 80, T)).astype(np.float32)
    s = (rng.normal(size=(B, 1, T * 480)) * 0.1).astype(np.float32)
    with torch.no_grad():
        wav_t = tmod.decode(x=torch.tensor(mel),
                            s=torch.tensor(s)).numpy()
    wav_j = np.asarray(jhift.decode(
        params, jnp.asarray(mel.transpose(0, 2, 1)),
        jnp.asarray(s[:, 0]), cfg))
    assert wav_j.shape == wav_t.shape
    scale = np.abs(wav_t).mean()
    assert np.abs(wav_j - wav_t).max() < 1e-3 * max(scale, 1e-2), (
        np.abs(wav_j - wav_t).max(), scale)


def test_hift_full_forward_statistics(hift_pair):
    """Full forward (stochastic source): waveform envelopes must agree
    closely in RMS even with independent sine-phase/noise draws."""
    tmod, params, cfg = hift_pair
    rng = np.random.default_rng(5)
    mel = rng.normal(size=(1, 80, 16)).astype(np.float32)
    with torch.no_grad():
        wav_t, s_t = tmod.forward(torch.tensor(mel))
    wav_j, s_j = jhift.forward(params, jnp.asarray(mel.transpose(0, 2, 1)),
                               cfg, rng=jax.random.PRNGKey(0))
    assert np.asarray(wav_j).shape == wav_t.numpy().shape
    rms_t = float(np.sqrt((wav_t.numpy() ** 2).mean()))
    rms_j = float(np.sqrt((np.asarray(wav_j) ** 2).mean()))
    assert abs(rms_j - rms_t) / max(rms_t, 1e-6) < 0.2, (rms_j, rms_t)
