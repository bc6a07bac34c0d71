"""HiFT vocoder: ISTFT/conv-transpose parity vs torch + full forward."""
import dataclasses
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_distill_tpu.models import hift

torch = pytest.importorskip("torch")


def test_istft_matches_torch():
    n_fft, hop = 16, 4
    rng = np.random.default_rng(0)
    B, F, TT = 2, n_fft // 2 + 1, 30
    real = rng.normal(size=(B, F, TT)).astype(np.float32)
    imag = rng.normal(size=(B, F, TT)).astype(np.float32)
    imag[:, 0] = 0
    imag[:, -1] = 0
    window = np.hanning(n_fft + 1)[:-1].astype(np.float32)

    got = np.asarray(hift._istft(jnp.asarray(real), jnp.asarray(imag),
                                 n_fft, hop, jnp.asarray(window)))
    ref = torch.istft(torch.complex(torch.tensor(real), torch.tensor(imag)),
                      n_fft, hop, n_fft, window=torch.tensor(window)).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-4)


@pytest.mark.slow
def test_stft_istft_roundtrip():
    n_fft, hop = 16, 4
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 480)).astype(np.float32)
    window = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))
    r, i = hift._stft(jnp.asarray(x), n_fft, hop, window)
    y = hift._istft(r, i, n_fft, hop, window)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)


@pytest.mark.parametrize("k,s,p", [(16, 8, 4), (11, 5, 3), (7, 3, 2)])
def test_conv_transpose_matches_torch(k, s, p):
    rng = np.random.default_rng(2)
    B, T, Cin, Cout = 2, 12, 6, 4
    x = rng.normal(size=(B, T, Cin)).astype(np.float32)
    w = rng.normal(size=(k, Cout, Cin)).astype(np.float32)
    b = rng.normal(size=(Cout,)).astype(np.float32)
    got = np.asarray(hift._conv_transpose(
        jnp.asarray(x), {"w": jnp.asarray(w), "b": jnp.asarray(b)}, s, k, p))
    # torch ConvTranspose1d weight layout [in, out, k]
    wt = torch.tensor(w.transpose(2, 1, 0))
    ref = torch.nn.functional.conv_transpose1d(
        torch.tensor(x.transpose(0, 2, 1)), wt, torch.tensor(b),
        stride=s, padding=p).numpy().transpose(0, 2, 1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_resblock_matches_torch():
    rng = np.random.default_rng(3)
    B, T, C, k = 1, 20, 8, 3
    dil = (1, 3, 5)
    x = rng.normal(size=(B, T, C)).astype(np.float32)
    p = {
        "convs1": {"w": jnp.asarray(rng.normal(0, 0.1, (3, k, C, C)), jnp.float32),
                   "b": jnp.asarray(rng.normal(size=(3, C)), jnp.float32)},
        "convs2": {"w": jnp.asarray(rng.normal(0, 0.1, (3, k, C, C)), jnp.float32),
                   "b": jnp.asarray(rng.normal(size=(3, C)), jnp.float32)},
        "alpha1": jnp.asarray(rng.uniform(0.5, 2, (3, C)), jnp.float32),
        "alpha2": jnp.asarray(rng.uniform(0.5, 2, (3, C)), jnp.float32),
    }
    got = np.asarray(hift._resblock(p, jnp.asarray(x), k, dil))

    xt = torch.tensor(x.transpose(0, 2, 1))
    for i, d in enumerate(dil):
        a1 = torch.tensor(np.asarray(p["alpha1"][i]))[None, :, None]
        h = xt + (1.0 / (a1 + 1e-9)) * torch.sin(xt * a1) ** 2
        w1 = torch.tensor(np.asarray(p["convs1"]["w"][i]).transpose(2, 1, 0))
        h = torch.nn.functional.conv1d(
            h, w1, torch.tensor(np.asarray(p["convs1"]["b"][i])),
            dilation=d, padding=(k * d - d) // 2)
        a2 = torch.tensor(np.asarray(p["alpha2"][i]))[None, :, None]
        h = h + (1.0 / (a2 + 1e-9)) * torch.sin(h * a2) ** 2
        w2 = torch.tensor(np.asarray(p["convs2"]["w"][i]).transpose(2, 1, 0))
        h = torch.nn.functional.conv1d(
            h, w2, torch.tensor(np.asarray(p["convs2"]["b"][i])),
            padding=(k - 1) // 2)
        xt = xt + h
    ref = xt.numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def _tiny_cfg():
    return hift.HiFTConfig(
        in_channels=8, base_channels=32, nb_harmonics=2,
        upsample_rates=(8, 5, 3), upsample_kernel_sizes=(16, 11, 7),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 2),),
        source_resblock_kernel_sizes=(3, 3, 3),
        source_resblock_dilations=((1,), (1,), (1,)),
        f0_cond_channels=16)


@pytest.mark.slow
def test_hift_forward_shapes():
    cfg = _tiny_cfg()
    params = hift.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(4)
    mel = jnp.asarray(rng.normal(size=(2, 10, cfg.in_channels)), jnp.float32)
    wav, source = hift.forward(params, mel, cfg, rng=jax.random.PRNGKey(1))
    assert wav.shape == (2, 10 * cfg.upsample_scale)
    assert source.shape == (2, 10 * cfg.upsample_scale)
    assert np.isfinite(np.asarray(wav)).all()
    assert np.abs(np.asarray(wav)).max() <= cfg.audio_limit + 1e-6


def test_interp_linear_matches_torch():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 12, 3)).astype(np.float32)
    for out_len in [4, 6, 24, 36]:
        got = np.asarray(hift._interp_linear(jnp.asarray(x), out_len))
        ref = torch.nn.functional.interpolate(
            torch.tensor(x.transpose(0, 2, 1)), size=out_len,
            mode="linear").numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(got, ref, atol=1e-5)
