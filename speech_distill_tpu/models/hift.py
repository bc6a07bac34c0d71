"""HiFT vocoder (mel -> waveform), JAX port of the reference HiFTNet
(soulxpodcast/models/modules/hifigan.py:75-249 + hifigan_components/layers.py):

  ConvRNNF0Predictor (mel -> F0) -> NSF harmonic source (SineGen2 for
  24 kHz) -> conv-transpose upsample stack [8, 5, 3] with per-stage source
  fusion and Snake-activated ResBlocks -> conv_post -> exp/sin ISTFT head
  (n_fft 16, hop 4; total 480x = 24 kHz from 50 Hz mel).

Weight norm folds into plain weights at conversion; inference-only.
Channel-last layout [B, T, C]; STFT/ISTFT via rFFT + overlap-add matching
torch.stft/istft (center=True).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass
class HiFTConfig:
    in_channels: int = 80
    base_channels: int = 512
    nb_harmonics: int = 8
    sampling_rate: int = 24000
    nsf_alpha: float = 0.1
    nsf_sigma: float = 0.003
    nsf_voiced_threshold: float = 10.0
    upsample_rates: Tuple[int, ...] = (8, 5, 3)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 11, 7)
    istft_n_fft: int = 16
    istft_hop: int = 4
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    source_resblock_kernel_sizes: Tuple[int, ...] = (7, 7, 11)
    source_resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    lrelu_slope: float = 0.1
    audio_limit: float = 0.99
    f0_cond_channels: int = 512

    @property
    def upsample_scale(self) -> int:
        return int(np.prod(self.upsample_rates)) * self.istft_hop


# ---------------------------------------------------------------------------
# primitives (channel-last [B, T, C])
# ---------------------------------------------------------------------------


def _conv(x, p, stride=1, padding=0, dilation=1):
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride,),
        padding=((padding, padding),) if isinstance(padding, int) else (padding,),
        rhs_dilation=(dilation,),
        dimension_numbers=("NTC", "TIO", "NTC"))
    return out + p["b"]


def _conv_transpose(x, p, stride, kernel, padding):
    """Matches torch ConvTranspose1d(k, s, p): out = (T-1)*s - 2p + k.
    Kernel layout [k, Cout, Cin] (jax transpose_kernel convention)."""
    out = jax.lax.conv_transpose(
        x, p["w"], strides=(stride,),
        padding=((kernel - 1 - padding, kernel - 1 - padding),),
        dimension_numbers=("NTC", "TIO", "NTC"),
        transpose_kernel=True)
    return out + p["b"]


def _snake(x, alpha):
    """Snake activation x + sin^2(a x)/a (layers.py:37-87, linear scale)."""
    a = alpha[None, None, :]
    return x + (1.0 / (a + 1e-9)) * jnp.square(jnp.sin(x * a))


def _resblock(p, x, kernel: int, dilations: Tuple[int, ...]):
    """HiFiGAN/BigVGAN ResBlock with Snake activations (layers.py:90-145)."""
    for i, d in enumerate(dilations):
        h = _snake(x, p["alpha1"][i])
        h = _conv(h, {"w": p["convs1"]["w"][i], "b": p["convs1"]["b"][i]},
                  padding=(kernel * d - d) // 2, dilation=d)
        h = _snake(h, p["alpha2"][i])
        h = _conv(h, {"w": p["convs2"]["w"][i], "b": p["convs2"]["b"][i]},
                  padding=(kernel - 1) // 2)
        x = x + h
    return x


# ---------------------------------------------------------------------------
# STFT / ISTFT heads (torch.stft/istft parity, center=True)
# ---------------------------------------------------------------------------


def _stft(x: jax.Array, n_fft: int, hop: int, window: jax.Array):
    """x [B, T] -> (real, imag) [B, F, TT]."""
    pad = n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (xp.shape[-1] - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = xp[:, idx] * window
    spec = jnp.fft.rfft(frames, axis=-1)
    return (jnp.real(spec).swapaxes(1, 2), jnp.imag(spec).swapaxes(1, 2))


def _istft(real: jax.Array, imag: jax.Array, n_fft: int, hop: int,
           window: jax.Array) -> jax.Array:
    """(real, imag) [B, F, TT] -> [B, (TT-1)*hop] (torch.istft semantics)."""
    spec = (real + 1j * imag).swapaxes(1, 2)              # [B, TT, F]
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window
    B, TT, _ = frames.shape
    out_len = n_fft + hop * (TT - 1)
    starts = np.arange(TT) * hop
    # overlap-add via scatter
    idx = starts[:, None] + np.arange(n_fft)[None, :]     # [TT, n_fft]
    flat_idx = idx.reshape(-1)
    sig = jnp.zeros((B, out_len))
    sig = sig.at[:, flat_idx].add(frames.reshape(B, -1))
    wsq = jnp.zeros((out_len,))
    wsq = wsq.at[flat_idx].add(
        jnp.broadcast_to(jnp.square(window), (TT, n_fft)).reshape(-1))
    sig = sig / jnp.maximum(wsq, 1e-11)
    pad = n_fft // 2
    return sig[:, pad:out_len - pad]


# ---------------------------------------------------------------------------
# F0 predictor + NSF source
# ---------------------------------------------------------------------------


def f0_predict(p: Params, mel: jax.Array) -> jax.Array:
    """ConvRNNF0Predictor (hifigan.py:36-72). mel [B, T, 80] -> f0 [B, T]."""
    x = mel
    for layer in p["conv"]:
        x = jax.nn.elu(_conv(x, layer, padding=1))
    return jnp.abs(x @ p["cls"]["w"] + p["cls"]["b"])[..., 0]


def _interp_linear(x: jax.Array, out_len: int) -> jax.Array:
    """torch F.interpolate(mode='linear', align_corners=False) on [B, T, C]."""
    T = x.shape[1]
    scale = T / out_len
    pos = (np.arange(out_len) + 0.5) * scale - 0.5
    lo = np.clip(np.floor(pos).astype(np.int64), 0, T - 1)
    hi = np.clip(lo + 1, 0, T - 1)
    w = jnp.asarray((pos - np.floor(pos)).astype(np.float32))
    w = jnp.where(jnp.asarray(pos) < 0, 0.0, w)
    return x[:, lo] * (1 - w)[None, :, None] + x[:, hi] * w[None, :, None]


def nsf_source(p: Params, f0_up: jax.Array, cfg: HiFTConfig,
               rng: jax.Array,
               per_row_rngs: Optional[jax.Array] = None) -> jax.Array:
    """SineGen2 + SourceModuleHnNSF2 (layers.py:270-433).

    f0_up [B, T_audio, 1] (already upsampled x480) -> source s [B, T_audio].

    ``per_row_rngs`` [B] of PRNG keys: draw each row's phase offset and
    noise exactly as a B=1 call with that row's key would — rows of a
    batched multi-session synthesis call then match their single-session
    computation bit-for-bit (infer/tts_serve.py).
    """
    B, T, _ = f0_up.shape
    H = cfg.nb_harmonics + 1

    if per_row_rngs is not None:
        ks = [jax.random.split(per_row_rngs[b]) for b in range(B)]
        rand_ini = jnp.concatenate(
            [jax.random.uniform(k[0], (1, H)) for k in ks], axis=0)
        noise_u = jnp.concatenate(
            [jax.random.normal(k[1], (1, T, H)) for k in ks], axis=0)
    else:
        k_rand, k_noise = jax.random.split(rng)
        rand_ini = jax.random.uniform(k_rand, (B, H))
        noise_u = jax.random.normal(k_noise, (B, T, H))

    fn = f0_up * jnp.arange(1, H + 1, dtype=jnp.float32)[None, None, :]
    rad = (fn / cfg.sampling_rate) % 1.0
    rand_ini = rand_ini.at[:, 0].set(0.0)
    rad = rad.at[:, 0, :].add(rand_ini)

    scale = cfg.upsample_scale
    rad_ds = _interp_linear(rad, T // scale)
    phase = jnp.cumsum(rad_ds, axis=1) * 2 * np.pi
    phase = _interp_linear(phase * scale, T)
    sines = jnp.sin(phase) * cfg.nsf_alpha

    uv = (f0_up > cfg.nsf_voiced_threshold).astype(jnp.float32)
    noise_amp = uv * cfg.nsf_sigma + (1 - uv) * cfg.nsf_alpha / 3
    noise = noise_amp * noise_u
    sine_waves = sines * uv + noise

    merged = jnp.tanh(sine_waves @ p["linear"]["w"] + p["linear"]["b"])
    return merged[..., 0]


# ---------------------------------------------------------------------------
# generator
# ---------------------------------------------------------------------------


def decode(params: Params, mel: jax.Array, source: jax.Array,
           cfg: HiFTConfig) -> jax.Array:
    """mel [B, T, 80] + source [B, T*480] -> waveform [B, T*480]
    (hifigan.py:203-235)."""
    window = jnp.asarray(np.hanning(cfg.istft_n_fft + 1)[:-1].astype(np.float32))
    sr, si_ = _stft(source, cfg.istft_n_fft, cfg.istft_hop, window)
    s_stft = jnp.concatenate([sr, si_], axis=1).swapaxes(1, 2)  # [B, TT, 18]

    x = _conv(mel, params["conv_pre"], padding=3)
    n_up = len(cfg.upsample_rates)
    for i in range(n_up):
        x = jax.nn.leaky_relu(x, cfg.lrelu_slope)
        k, u = cfg.upsample_kernel_sizes[i], cfg.upsample_rates[i]
        x = _conv_transpose(x, params["ups"][i], u, k, (k - u) // 2)
        if i == n_up - 1:
            # reflection pad (1, 0) on time
            x = jnp.concatenate([x[:, 1:2], x], axis=1)

        # per-stage source-branch downsample stride is structural
        # (cumprod of the remaining upsample rates), derived from cfg — a
        # Python int inside the params pytree would become a tracer when
        # params are jit arguments
        stride = int(np.prod(cfg.upsample_rates[i + 1:], dtype=np.int64))
        sd = params["source_downs"][i]
        if stride == 1:
            si = s_stft @ sd["w"][0] + sd["b"]
        else:
            si = _conv(s_stft, sd, stride=stride, padding=stride // 2)
        si = _resblock(params["source_resblocks"][i], si,
                       cfg.source_resblock_kernel_sizes[i],
                       cfg.source_resblock_dilations[i])
        x = x + si

        acc = None
        for j in range(len(cfg.resblock_kernel_sizes)):
            r = _resblock(params["resblocks"][i][j], x,
                          cfg.resblock_kernel_sizes[j],
                          cfg.resblock_dilations[j])
            acc = r if acc is None else acc + r
        x = acc / len(cfg.resblock_kernel_sizes)

    x = jax.nn.leaky_relu(x, 0.01)            # default torch slope here
    x = _conv(x, params["conv_post"], padding=3)
    F = cfg.istft_n_fft // 2 + 1
    magnitude = jnp.clip(jnp.exp(x[..., :F]), max=1e2)
    phase = jnp.sin(x[..., F:])
    real = (magnitude * jnp.cos(phase)).swapaxes(1, 2)
    imag = (magnitude * jnp.sin(phase)).swapaxes(1, 2)
    wav = _istft(real, imag, cfg.istft_n_fft, cfg.istft_hop, window)
    return jnp.clip(wav, -cfg.audio_limit, cfg.audio_limit)


def forward(params: Params, mel: jax.Array, cfg: HiFTConfig,
            rng: Optional[jax.Array] = None,
            cache_source: Optional[jax.Array] = None,
            per_row_rngs: Optional[jax.Array] = None):
    """mel [B, T, 80] -> (wav [B, T*480], source). Matches
    HiFTGenerator.forward (hifigan.py:237-249); pass ``cache_source`` from
    the previous call to avoid glitches in streaming synthesis.
    ``per_row_rngs`` [B] keys make each row's NSF noise bit-match the B=1
    call with that key (batched multi-session synthesis)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    f0 = f0_predict(params["f0_predictor"], mel)          # [B, T]
    # torch.nn.Upsample(scale_factor=480) is nearest-neighbour repeat
    f0_up = jnp.repeat(f0, cfg.upsample_scale, axis=1)[..., None]
    s = nsf_source(params["m_source"], f0_up, cfg, rng,
                   per_row_rngs=per_row_rngs)             # [B, T*480]
    if cache_source is not None and cache_source.shape[-1] > 0:
        n = cache_source.shape[-1]
        s = jnp.concatenate([cache_source, s[:, n:]], axis=1)
    wav = decode(params, mel, s, cfg)
    return wav, s


# ---------------------------------------------------------------------------
# init / conversion
# ---------------------------------------------------------------------------


def init_params(rng: jax.Array, cfg: HiFTConfig) -> Params:
    host = np.random.default_rng(0)

    def conv(k, cin, cout):
        return {"w": jnp.asarray(host.normal(0, 0.01, (k, cin, cout)),
                                 jnp.float32),
                "b": jnp.zeros((cout,))}

    def resblock(ch, k, dil):
        n = len(dil)
        return {
            "convs1": {"w": jnp.asarray(
                host.normal(0, 0.01, (n, k, ch, ch)), jnp.float32),
                "b": jnp.zeros((n, ch))},
            "convs2": {"w": jnp.asarray(
                host.normal(0, 0.01, (n, k, ch, ch)), jnp.float32),
                "b": jnp.zeros((n, ch))},
            "alpha1": jnp.ones((n, ch)),
            "alpha2": jnp.ones((n, ch)),
        }

    C = cfg.base_channels
    nf2 = cfg.istft_n_fft + 2
    ups = []
    for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        # conv-transpose kernels live as [k, Cout, Cin]
        ups.append(conv(k, C // (2 ** (i + 1)), C // (2 ** i)))
        ups[-1]["b"] = jnp.zeros((C // (2 ** (i + 1)),))
    down_rates = [1] + list(cfg.upsample_rates[::-1][:-1])
    cum = np.cumprod(down_rates)[::-1]
    source_downs = []
    source_resblocks = []
    for i, (u, k, d) in enumerate(zip(cum, cfg.source_resblock_kernel_sizes,
                                      cfg.source_resblock_dilations)):
        ch = C // (2 ** (i + 1))
        sd = conv(1 if u == 1 else int(u) * 2, nf2, ch)
        source_downs.append(sd)
        source_resblocks.append(resblock(ch, k, d))
    resblocks = []
    for i in range(len(ups)):
        ch = C // (2 ** (i + 1))
        resblocks.append([resblock(ch, k, d) for k, d in
                          zip(cfg.resblock_kernel_sizes,
                              cfg.resblock_dilations)])
    return {
        "f0_predictor": {
            "conv": [conv(3, cfg.in_channels if i == 0
                          else cfg.f0_cond_channels, cfg.f0_cond_channels)
                     for i in range(5)],
            "cls": {"w": jnp.asarray(host.normal(
                0, 0.01, (cfg.f0_cond_channels, 1)), jnp.float32),
                "b": jnp.zeros((1,))},
        },
        "m_source": {"linear": {
            "w": jnp.asarray(host.normal(
                0, 0.1, (cfg.nb_harmonics + 1, 1)), jnp.float32),
            "b": jnp.zeros((1,))}},
        "conv_pre": conv(7, cfg.in_channels, C),
        "ups": ups,
        "source_downs": source_downs,
        "source_resblocks": source_resblocks,
        "resblocks": resblocks,
        "conv_post": conv(7, C // (2 ** len(ups)), nf2),
    }


def fold_weight_norm(state: Dict[str, Any]) -> Dict[str, Any]:
    """Fold weight_norm (weight_g/weight_v or parametrizations.*) into plain
    'weight' entries. Host-side numpy."""
    def np_(t):
        if isinstance(t, np.ndarray):
            return t.astype(np.float32)
        import torch
        return t.detach().to(torch.float32).cpu().numpy()

    out: Dict[str, np.ndarray] = {}
    handled = set()
    for k in list(state.keys()):
        if k.endswith("weight_g") or k.endswith("parametrizations.weight.original0"):
            base = k.rsplit(".", 1)[0].replace("parametrizations.weight", "") \
                .rstrip(".")
            if k.endswith("weight_g"):
                gk, vk = k, base + ".weight_v"
            else:
                gk = k
                vk = k.replace("original0", "original1")
            g = np_(state[gk])
            v = np_(state[vk])
            norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)),
                                        keepdims=True))
            out[base + ".weight"] = (g * v / np.maximum(norm, 1e-12))
            handled.add(gk)
            handled.add(vk)
    for k, t in state.items():
        if k not in handled and not k.endswith(".original0") \
                and not k.endswith(".original1"):
            out[k] = np_(t)
    return out


def convert_torch_state(state: Dict[str, Any], cfg: HiFTConfig) -> Params:
    """Map the reference hift.pt state dict into this pytree."""
    state = fold_weight_norm(state)

    def conv(name):
        return {"w": jnp.asarray(state[name + ".weight"].transpose(2, 1, 0)),
                "b": jnp.asarray(state[name + ".bias"])}

    def convT(name):
        # torch ConvTranspose1d weight [in, out, k] -> [k, out, in]
        return {"w": jnp.asarray(state[name + ".weight"].transpose(2, 1, 0)),
                "b": jnp.asarray(state[name + ".bias"])}

    def resblock(pref, n):
        return {
            "convs1": {"w": jnp.stack([jnp.asarray(
                state[f"{pref}.convs1.{i}.weight"].transpose(2, 1, 0))
                for i in range(n)]),
                "b": jnp.stack([jnp.asarray(state[f"{pref}.convs1.{i}.bias"])
                                for i in range(n)])},
            "convs2": {"w": jnp.stack([jnp.asarray(
                state[f"{pref}.convs2.{i}.weight"].transpose(2, 1, 0))
                for i in range(n)]),
                "b": jnp.stack([jnp.asarray(state[f"{pref}.convs2.{i}.bias"])
                                for i in range(n)])},
            "alpha1": jnp.stack([jnp.asarray(
                state[f"{pref}.activations1.{i}.alpha"]) for i in range(n)]),
            "alpha2": jnp.stack([jnp.asarray(
                state[f"{pref}.activations2.{i}.alpha"]) for i in range(n)]),
        }

    f0_layers = [
        {"w": jnp.asarray(
            state[f"f0_predictor.condnet.{2 * i}.weight"].transpose(2, 1, 0)),
         "b": jnp.asarray(state[f"f0_predictor.condnet.{2 * i}.bias"])}
        for i in range(5)]

    source_downs = [conv(f"source_downs.{i}")
                    for i in range(len(cfg.upsample_rates))]

    nk = len(cfg.resblock_kernel_sizes)
    return {
        "f0_predictor": {
            "conv": f0_layers,
            "cls": {"w": jnp.asarray(
                state["f0_predictor.classifier.weight"].T),
                "b": jnp.asarray(state["f0_predictor.classifier.bias"])},
        },
        "m_source": {"linear": {
            "w": jnp.asarray(state["m_source.l_linear.weight"].T),
            "b": jnp.asarray(state["m_source.l_linear.bias"])}},
        "conv_pre": conv("conv_pre"),
        "ups": [convT(f"ups.{i}") for i in range(len(cfg.upsample_rates))],
        "source_downs": source_downs,
        "source_resblocks": [
            resblock(f"source_resblocks.{i}",
                     len(cfg.source_resblock_dilations[i]))
            for i in range(len(cfg.upsample_rates))],
        "resblocks": [[resblock(f"resblocks.{i * nk + j}",
                                len(cfg.resblock_dilations[j]))
                       for j in range(nk)]
                      for i in range(len(cfg.upsample_rates))],
        "conv_post": conv("conv_post"),
    }
