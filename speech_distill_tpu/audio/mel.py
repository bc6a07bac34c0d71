"""Mel-spectrogram front-ends, pure JAX/numpy (no librosa/torchaudio).

Two parameterisations used by the stack:

  * 16 kHz / 128-mel whisper-style log-mel feeding the S3 semantic tokenizer
    (reference calls ``s3tokenizer.log_mel_spectrogram``, utils.py:88):
    n_fft 400, hop 160, hann, center reflect-pad, log10 with max-8dB floor,
    (x+4)/4 scaling.
  * 24 kHz / 80-mel HiFiGAN-style log-mel feeding the flow decoder
    (soulxpodcast/utils/audio.py:44-77): n_fft 1920, hop 480, fmax 8000,
    center=False with manual (n_fft-hop)/2 reflect pad, ln(clamp(x,1e-5)).

The mel filterbank is the Slaney-scale bank librosa produces by default,
re-derived here in numpy (librosa.filters.mel(htk=False, norm='slaney')).
The STFT is framing + rFFT, jit-friendly with static shapes.
"""
from __future__ import annotations

from functools import lru_cache
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    """Slaney mel: linear below 1 kHz, log above."""
    f = np.asarray(f, np.float64)
    f_sp = 200.0 / 3
    mel = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    above = f >= min_log_hz
    mel = np.where(above, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    above = m >= min_log_mel
    freqs = np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


@lru_cache(maxsize=8)
def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0,
                   fmax: Optional[float] = None) -> np.ndarray:
    """[n_mels, n_fft//2+1] Slaney-normalised triangular filters
    (== librosa.filters.mel defaults)."""
    fmax = fmax if fmax is not None else sr / 2
    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel_slaney(np.array(fmin)),
                          _hz_to_mel_slaney(np.array(fmax)), n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney normalisation: constant energy per channel
    enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def _frame(x: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """[..., T] -> [..., n_frames, frame_length] (static shapes)."""
    n_frames = 1 + (x.shape[-1] - frame_length) // hop
    idx = (np.arange(n_frames)[:, None] * hop
           + np.arange(frame_length)[None, :])
    return x[..., idx]


def stft_mag(x: jax.Array, n_fft: int, hop: int, win_length: int,
             window: jax.Array, center: bool = True,
             pad_mode: str = "reflect") -> jax.Array:
    """Magnitude STFT |X| [..., n_freq, n_frames] (matches torch.stft)."""
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode=pad_mode)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    frames = _frame(x, n_fft, hop) * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.abs(spec).swapaxes(-1, -2)


# ---------------------------------------------------------------------------
# Whisper-style 16 kHz / 128-mel (S3 tokenizer input)
# ---------------------------------------------------------------------------

S3_SR = 16000
S3_N_FFT = 400
S3_HOP = 160
S3_N_MELS = 128


def log_mel_spectrogram(audio: jax.Array, n_mels: int = S3_N_MELS,
                        padding: int = 0) -> jax.Array:
    """Whisper-style log-mel: [T] or [B, T] -> [..., n_mels, n_frames].

    Bit-matches whisper/s3tokenizer's ``log_mel_spectrogram``: hann window,
    center reflect pad, drop the last frame, log10 clamp 1e-10, per-clip
    dynamic-range floor at max-8, then (x+4)/4.
    """
    if padding > 0:
        audio = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, padding)])
    window = jnp.hanning(S3_N_FFT + 1)[:-1].astype(jnp.float32)
    mag = stft_mag(audio.astype(jnp.float32), S3_N_FFT, S3_HOP, S3_N_FFT,
                   window, center=True)
    power = (mag ** 2)[..., :-1]          # whisper drops the final frame
    mel_fb = jnp.asarray(mel_filterbank(S3_SR, S3_N_FFT, n_mels))
    mel = jnp.einsum("mf,...ft->...mt", mel_fb, power)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    floor = jnp.max(log_spec, axis=(-2, -1), keepdims=True) - 8.0
    log_spec = jnp.maximum(log_spec, floor)
    return (log_spec + 4.0) / 4.0


# ---------------------------------------------------------------------------
# HiFiGAN-style 24 kHz / 80-mel (flow decoder target / prompt features)
# ---------------------------------------------------------------------------


def mel_spectrogram(y: jax.Array, n_fft: int = 1920, num_mels: int = 80,
                    sampling_rate: int = 24000, hop_size: int = 480,
                    win_size: int = 1920, fmin: float = 0,
                    fmax: float = 8000) -> jax.Array:
    """[B, T] -> [B, num_mels, n_frames]; matches reference
    soulxpodcast/utils/audio.py:44-77 (center=False + manual reflect pad,
    sqrt(|X|^2 + 1e-9), ln(clamp(mel, 1e-5)))."""
    pad = (n_fft - hop_size) // 2
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    window = jnp.hanning(win_size + 1)[:-1].astype(jnp.float32)
    mag = stft_mag(y.astype(jnp.float32), n_fft, hop_size, win_size, window,
                   center=False)
    spec = jnp.sqrt(mag ** 2 + 1e-9)
    mel_fb = jnp.asarray(mel_filterbank(sampling_rate, n_fft, num_mels,
                                        fmin, fmax))
    mel = jnp.einsum("mf,...ft->...mt", mel_fb, spec)
    return jnp.log(jnp.maximum(mel, 1e-5))


def audio_volume_normalize(audio: np.ndarray, coeff: float = 0.1) -> np.ndarray:
    """Percentile volume normalisation (audio.py:80-123). Host-side numpy."""
    audio = np.asarray(audio, np.float32)
    temp = np.sort(np.abs(audio))
    if temp.size == 0:
        return audio
    if temp[-1] < 0.1:
        scaling = max(float(temp[-1]), 1e-3)
        audio = audio / scaling * 0.1
    # NB: the reference filters the PRE-rescale magnitudes here; kept as-is
    temp = temp[temp > 0.01]
    L = temp.shape[0]
    if L <= 10:
        return audio
    volume = np.mean(temp[int(0.9 * L):int(0.99 * L)])
    audio = audio * np.clip(coeff / volume, 0.1, 10)
    max_value = np.max(np.abs(audio))
    if max_value > 1:
        audio = audio / max_value
    return audio
