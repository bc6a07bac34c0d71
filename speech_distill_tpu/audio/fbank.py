"""Kaldi-compatible fbank features (numpy, host-side).

Replaces ``torchaudio.compliance.kaldi.fbank`` used for the CAM++ speaker
embedding front-end (reference soulxpodcast/utils/dataloader.py:135-140:
num_mel_bins=80, dither=0, sample_frequency=16000, defaults otherwise).

Kaldi defaults implemented: 25 ms povey window / 10 ms shift, snip_edges,
DC removal, preemphasis 0.97, HTK mel scale (low 20 Hz, high = nyquist),
log of power-spectrum mel energies with 1e-10 floor.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

EPSILON = 1.1920928955078125e-07  # torchaudio kaldi epsilon (fp32 eps)


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


@lru_cache(maxsize=4)
def _kaldi_mel_banks(num_bins: int, n_fft: int, sr: int,
                     low_freq: float = 20.0, high_freq: float = 0.0) -> np.ndarray:
    if high_freq <= 0:
        high_freq = sr / 2 + high_freq

    def mel(f):
        return 1127.0 * np.log(1.0 + f / 700.0)

    mel_low = mel(low_freq)
    mel_high = mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)
    fft_freqs = np.arange(n_fft // 2 + 1) * sr / n_fft
    fft_mels = mel(fft_freqs)
    banks = np.zeros((num_bins, n_fft // 2 + 1), np.float32)
    for b in range(num_bins):
        left = mel_low + b * mel_delta
        center = mel_low + (b + 1) * mel_delta
        right = mel_low + (b + 2) * mel_delta
        up = (fft_mels - left) / (center - left)
        down = (right - fft_mels) / (right - center)
        banks[b] = np.maximum(0.0, np.minimum(up, down))
    # kaldi excludes the nyquist bin
    banks[:, -1] = 0.0
    return banks


@lru_cache(maxsize=4)
def _povey_window(n: int) -> np.ndarray:
    return (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / (n - 1))) ** 0.85


def fbank(audio: np.ndarray, num_mel_bins: int = 80, sr: int = 16000,
          frame_length_ms: float = 25.0, frame_shift_ms: float = 10.0,
          dither: float = 0.0, preemphasis: float = 0.97,
          remove_dc_offset: bool = True) -> np.ndarray:
    """[T] float audio -> [n_frames, num_mel_bins] log-mel (kaldi fbank)."""
    audio = np.asarray(audio, np.float32)
    win = int(sr * frame_length_ms / 1000)
    hop = int(sr * frame_shift_ms / 1000)
    n_fft = _next_pow2(win)
    n_frames = 1 + (len(audio) - win) // hop if len(audio) >= win else 0
    if n_frames <= 0:
        return np.zeros((0, num_mel_bins), np.float32)

    idx = np.arange(n_frames)[:, None] * hop + np.arange(win)[None, :]
    frames = audio[idx].astype(np.float32)
    if dither:
        frames = frames + dither * np.random.default_rng(0).normal(
            size=frames.shape).astype(np.float32)
    if remove_dc_offset:
        frames = frames - frames.mean(axis=1, keepdims=True)
    if preemphasis:
        pre = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - preemphasis * pre
    frames = frames * _povey_window(win)
    spec = np.fft.rfft(frames, n=n_fft, axis=1)
    power = np.abs(spec) ** 2
    mel = power @ _kaldi_mel_banks(num_mel_bins, n_fft, sr).T
    return np.log(np.maximum(mel, EPSILON)).astype(np.float32)
