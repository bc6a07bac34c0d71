"""Audio resampling: windowed-sinc polyphase, numpy host-side + JAX variant.

Replaces torchaudio.transforms.Resample (reference utils.py:42-45). The
kernel construction matches torchaudio's ``_get_sinc_resample_kernel``
(sinc_interp_hann, lowpass_filter_width=6) so resampled waveforms — and
therefore downstream semantic tokens — agree with the reference pipeline to
float precision.
"""
from __future__ import annotations

import math
from functools import lru_cache
from typing import Tuple, Union

import numpy as np


@lru_cache(maxsize=16)
def _kernel(orig_freq: int, new_freq: int, lowpass_filter_width: int = 6,
            rolloff: float = 0.99) -> Tuple[np.ndarray, int]:
    """Polyphase kernels [new_freq', 1, width] and the kernel width, for
    gcd-reduced frequencies. Mirrors torchaudio's hann-windowed sinc."""
    gcd = math.gcd(orig_freq, new_freq)
    orig = orig_freq // gcd
    new = new_freq // gcd
    base_freq = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base_freq)
    idx = np.arange(-width, width + orig, dtype=np.float64)[None] / orig
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx
    t = t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    scale = base_freq / orig
    kernels = np.where(t == 0, np.float64(1.0),
                       np.sin(t * np.pi) / (t * np.pi + 1e-20))
    kernels = kernels * window * scale
    return kernels.astype(np.float32), width


def resample(audio: np.ndarray, orig_freq: int, new_freq: int) -> np.ndarray:
    """Resample [..., T] float audio (host-side; native C++ fast path for
    1-D inputs, numpy otherwise — identical filter taps)."""
    if orig_freq == new_freq:
        return np.asarray(audio, np.float32)
    audio = np.asarray(audio, np.float32)
    if audio.ndim == 1:
        from speech_distill_tpu.native import resample_native
        out = resample_native(audio, orig_freq, new_freq)
        if out is not None:
            return out
    gcd = math.gcd(orig_freq, new_freq)
    orig = orig_freq // gcd
    new = new_freq // gcd
    kernels, width = _kernel(orig_freq, new_freq)

    shape = audio.shape
    x = audio.reshape(-1, shape[-1])
    length = x.shape[-1]
    x = np.pad(x, [(0, 0), (width, width + orig)])
    # strided conv with stride=orig, kernels [new, K]
    K = kernels.shape[1]
    n_out_frames = (x.shape[-1] - K) // orig + 1
    idx = np.arange(n_out_frames)[:, None] * orig + np.arange(K)[None, :]
    frames = x[:, idx]                            # [B, F, K]
    out = np.einsum("bfk,nk->bnf", frames, kernels)  # [B, new, F]
    out = out.transpose(0, 2, 1).reshape(x.shape[0], -1)
    target_len = int(math.ceil(new_freq * length / orig_freq))
    out = out[:, :target_len]
    return out.reshape(shape[:-1] + (target_len,))
