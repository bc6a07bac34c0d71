"""Native C++ audio kernels agree with the numpy reference paths."""
import math
import numpy as np
import pytest

from speech_distill_tpu import native
from speech_distill_tpu.audio import fbank as fbank_mod
from speech_distill_tpu.audio.mel import audio_volume_normalize

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native lib unavailable")


def _numpy_resample(audio, orig, new):
    """Force the numpy path (bypasses the 1-D native dispatch)."""
    from speech_distill_tpu.audio.resample import resample
    return resample(audio[None], orig, new)[0]


@pytest.mark.parametrize("orig,new", [(24000, 16000), (44100, 16000),
                                      (8000, 24000), (22050, 24000)])
def test_native_resample_matches_numpy(orig, new):
    rng = np.random.default_rng(0)
    x = rng.normal(size=4801).astype(np.float32)
    a = native.resample_native(x, orig, new)
    b = _numpy_resample(x, orig, new)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_native_volume_normalize_matches_numpy():
    rng = np.random.default_rng(1)
    for scale in [0.5, 0.05, 2.0]:
        x = (rng.normal(size=8000) * scale).astype(np.float32)
        a = native.volume_normalize_native(x.copy())
        b = audio_volume_normalize(x.copy())
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_native_fbank_frames_match_numpy():
    rng = np.random.default_rng(2)
    x = rng.normal(size=4000).astype(np.float32)
    win, hop = 400, 160
    window = fbank_mod._povey_window(win).astype(np.float32)
    a = native.fbank_frames_native(x, window, hop)

    n_frames = 1 + (len(x) - win) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(win)[None, :]
    frames = x[idx].astype(np.float32)
    frames = frames - frames.mean(axis=1, keepdims=True)
    pre = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
    frames = (frames - 0.97 * pre) * window
    np.testing.assert_allclose(a, frames, atol=1e-5)


def test_native_resample_speedup_sane():
    """Native path produces the same sine preservation as numpy."""
    sr_in, sr_out = 24000, 16000
    t = np.arange(sr_in) / sr_in
    y = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = native.resample_native(y, sr_in, sr_out)
    t2 = np.arange(len(out)) / sr_out
    ref = np.sin(2 * np.pi * 440 * t2).astype(np.float32)
    assert np.abs(out[100:-100] - ref[100:-100]).max() < 0.02
