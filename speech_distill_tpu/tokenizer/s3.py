"""S3 / CosyVoice2 semantic speech tokenizer in JAX.

The reference calls the external torch ``s3tokenizer`` package
(``speech_tokenizer_v2_25hz``: whisper-style log-mel(128) -> audio encoder ->
FSQ -> 6,561-entry codebook at 25 Hz; loaded at utils.py:69 and
soulxpodcast/models/soulxpodcast.py:24-26). This module is the TPU-native
equivalent: the same architecture as functional JAX, a converter for the
torch checkpoint, and a batched jitted ``quantize`` matching
``speech_tokenizer.quantize(mels, mels_lens)`` (utils.py:95).

Architecture (s3tokenizer v2, whisper-encoder lineage):
  conv1 k3 s2 + GELU -> conv2 k3 s2 + GELU   (100 Hz mel frames -> 25 Hz)
  + fixed sinusoidal positions
  N pre-LN transformer blocks (MHA: q/v/out biased, k unbiased; GELU MLP)
  ln_post -> FSQ: Linear(d -> 8), tanh clamp, round to {-1,0,1},
  code = sum_i digit_i * 3^i  (3^8 = 6561 codes)

Integer-exact code parity is validated against an independent torch oracle
of this architecture (tests/test_s3_parity.py: converter round-trip, conv
length arithmetic for every T mod 4, ragged batches, FSQ rounding edges).
Golden vectors from the real torch checkpoint remain the final validation
once the checkpoint is available (no network in this environment).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from speech_distill_tpu.audio.mel import log_mel_spectrogram

Params = Dict[str, Any]


@dataclasses.dataclass
class S3Config:
    n_mels: int = 128
    n_state: int = 1280
    n_head: int = 20
    n_layer: int = 6
    fsq_dim: int = 8
    fsq_level: int = 3
    max_ctx: int = 1500          # positions at 50 Hz (post-conv1)

    @property
    def codebook_size(self) -> int:
        return self.fsq_level ** self.fsq_dim  # 6561


def s3_tiny() -> S3Config:
    return S3Config(n_mels=16, n_state=32, n_head=4, n_layer=2, max_ctx=64)


# ---------------------------------------------------------------------------
# Params
# ---------------------------------------------------------------------------


def init_params(rng: jax.Array, cfg: S3Config) -> Params:
    host = np.random.default_rng(0)

    def nrm(shape, std=0.02):
        return jnp.asarray(host.normal(0, std, shape), jnp.float32)

    D, H = cfg.n_state, cfg.n_head
    block = {
        "ln1": {"scale": jnp.ones((cfg.n_layer, D)), "bias": jnp.zeros((cfg.n_layer, D))},
        "q": {"w": nrm((cfg.n_layer, D, D)), "b": jnp.zeros((cfg.n_layer, D))},
        "k": {"w": nrm((cfg.n_layer, D, D))},
        "v": {"w": nrm((cfg.n_layer, D, D)), "b": jnp.zeros((cfg.n_layer, D))},
        "out": {"w": nrm((cfg.n_layer, D, D)), "b": jnp.zeros((cfg.n_layer, D))},
        "ln2": {"scale": jnp.ones((cfg.n_layer, D)), "bias": jnp.zeros((cfg.n_layer, D))},
        "mlp1": {"w": nrm((cfg.n_layer, D, 4 * D)), "b": jnp.zeros((cfg.n_layer, 4 * D))},
        "mlp2": {"w": nrm((cfg.n_layer, 4 * D, D)), "b": jnp.zeros((cfg.n_layer, D))},
    }
    return {
        "conv1": {"w": nrm((3, cfg.n_mels, D)), "b": jnp.zeros((D,))},
        "conv2": {"w": nrm((3, D, D)), "b": jnp.zeros((D,))},
        "blocks": block,
        "ln_post": {"scale": jnp.ones((D,)), "bias": jnp.zeros((D,))},
        "fsq": {"w": nrm((D, cfg.fsq_dim)), "b": jnp.zeros((cfg.fsq_dim,))},
    }


def param_shapes(cfg: S3Config) -> Dict[str, Any]:
    """(shape, kind) spec mirroring :func:`init_params`'s structure
    (kind: 'w' normal-init, 'one', 'zero')."""
    D, L = cfg.n_state, cfg.n_layer
    block = {
        "ln1": {"scale": ((L, D), "one"), "bias": ((L, D), "zero")},
        "q": {"w": ((L, D, D), "w"), "b": ((L, D), "zero")},
        "k": {"w": ((L, D, D), "w")},
        "v": {"w": ((L, D, D), "w"), "b": ((L, D), "zero")},
        "out": {"w": ((L, D, D), "w"), "b": ((L, D), "zero")},
        "ln2": {"scale": ((L, D), "one"), "bias": ((L, D), "zero")},
        "mlp1": {"w": ((L, D, 4 * D), "w"), "b": ((L, 4 * D), "zero")},
        "mlp2": {"w": ((L, 4 * D, D), "w"), "b": ((L, D), "zero")},
    }
    return {
        "conv1": {"w": ((3, cfg.n_mels, D), "w"), "b": ((D,), "zero")},
        "conv2": {"w": ((3, D, D), "w"), "b": ((D,), "zero")},
        "blocks": block,
        "ln_post": {"scale": ((D,), "one"), "bias": ((D,), "zero")},
        "fsq": {"w": ((D, cfg.fsq_dim), "w"), "b": ((cfg.fsq_dim,), "zero")},
    }


def init_params_on_device(seed: int, cfg: S3Config) -> Params:
    """Random init in ONE jitted program (the ~480MB fp32 encoder would
    otherwise cross the relay host->device; cf. qwen3.init_params_on_device)."""
    def _is_leaf(x):
        return (isinstance(x, tuple) and len(x) == 2
                and isinstance(x[0], tuple) and isinstance(x[1], str))
    shapes = param_shapes(cfg)
    leaves, treedef = jax.tree.flatten(shapes, is_leaf=_is_leaf)

    @jax.jit
    def make(seed):
        key = jax.random.PRNGKey(seed)
        out = []
        for i, (shape, kind) in enumerate(leaves):
            if kind == "one":
                out.append(jnp.ones(shape, jnp.float32))
            elif kind == "zero":
                out.append(jnp.zeros(shape, jnp.float32))
            else:
                k = jax.random.fold_in(key, i)
                out.append(jax.random.normal(k, shape, jnp.float32) * 0.02)
        return jax.tree.unflatten(treedef, out)

    return make(seed)


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoidal position embedding."""
    log_timescale = np.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _layer_norm(x, p):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]).astype(x.dtype)


def _conv1d(x, w, b, stride):
    """x [B, T, Cin], w [K, Cin, Cout], 'same'-ish padding=1 like torch k3 p1."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=((1, 1),),
        dimension_numbers=("NTC", "TIO", "NTC"))
    return out + b


def encode(params: Params, mels: jax.Array, cfg: S3Config,
           mask: Optional[jax.Array] = None) -> jax.Array:
    """mels [B, n_mels, T] -> hidden [B, ceil(ceil(T/2)/2), n_state].

    mask: optional [B, T'] validity mask for attention (padded batches).
    """
    gelu = lambda v: jax.nn.gelu(v, approximate=False)  # torch F.gelu = erf
    x = mels.swapaxes(-1, -2)                       # [B, T, n_mels]
    x = gelu(_conv1d(x, params["conv1"]["w"], params["conv1"]["b"], 2))
    x = gelu(_conv1d(x, params["conv2"]["w"], params["conv2"]["b"], 2))
    T = x.shape[1]
    pos = jnp.asarray(sinusoids(T, cfg.n_state))
    x = x + pos

    if mask is not None:
        bias = jnp.where(mask.astype(bool)[:, None, None, :], 0.0,
                         -jnp.inf).astype(jnp.float32)
        bias = jnp.where(jnp.isneginf(bias), -1e30, bias)
    else:
        bias = None

    H = cfg.n_head
    Dh = cfg.n_state // H

    def block(x, lp):
        h = _layer_norm(x, lp["ln1"])
        q = (h @ lp["q"]["w"] + lp["q"]["b"]).reshape(*h.shape[:2], H, Dh)
        k = (h @ lp["k"]["w"]).reshape(*h.shape[:2], H, Dh)
        v = (h @ lp["v"]["w"] + lp["v"]["b"]).reshape(*h.shape[:2], H, Dh)
        scale = Dh ** -0.25
        logits = jnp.einsum("bthd,bshd->bhts", q * scale, k * scale,
                            preferred_element_type=jnp.float32)
        if bias is not None:
            logits = logits + bias
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(h.shape)
        x = x + o @ lp["out"]["w"] + lp["out"]["b"]
        h = _layer_norm(x, lp["ln2"])
        h = jax.nn.gelu(h @ lp["mlp1"]["w"] + lp["mlp1"]["b"],
                        approximate=False)
        x = x + h @ lp["mlp2"]["w"] + lp["mlp2"]["b"]
        return x, None

    x, _ = jax.lax.scan(block, x, params["blocks"])
    return _layer_norm(x, params["ln_post"])


def fsq_encode(params: Params, hidden: jax.Array, cfg: S3Config) -> jax.Array:
    """hidden [B, T, D] -> int32 codes [B, T] in [0, 3^8)."""
    h = hidden.astype(jnp.float32) @ params["fsq"]["w"] + params["fsq"]["b"]
    # tanh clamp (slightly <1 so round never reaches +-2), round to {-1,0,1}
    h = jnp.tanh(h) * np.float32(0.999)
    digits = jnp.round(h) + (cfg.fsq_level - 1) / 2  # {-1,0,1} -> {0,1,2}
    powers = jnp.asarray(cfg.fsq_level ** np.arange(cfg.fsq_dim), jnp.int32)
    return jnp.sum(digits.astype(jnp.int32) * powers, axis=-1)


def conv_out_len(n):
    """Output length of one k3/s2/p1 conv: ceil(n/2) (floor((n-1)/2)+1)."""
    return (n + 1) // 2


def quantize(params: Params, mels: jax.Array, mels_lens: jax.Array,
             cfg: S3Config, precision: str = "float32"
             ) -> Tuple[jax.Array, jax.Array]:
    """Batched mel [B, n_mels, T], lens [B] -> (codes [B, T'], code_lens [B]).

    Matches the reference call surface (utils.py:95). Output frames follow
    the two stride-2/k3/p1 convs exactly: T' = ceil(ceil(T/2)/2) — NOT T//4,
    which undercounts by one frame whenever T % 4 != 0.

    ``precision``: matmul precision for the encoder. The default
    'float32' keeps full fp32 MXU passes so the FSQ rounding matches the
    fp32 torch reference bit-exactly; JAX's TPU default would run the
    fp32 dots as single-pass bf16, whose ~0.4% noise can flip codes whose
    tanh projection lands near a +-0.5 rounding boundary. 'bfloat16' is
    ~3x faster when occasional single-digit code flips are acceptable.
    """
    T_out = conv_out_len(conv_out_len(mels.shape[-1]))
    code_lens = conv_out_len(conv_out_len(mels_lens)).astype(jnp.int32)
    mask = (jnp.arange(T_out)[None, :] < code_lens[:, None]).astype(jnp.int32)
    if precision not in ("float32", "bfloat16"):
        raise ValueError(f"precision must be 'float32' or 'bfloat16', "
                         f"got {precision!r}")
    with jax.default_matmul_precision(precision):
        hidden = encode(params, mels, cfg, mask)
        codes = fsq_encode(params, hidden, cfg)
    return codes * mask, code_lens


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------


def convert_torch_state(state: Dict[str, Any], cfg: S3Config) -> Params:
    """Map the s3tokenizer torch checkpoint into this pytree.

    torch names (s3tokenizer AudioEncoderV2 + FSQ quantizer):
      encoder.conv{1,2}.{weight,bias}            [out, in, k]
      encoder.blocks.{i}.attn.{query,key,value,out}.{weight,bias}
      encoder.blocks.{i}.attn_ln / mlp_ln .{weight,bias}
      encoder.blocks.{i}.mlp.{0,2}.{weight,bias}
      encoder.ln_post.{weight,bias}
      quantizer.project_down / project_in .{weight,bias}  (-> fsq)
    """
    def np_(t):
        if isinstance(t, np.ndarray):
            return t.astype(np.float32)
        import torch
        return t.detach().to(torch.float32).cpu().numpy()

    def find(*names):
        for n in names:
            if n in state:
                return np_(state[n])
        raise KeyError(f"none of {names} in checkpoint")

    L = cfg.n_layer

    def stack(fmt, transpose=False, optional=False):
        outs = []
        for i in range(L):
            try:
                w = find(fmt.format(i))
            except KeyError:
                if optional:
                    return None
                raise
            outs.append(w.T if transpose else w)
        return jnp.asarray(np.stack(outs))

    conv1 = find("encoder.conv1.weight", "conv1.weight")  # [out, in, k]
    conv2 = find("encoder.conv2.weight", "conv2.weight")
    params: Params = {
        "conv1": {"w": jnp.asarray(conv1.transpose(2, 1, 0)),
                  "b": jnp.asarray(find("encoder.conv1.bias", "conv1.bias"))},
        "conv2": {"w": jnp.asarray(conv2.transpose(2, 1, 0)),
                  "b": jnp.asarray(find("encoder.conv2.bias", "conv2.bias"))},
        "blocks": {
            "ln1": {"scale": stack("encoder.blocks.{}.attn_ln.weight"),
                    "bias": stack("encoder.blocks.{}.attn_ln.bias")},
            "q": {"w": stack("encoder.blocks.{}.attn.query.weight", True),
                  "b": stack("encoder.blocks.{}.attn.query.bias")},
            "k": {"w": stack("encoder.blocks.{}.attn.key.weight", True)},
            "v": {"w": stack("encoder.blocks.{}.attn.value.weight", True),
                  "b": stack("encoder.blocks.{}.attn.value.bias")},
            "out": {"w": stack("encoder.blocks.{}.attn.out.weight", True),
                    "b": stack("encoder.blocks.{}.attn.out.bias")},
            "ln2": {"scale": stack("encoder.blocks.{}.mlp_ln.weight"),
                    "bias": stack("encoder.blocks.{}.mlp_ln.bias")},
            "mlp1": {"w": stack("encoder.blocks.{}.mlp.0.weight", True),
                     "b": stack("encoder.blocks.{}.mlp.0.bias")},
            "mlp2": {"w": stack("encoder.blocks.{}.mlp.2.weight", True),
                     "b": stack("encoder.blocks.{}.mlp.2.bias")},
        },
        "ln_post": {"scale": jnp.asarray(find("encoder.ln_post.weight")),
                    "bias": jnp.asarray(find("encoder.ln_post.bias"))},
        "fsq": {"w": jnp.asarray(find(
                    "quantizer.project_down.weight",
                    "quantizer._codebook.project_down.weight").T),
                "b": jnp.asarray(find(
                    "quantizer.project_down.bias",
                    "quantizer._codebook.project_down.bias"))},
    }
    return params


# ---------------------------------------------------------------------------
# End-to-end: audio -> codes
# ---------------------------------------------------------------------------


class S3Tokenizer:
    """audio (any rate) -> 25 Hz semantic codes; jitted per mel-length bucket."""

    def __init__(self, params: Params, cfg: Optional[S3Config] = None,
                 pad_to_multiple_of: int = 128):
        self.cfg = cfg or S3Config()
        self.params = params
        self.pad_to = pad_to_multiple_of
        self._fn = jax.jit(
            lambda p, m, l: quantize(p, m, l, self.cfg))

    def __call__(self, audio: np.ndarray, sr: int = 16000):
        """One clip -> list[int] codes."""
        from speech_distill_tpu.audio.resample import resample
        if sr != 16000:
            audio = resample(np.asarray(audio, np.float32), sr, 16000)
        mel = np.asarray(log_mel_spectrogram(jnp.asarray(audio, jnp.float32),
                                             self.cfg.n_mels))
        T = mel.shape[-1]
        Tp = -(-T // self.pad_to) * self.pad_to
        mel = np.pad(mel, ((0, 0), (0, Tp - T)))
        codes, lens = self._fn(self.params,
                               jnp.asarray(mel[None]),
                               jnp.asarray([T], jnp.int32))
        return np.asarray(codes)[0, :int(lens[0])].tolist()

    def batch(self, audios, srs=None):
        """Many clips -> list[list[int]] codes in ONE padded quantize call
        (reference ``get_speech_tokens_batch``, utils.py:102-147: pad mels
        to the batch max, batched quantize, split by true lengths). Mels
        are padded to a bucket multiple so repeated batches of similar
        lengths reuse one compiled program."""
        from speech_distill_tpu.audio.resample import resample
        if not audios:
            return []
        mels, lens = [], []
        for i, audio in enumerate(audios):
            sr = 16000 if srs is None else int(srs[i])
            audio = np.asarray(audio, np.float32)
            if sr != 16000:
                audio = resample(audio, sr, 16000)
            mel = np.asarray(log_mel_spectrogram(
                jnp.asarray(audio, jnp.float32), self.cfg.n_mels))
            mels.append(mel)
            lens.append(mel.shape[-1])
        T = max(lens)
        Tp = -(-T // self.pad_to) * self.pad_to
        batch = np.zeros((len(mels), self.cfg.n_mels, Tp), np.float32)
        for i, mel in enumerate(mels):
            batch[i, :, :mel.shape[-1]] = mel
        codes, clens = self._fn(self.params, jnp.asarray(batch),
                                jnp.asarray(lens, jnp.int32))
        codes, clens = np.asarray(codes), np.asarray(clens)
        return [codes[i, :int(clens[i])].tolist() for i in range(len(mels))]


def load_s3_tokenizer(ckpt_path: Optional[str] = None) -> S3Tokenizer:
    """Load from a torch checkpoint path (or $S3_TOKENIZER_CKPT)."""
    ckpt_path = ckpt_path or os.environ.get("S3_TOKENIZER_CKPT")
    if not ckpt_path or not os.path.exists(ckpt_path):
        raise FileNotFoundError(
            "S3 tokenizer checkpoint not found. Set S3_TOKENIZER_CKPT to the "
            "torch 'speech_tokenizer_v2_25hz' checkpoint, or provide a "
            "'codes' column in the dataset to skip audio tokenization.")
    import torch
    state = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "model" in state:
        state = state["model"]
    cfg = config_from_state(state)
    return S3Tokenizer(convert_torch_state(state, cfg), cfg)


def config_from_state(state: Dict[str, Any]) -> S3Config:
    """Infer the architecture from checkpoint shapes (head count follows
    whisper's 64-dim-per-head convention: 1280/64 = 20 for the real v2)."""
    conv1 = state.get("encoder.conv1.weight", state.get("conv1.weight"))
    n_state, n_mels = int(conv1.shape[0]), int(conv1.shape[1])
    n_layer = 1 + max(
        int(k.split(".")[2]) for k in state if k.startswith("encoder.blocks."))
    fsq_w = state.get("quantizer.project_down.weight",
                      state.get("quantizer._codebook.project_down.weight"))
    return S3Config(n_mels=n_mels, n_state=n_state,
                    n_head=max(1, n_state // 64), n_layer=n_layer,
                    fsq_dim=int(fsq_w.shape[0]))


def default_speech_tokens_fn():
    """speech_tokens_fn for processors: lazy singleton over the checkpoint
    (mirrors the reference's per-process lazy global, utils.py:10,66-69)."""
    holder = {}

    def fn(audio_input):
        if "tok" not in holder:
            holder["tok"] = load_s3_tokenizer()
        tok = holder["tok"]
        if isinstance(audio_input, dict):
            return tok(np.asarray(audio_input["array"], np.float32),
                       int(audio_input.get("sampling_rate", 16000)))
        if isinstance(audio_input, str):
            from scipy.io.wavfile import read as wav_read
            sr, data = wav_read(audio_input)
            is_int = np.issubdtype(data.dtype, np.integer)
            data = data.astype(np.float32)
            if is_int:  # 16-bit PCM -> [-1, 1] (s3tokenizer.load_audio)
                data = data / 32768.0
            return tok(data, sr)
        return tok(np.asarray(audio_input, np.float32), 16000)

    return fn
