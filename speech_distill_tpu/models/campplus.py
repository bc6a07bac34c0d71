"""CAM++ (D-TDNN) speaker-embedding model in JAX — inference path.

Replaces the reference's onnxruntime CAM++ call
(soulxpodcast/utils/dataloader.py:93-102,143-154: kaldi fbank ->
campplus.onnx -> 192-d x-vector for the flow decoder) with a TPU-native
implementation of the published CAM++ architecture (3D-Speaker /
modelscope ``speakerlab.models.campplus.DTDNN.CAMPPlus``: FCM 2-D
residual front-end -> D-TDNN backbone with Context-Aware Masking dense
layers -> stats pooling -> dense embedding).

TPU-first design: the utterance is right-padded to a static frame bucket
and every layer re-masks the tail, so one compiled program serves a whole
bucket of lengths while staying EXACTLY equal to the dynamic-shape torch
computation — zero-masked tail frames reproduce torch's implicit zero
conv padding, and all pooled statistics (global mean, segment pooling,
stats pool) divide by the true frame count.

Weights convert from a torch CAMPPlus ``state_dict`` (the naming scheme
campplus.onnx was exported from); parity is proven against an independent
torch oracle of the published architecture
(tests/oracles/campplus_torch.py, same playbook as the S3 tokenizer).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

Params = Dict[str, Any]

BN_EPS = 1e-5


@dataclasses.dataclass(frozen=True)
class CampPlusConfig:
    feat_dim: int = 80
    embedding_size: int = 192
    growth_rate: int = 32
    bn_size: int = 4                     # bottleneck = bn_size * growth
    init_channels: int = 128
    m_channels: int = 32                 # FCM width
    block_layers: tuple = (12, 24, 16)
    block_kernels: tuple = (3, 3, 3)
    block_dilations: tuple = (1, 2, 2)
    seg_len: int = 100                   # CAM segment pooling window


# ---------------------------------------------------------------------------
# Primitives (eval-mode, channel layouts mirror torch: [B, C, T] / [B,C,F,T])
# ---------------------------------------------------------------------------


def _bn(x: jax.Array, p: Params) -> jax.Array:
    """BatchNorm eval: affine if weight present."""
    inv = jax.lax.rsqrt(p["var"] + BN_EPS)
    shape = [1, -1] + [1] * (x.ndim - 2)
    y = (x - p["mean"].reshape(shape)) * inv.reshape(shape)
    if "weight" in p:
        y = y * p["weight"].reshape(shape) + p["bias"].reshape(shape)
    return y


def _conv2d(x: jax.Array, w: jax.Array, stride=(1, 1), padding=(1, 1)):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _conv1d(x: jax.Array, w: jax.Array, stride=1, padding=0, dilation=1,
            bias: Optional[jax.Array] = None):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"))
    if bias is not None:
        y = y + bias[None, :, None]
    return y


def _tmask(x: jax.Array, n: jax.Array) -> jax.Array:
    """Zero every frame at t >= n (time is the LAST axis). Re-applied after
    each BatchNorm so masked zeros stay zero — this is what makes the
    bucketed computation bit-equal to torch's true-length one (conv zero
    padding is the only thing a conv ever sees past the boundary)."""
    T = x.shape[-1]
    keep = jnp.arange(T)[None, :] < n[:, None]        # [B, T]
    shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (T,)
    return x * keep.reshape(shape).astype(x.dtype)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def _res_block(p: Params, x: jax.Array, n: jax.Array,
               stride: int) -> jax.Array:
    """FCM BasicResBlock: freq-strided 3x3 convs, identity/1x1 shortcut."""
    out = _conv2d(x, p["conv1"], stride=(stride, 1))
    out = _tmask(jax.nn.relu(_bn(out, p["bn1"])), n)
    out = _tmask(_bn(_conv2d(out, p["conv2"]), p["bn2"]), n)
    if "shortcut_conv" in p:
        sc = _conv2d(x, p["shortcut_conv"], stride=(stride, 1),
                     padding=(0, 0))
        sc = _tmask(_bn(sc, p["shortcut_bn"]), n)
    else:
        sc = x
    return _tmask(jax.nn.relu(out + sc), n)


def _fcm(p: Params, x: jax.Array, n: jax.Array) -> jax.Array:
    """[B, F, T] -> [B, C*F//8, T] (freq downsampled 8x)."""
    x = x[:, None]                                   # [B, 1, F, T]
    x = _tmask(jax.nn.relu(_bn(_conv2d(x, p["conv1"]), p["bn1"])), n)
    for i, blk in enumerate(p["layer1"]):
        x = _res_block(blk, x, n, stride=2 if i == 0 else 1)
    for i, blk in enumerate(p["layer2"]):
        x = _res_block(blk, x, n, stride=2 if i == 0 else 1)
    x = _conv2d(x, p["conv2"], stride=(2, 1))
    x = _tmask(jax.nn.relu(_bn(x, p["bn2"])), n)
    B, C, F, T = x.shape
    return x.reshape(B, C * F, T)


def _seg_pool(x: jax.Array, n: jax.Array, seg_len: int) -> jax.Array:
    """avg_pool1d(k=s=seg_len, ceil_mode=True) expanded back to T frames;
    each segment divides by its TRUE in-bounds count (torch semantics).
    Requires T % seg_len == 0 (guaranteed by the input bucket)."""
    B, C, T = x.shape
    S = T // seg_len
    seg_sum = x.reshape(B, C, S, seg_len).sum(-1)
    cnt = jnp.clip(n[:, None] - jnp.arange(S)[None, :] * seg_len,
                   0, seg_len)                        # [B, S]
    seg = seg_sum / jnp.maximum(cnt, 1)[:, None, :]
    return jnp.repeat(seg, seg_len, axis=-1)


def _cam_layer(p: Params, x: jax.Array, n: jax.Array, kernel: int,
               dilation: int, seg_len: int) -> jax.Array:
    """Context-aware mask: local conv gated by sigmoid(MLP(global mean +
    segment-pooled context))."""
    pad = (kernel - 1) // 2 * dilation
    y = _conv1d(x, p["local"], padding=pad, dilation=dilation)
    gmean = x.sum(-1, keepdims=True) / jnp.maximum(n, 1)[:, None, None]
    context = gmean + _seg_pool(x, n, seg_len)
    context = jax.nn.relu(_conv1d(context, p["lin1_w"], bias=p["lin1_b"]))
    m = jax.nn.sigmoid(_conv1d(context, p["lin2_w"], bias=p["lin2_b"]))
    return _tmask(y * m, n)


def _dense_tdnn_layer(p: Params, x: jax.Array, n: jax.Array, kernel: int,
                      dilation: int, seg_len: int) -> jax.Array:
    h = _tmask(jax.nn.relu(_bn(x, p["bn1"])), n)
    h = _conv1d(h, p["linear1"])                     # 1x1 bottleneck
    h = _tmask(jax.nn.relu(_bn(h, p["bn2"])), n)
    return _cam_layer(p["cam"], h, n, kernel, dilation, seg_len)


def forward(params: Params, feats: jax.Array, n_frames: jax.Array,
            cfg: CampPlusConfig = CampPlusConfig()) -> jax.Array:
    """feats [B, T, feat_dim] fbank (mean-normalized by the caller, as the
    reference does at dataloader.py:147), n_frames [B] true lengths;
    T must be a multiple of 2*seg_len (the bucket). Returns [B, emb]."""
    B, T, F = feats.shape
    assert T % (2 * cfg.seg_len) == 0, "bucket T to a multiple of 200"
    n = n_frames.astype(jnp.int32)
    x = _tmask(jnp.transpose(feats, (0, 2, 1)), n)   # [B, F, T]
    x = _fcm(params["head"], x, n)

    # tdnn: conv k5 s2 p2 + BN-ReLU; valid length (n-1)//2 + 1
    x = _conv1d(x, params["tdnn"]["linear"], stride=2, padding=2)
    n = (n - 1) // 2 + 1
    x = _tmask(jax.nn.relu(_bn(x, params["tdnn"]["bn"])), n)

    for bi, block in enumerate(params["blocks"]):
        k = cfg.block_kernels[bi]
        d = cfg.block_dilations[bi]
        for layer in block:
            y = _dense_tdnn_layer(layer, x, n, k, d, cfg.seg_len)
            x = jnp.concatenate([x, y], axis=1)
        tr = params["transits"][bi]
        x = _tmask(jax.nn.relu(_bn(x, tr["bn"])), n)
        x = _conv1d(x, tr["linear"])

    x = _tmask(jax.nn.relu(_bn(x, params["out_bn"])), n)

    # stats pool over the true length (mean + unbiased std)
    cnt = jnp.maximum(n, 1)[:, None].astype(x.dtype)
    mean = x.sum(-1) / cnt
    var = (jnp.square(x).sum(-1) - cnt * jnp.square(mean)) \
        / jnp.maximum(cnt - 1, 1)
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    stats = jnp.concatenate([mean, std], axis=-1)    # [B, 2C]

    emb = stats @ params["dense"]["linear"].T
    dp = params["dense"]["bn"]
    return (emb - dp["mean"]) * jax.lax.rsqrt(dp["var"] + BN_EPS)


# ---------------------------------------------------------------------------
# Weight conversion + init
# ---------------------------------------------------------------------------


def _bn_from(sd, prefix, affine=True):
    p = {"mean": jnp.asarray(sd[f"{prefix}.running_mean"]),
         "var": jnp.asarray(sd[f"{prefix}.running_var"])}
    if affine:
        p["weight"] = jnp.asarray(sd[f"{prefix}.weight"])
        p["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
    return p


def convert_torch_state(sd: Dict[str, Any],
                        cfg: CampPlusConfig = CampPlusConfig()) -> Params:
    """Map a torch CAMPPlus state_dict (3D-Speaker naming — the scheme
    campplus.onnx is exported from) into this pytree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def res(prefix):
        p = {"conv1": jnp.asarray(sd[f"{prefix}.conv1.weight"]),
             "bn1": _bn_from(sd, f"{prefix}.bn1"),
             "conv2": jnp.asarray(sd[f"{prefix}.conv2.weight"]),
             "bn2": _bn_from(sd, f"{prefix}.bn2")}
        if f"{prefix}.shortcut.0.weight" in sd:
            p["shortcut_conv"] = jnp.asarray(sd[f"{prefix}.shortcut.0.weight"])
            p["shortcut_bn"] = _bn_from(sd, f"{prefix}.shortcut.1")
        return p

    head = {
        "conv1": jnp.asarray(sd["head.conv1.weight"]),
        "bn1": _bn_from(sd, "head.bn1"),
        "layer1": [res(f"head.layer1.{i}") for i in range(2)],
        "layer2": [res(f"head.layer2.{i}") for i in range(2)],
        "conv2": jnp.asarray(sd["head.conv2.weight"]),
        "bn2": _bn_from(sd, "head.bn2"),
    }

    def dense_layer(prefix):
        return {
            "bn1": _bn_from(sd, f"{prefix}.nonlinear1.batchnorm"),
            "linear1": jnp.asarray(sd[f"{prefix}.linear1.weight"]),
            "bn2": _bn_from(sd, f"{prefix}.nonlinear2.batchnorm"),
            "cam": {
                "local": jnp.asarray(sd[f"{prefix}.cam_layer.linear_local.weight"]),
                "lin1_w": jnp.asarray(sd[f"{prefix}.cam_layer.linear1.weight"]),
                "lin1_b": jnp.asarray(sd[f"{prefix}.cam_layer.linear1.bias"]),
                "lin2_w": jnp.asarray(sd[f"{prefix}.cam_layer.linear2.weight"]),
                "lin2_b": jnp.asarray(sd[f"{prefix}.cam_layer.linear2.bias"]),
            },
        }

    blocks: List[List[Params]] = []
    transits: List[Params] = []
    for bi, n_layers in enumerate(cfg.block_layers):
        blocks.append([dense_layer(f"xvector.block{bi+1}.tdnnd{li+1}")
                       for li in range(n_layers)])
        transits.append({
            "bn": _bn_from(sd, f"xvector.transit{bi+1}.nonlinear.batchnorm"),
            "linear": jnp.asarray(sd[f"xvector.transit{bi+1}.linear.weight"]),
        })

    return {
        "head": head,
        "tdnn": {"linear": jnp.asarray(sd["xvector.tdnn.linear.weight"]),
                 "bn": _bn_from(sd, "xvector.tdnn.nonlinear.batchnorm")},
        "blocks": blocks,
        "transits": transits,
        "out_bn": _bn_from(sd, "xvector.out_nonlinear.batchnorm"),
        "dense": {
            "linear": jnp.asarray(sd["xvector.dense.linear.weight"])[:, :, 0],
            "bn": _bn_from(sd, "xvector.dense.nonlinear.batchnorm",
                           affine=False),
        },
    }


def make_spk_emb_fn(params: Params,
                    cfg: CampPlusConfig = CampPlusConfig(),
                    bucket: int = 200):
    """Host-callable ``feat [T, feat_dim] -> [emb]`` drop-in for
    ``PodcastDataset(spk_emb_fn=...)`` — the JAX default replacing
    make_onnx_spk_emb_fn. Frames are padded to a multiple of ``bucket``
    (one compile per bucket count)."""
    fwd = jax.jit(lambda p, f, n: forward(p, f, n, cfg))

    def fn(feat: np.ndarray) -> np.ndarray:
        t = feat.shape[0]
        width = -(-t // bucket) * bucket
        padded = np.zeros((1, width, feat.shape[1]), np.float32)
        padded[0, :t] = feat
        emb = fwd(params, jnp.asarray(padded), jnp.asarray([t], np.int32))
        return np.asarray(emb[0])

    return fn
