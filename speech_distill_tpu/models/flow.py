"""Flow-matching mel decoder: causal 1-D UNet estimator + CFM Euler solver.

JAX port of the reference token->mel stack:
  * ``CausalConditionalDecoder`` (estimator.py:760-974): packed input
    [x, mu, spks, cond] (320ch) -> causal resnet + 4 transformer blocks ->
    12 mid blocks -> skip-concat up block -> final causal block/proj(80)
  * ``CausalConditionalCFM`` (flow.py:22-125): 15 Euler steps on a cosine
    t-schedule with classifier-free guidance rate 0.7 (double-batch trick)
  * ``CausalMaskedDiffWithXvec`` (flow.py:128-197): token embedding (6561
    -> 512), xvector affine -> 80, upsampling conformer encoder, proj -> 80

TPU-first: the 12 identical mid blocks are stacked and scanned; the Euler
solve is a ``lax.scan`` over precomputed (t, dt); everything is one jitted
program with static shapes.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from speech_distill_tpu.models import flow_encoder

Params = Dict[str, Any]


@dataclasses.dataclass
class FlowConfig:
    input_size: int = 512
    output_size: int = 80
    spk_embed_dim: int = 192
    vocab_size: int = 6561
    token_mel_ratio: int = 2
    pre_lookahead_len: int = 3
    n_timesteps: int = 15
    inference_cfg_rate: float = 0.7
    t_scheduler: str = "cosine"
    # estimator (estimator.py:779-792)
    est_in_channels: int = 320
    est_channels: int = 256
    est_n_blocks: int = 4
    est_num_mid_blocks: int = 12
    est_num_heads: int = 8
    est_head_dim: int = 64
    static_chunk_size: int = 50
    encoder: flow_encoder.FlowEncoderConfig = dataclasses.field(
        default_factory=flow_encoder.FlowEncoderConfig)


# ---------------------------------------------------------------------------
# estimator building blocks (channel-last [B, T, C] layout throughout)
# ---------------------------------------------------------------------------


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _ln(x, p):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * p["scale"]
            + p["bias"]).astype(x.dtype)


def _causal_conv(x, p, k):
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1,), padding=((k - 1, 0),),
        dimension_numbers=("NTC", "TIO", "NTC"))
    return out + p["b"]


def _causal_block(p, x, mask):
    """CausalBlock1D (estimator.py:519-532): conv k3 -> LN -> Mish, masked."""
    h = _causal_conv(x * mask, p["conv"], 3)
    return _mish(_ln(h, p["ln"])) * mask


def _causal_resnet(p, x, mask, t_emb):
    """CausalResnetBlock1D (estimator.py:363-378,535-539)."""
    h = _causal_block(p["block1"], x, mask)
    h = h + (_mish(t_emb) @ p["mlp"]["w"] + p["mlp"]["b"])[:, None, :]
    h = _causal_block(p["block2"], h, mask)
    res = (x * mask) @ p["res"]["w"][0] + p["res"]["b"]   # 1x1 conv
    return h + res


def _attention_block(p, x, mask_bias, heads, head_dim):
    """diffusers Attention (estimator.py:208-216): q/k/v no bias, inner dim
    = heads*head_dim, out proj with bias."""
    B, T, C = x.shape
    inner = heads * head_dim
    q = (x @ p["q"]["w"]).reshape(B, T, heads, head_dim)
    k = (x @ p["k"]["w"]).reshape(B, T, heads, head_dim)
    v = (x @ p["v"]["w"]).reshape(B, T, heads, head_dim)
    scores = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32) * head_dim ** -0.5
    if mask_bias is not None:
        scores = scores + mask_bias
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, inner)
    return out @ p["out"]["w"] + p["out"]["b"]


def _transformer_block(p, x, mask_bias, heads, head_dim):
    """BasicTransformerBlock (estimator.py:149-328) with plain LayerNorms,
    no cross-attn, GELU FF (Linear -> gelu -> Linear)."""
    h = _ln(x, p["norm1"])
    x = x + _attention_block(p["attn"], h, mask_bias, heads, head_dim)
    h = _ln(x, p["norm3"])
    h = jax.nn.gelu(h @ p["ff1"]["w"] + p["ff1"]["b"], approximate=False)
    return x + h @ p["ff2"]["w"] + p["ff2"]["b"]


def _time_embedding(p, t, in_channels):
    """SinusoidalPosEmb(scale=1000) + TimestepEmbedding MLP
    (estimator.py:331-435). t [B] -> [B, time_embed_dim]."""
    half = in_channels // 2
    freq = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                   * -(np.log(10000.0) / (half - 1)))
    emb = 1000.0 * t[:, None] * freq[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    h = jax.nn.silu(emb @ p["lin1"]["w"] + p["lin1"]["b"])
    return h @ p["lin2"]["w"] + p["lin2"]["b"]


def _stack_scan(block_params, fn, x):
    def body(h, lp):
        return fn(lp, h), None
    out, _ = jax.lax.scan(body, x, block_params)
    return out


def estimator_forward(params: Params, x: jax.Array, mask: jax.Array,
                      mu: jax.Array, t: jax.Array, spks: jax.Array,
                      cond: jax.Array, cfg: FlowConfig,
                      streaming: bool = False) -> jax.Array:
    """x/mu/cond [B, T, 80], spks [B, 80], t [B] -> velocity [B, T, 80].

    Channel-last port of CausalConditionalDecoder.forward
    (estimator.py:885-974); with channels=[256] the down/up "samplers" are
    causal convs (no temporal down/up), so one shared attention bias serves
    all stages.
    """
    B, T, _ = x.shape
    heads, hd = cfg.est_num_heads, cfg.est_head_dim
    t_emb = _time_embedding(params["time_mlp"], t, cfg.est_in_channels)

    spks_t = jnp.broadcast_to(spks[:, None, :], (B, T, spks.shape[-1]))
    h = jnp.concatenate([x, mu, spks_t, cond], axis=-1)   # [B, T, 320]
    m = mask[..., None] if mask.ndim == 2 else mask       # [B, T, 1]

    valid = m[..., 0].astype(bool)                        # [B, T]
    keep = valid[:, None, None, :]
    if streaming:
        pos = jnp.arange(T)
        block = (pos // cfg.static_chunk_size + 1) * cfg.static_chunk_size
        keep = jnp.logical_and(keep, (pos[None, :] < block[:, None])[None, None])
    bias = jnp.where(keep, 0.0, -1e10).astype(jnp.float32)

    def tf_stack(p, h):
        return _stack_scan(p, lambda lp, hh: _transformer_block(
            lp, hh, bias, heads, hd), h)

    # down block (is_last: "downsample" = causal conv k3, no striding)
    h = _causal_resnet(params["down"]["resnet"], h, m, t_emb)
    h = tf_stack(params["down"]["blocks"], h)
    skip = h
    h = _causal_conv(h * m, params["down"]["conv"], 3)

    # 12 mid blocks, stacked+scanned
    def mid(hh, lp):
        hh = _causal_resnet(lp["resnet"], hh, m, t_emb)
        hh = tf_stack(lp["blocks"], hh)
        return hh, None
    h, _ = jax.lax.scan(mid, h, params["mid"])

    # up block: skip concat (channel), resnet, blocks, causal conv
    h = jnp.concatenate([h, skip], axis=-1)
    h = _causal_resnet(params["up"]["resnet"], h, m, t_emb)
    h = tf_stack(params["up"]["blocks"], h)
    h = _causal_conv(h * m, params["up"]["conv"], 3)

    h = _causal_block(params["final_block"], h, m)
    out = (h * m) @ params["final_proj"]["w"][0] + params["final_proj"]["b"]
    return out * m


# ---------------------------------------------------------------------------
# CFM solver
# ---------------------------------------------------------------------------


def solve_euler(params: Params, z: jax.Array, mu: jax.Array, mask: jax.Array,
                spks: jax.Array, cond: jax.Array, cfg: FlowConfig,
                streaming: bool = False) -> jax.Array:
    """Fixed Euler ODE solve with CFG double batch (flow.py:66-125)."""
    n = cfg.n_timesteps
    t_span = np.linspace(0, 1, n + 1, dtype=np.float32)
    if cfg.t_scheduler == "cosine":
        t_span = 1 - np.cos(t_span * 0.5 * np.pi)
    ts = jnp.asarray(t_span[:-1])
    dts = jnp.asarray(np.diff(t_span))
    B = z.shape[0]
    g = cfg.inference_cfg_rate

    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
    mask2 = jnp.concatenate([mask, mask], axis=0)

    def step(x, t_dt):
        t, dt = t_dt
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.full((2 * B,), t, x.dtype)
        v = estimator_forward(params, x2, mask2, mu2, t2, spks2, cond2,
                              cfg, streaming)
        v_cond, v_uncond = v[:B], v[B:]
        dphi = (1.0 + g) * v_cond - g * v_uncond
        return x + dt * dphi, None

    x, _ = jax.lax.scan(step, z, (ts, dts))
    return x


# ---------------------------------------------------------------------------
# token -> mel wrapper
# ---------------------------------------------------------------------------


def forward_flow(params: Params, token: jax.Array, token_len: jax.Array,
                 prompt_feat: jax.Array, prompt_feat_len: jax.Array,
                 embedding: jax.Array, cfg: FlowConfig,
                 rng: Optional[jax.Array] = None,
                 streaming: bool = False,
                 finalize: bool = True,
                 noise: Optional[jax.Array] = None,
                 enc_len: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, jax.Array]:
    """CausalMaskedDiffWithXvec.forward (flow.py:156-197).

    token [B, T] int, prompt_feat [B, Tp, 80], embedding [B, 192]
    -> (mel [B, T*2, 80], mel_lens [B]).  (Channel-last; transpose at the
    vocoder boundary.)

    ``enc_len`` ([B] int32, requires ``finalize=True``): encode only the
    first ``enc_len`` tokens while positions [enc_len, token_len) serve as
    the pre-lookahead context *inline* — the padded-static-shape form of
    the ``finalize=False`` context path (bit-identical for the encoded
    region, since the right-padded lookahead conv reads the same real
    tokens; one compile per token-width bucket instead of per exact
    width). This is what incremental streaming synthesis calls with
    chunk-aligned ``enc_len`` (infer/streaming_tts.py).
    """
    # xvec: L2 normalise then affine to 80
    emb = embedding / jnp.linalg.norm(embedding, axis=1, keepdims=True)
    emb = emb @ params["spk_affine"]["w"] + params["spk_affine"]["b"]

    B, T = token.shape
    tok_mask = (jnp.arange(T)[None, :] < token_len[:, None])[..., None]
    x = jnp.take(params["input_embedding"], jnp.maximum(token, 0), axis=0)
    x = x * tok_mask

    if finalize:
        el = token_len if enc_len is None else enc_len
        h, h_lens = flow_encoder.forward(params["encoder"], x, el,
                                         cfg.encoder, streaming=streaming)
    else:
        if enc_len is not None:
            raise ValueError("enc_len requires finalize=True (it IS the "
                             "static-shape context form)")
        la = cfg.pre_lookahead_len
        h, h_lens = flow_encoder.forward(
            params["encoder"], x[:, :-la], token_len,
            cfg.encoder, context=x[:, -la:], streaming=streaming)
    h = h @ params["encoder_proj"]["w"] + params["encoder_proj"]["b"]

    T2 = h.shape[1]
    conds = jnp.zeros_like(h)
    pmask = (jnp.arange(T2)[None, :] < prompt_feat_len[:, None])[..., None]
    pf = prompt_feat
    if pf.shape[1] < T2:
        pf = jnp.pad(pf, ((0, 0), (0, T2 - pf.shape[1]), (0, 0)))
    conds = jnp.where(pmask, pf[:, :T2], conds)

    mel_mask = (jnp.arange(T2)[None, :] < h_lens[:, None]).astype(h.dtype)
    if noise is None:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        noise = jax.random.normal(rng, h.shape, h.dtype)
    z = noise
    feat = solve_euler(params["estimator"], z, h, mel_mask[..., None] * 1.0,
                       emb, conds, cfg, streaming)
    return feat.astype(jnp.float32), h_lens


# ---------------------------------------------------------------------------
# incremental streaming: per-Euler-step caches
# ---------------------------------------------------------------------------
#
# The chunk-causal estimator guarantees a completed frame's velocity never
# changes as more frames append, so the ODE trajectory of old frames is
# FINAL — an incremental call only needs to compute the new frames'
# trajectory, attending to the old frames' keys/values at every Euler step.
# Caching those (plus the 2-frame input tail of every causal conv) turns
# the streaming recompute (O(n^2/chunk) total, infer/streaming_tts.py) into
# O(n) total work: per chunk, only new-frame queries against cached keys.
#
# Cache anatomy (leading axis = Euler step, because each step's trajectory
# is a distinct sequence): n_timesteps x [2B CFG-doubled rows] x
#   * K/V [nb, 2B, Tm, inner] per transformer stack (down, 12 mid, up)
#   * conv input tails [2B, k-1, Cin] per causal conv
# At the production config (15 steps, 14 stacks x 4 blocks, inner 512)
# the K/V caches are ~3.4 MB/frame in bf16 — ~8.8 GB at Tm=2560 frames
# (1,280 tokens), the practical ceiling on one v5e chip.


def init_incremental_cache(cfg: FlowConfig, batch: int, max_frames: int,
                           kv_dtype=jnp.bfloat16,
                           param_dtype=jnp.float32) -> Params:
    """Zero-initialised incremental-stream cache for ``batch`` utterances
    of up to ``max_frames`` mel frames. ``kv_dtype`` trades exactness for
    memory (bf16 halves the cache; mel drift ~1e-3, inaudible — tests use
    the compute dtype for tight parity)."""
    S, B2, C = cfg.n_timesteps, 2 * batch, cfg.est_channels
    nb = cfg.est_n_blocks
    inner = cfg.est_num_heads * cfg.est_head_dim
    M = cfg.est_num_mid_blocks

    def kv(*lead):
        return {t: jnp.zeros((S, *lead, nb, B2, max_frames, inner),
                             kv_dtype) for t in ("k", "v")}

    def tail(cin, *lead):
        return jnp.zeros((S, *lead, B2, 2, cin), param_dtype)

    return {
        "down": {"b1": tail(cfg.est_in_channels), "b2": tail(C),
                 "attn": kv(), "conv": tail(C)},
        "mid": {"b1": tail(C, M), "b2": tail(C, M), "attn": kv(M)},
        "up": {"b1": tail(2 * C), "b2": tail(C), "attn": kv(),
               "conv": tail(C)},
        "final": tail(C),
    }


def _causal_conv_inc(x, tail, p, k, f_val):
    """Causal conv over ``x`` [B, F, C] given the previous ``k-1`` input
    frames; returns (out [B, F, Cout], new tail at the valid end)."""
    cat = jnp.concatenate([tail.astype(x.dtype), x], axis=1)
    out = jax.lax.conv_general_dilated(
        cat, p["w"], window_strides=(1,), padding=((0, 0),),
        dimension_numbers=("NTC", "TIO", "NTC")) + p["b"]
    new_tail = jax.lax.dynamic_slice_in_dim(cat, f_val, k - 1, axis=1)
    return out, new_tail


def _causal_block_inc(p, x, m, tail, f_val):
    h, tail = _causal_conv_inc(x * m, tail, p["conv"], 3, f_val)
    return _mish(_ln(h, p["ln"])) * m, tail


def _causal_resnet_inc(p, x, m, t_emb, t1, t2, f_val):
    h, t1 = _causal_block_inc(p["block1"], x, m, t1, f_val)
    h = h + (_mish(t_emb) @ p["mlp"]["w"] + p["mlp"]["b"])[:, None, :]
    h, t2 = _causal_block_inc(p["block2"], h, m, t2, f_val)
    res = (x * m) @ p["res"]["w"][0] + p["res"]["b"]
    return h + res, t1, t2


def _attention_block_inc(p, x, kc, vc, bias, t_past, heads, head_dim):
    """New-frame queries against the cached keys/values. ``kc``/``vc``
    [B, Tm, inner]; fresh K/V for the F new frames are written at
    ``t_past`` first (so the new frames see themselves + the past)."""
    B, F, _ = x.shape
    inner = heads * head_dim
    kc = jax.lax.dynamic_update_slice_in_dim(
        kc, (x @ p["k"]["w"]).astype(kc.dtype), t_past, axis=1)
    vc = jax.lax.dynamic_update_slice_in_dim(
        vc, (x @ p["v"]["w"]).astype(vc.dtype), t_past, axis=1)
    Tm = kc.shape[1]
    q = (x @ p["q"]["w"]).reshape(B, F, heads, head_dim)
    k = kc.astype(x.dtype).reshape(B, Tm, heads, head_dim)
    v = vc.astype(x.dtype).reshape(B, Tm, heads, head_dim)
    scores = jnp.einsum(
        "bthd,bshd->bhts", q, k,
        preferred_element_type=jnp.float32) * head_dim ** -0.5
    scores = scores + bias
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, F, inner)
    return out @ p["out"]["w"] + p["out"]["b"], kc, vc


def _transformer_block_inc(p, x, kc, vc, bias, t_past, heads, head_dim):
    h = _ln(x, p["norm1"])
    a, kc, vc = _attention_block_inc(p["attn"], h, kc, vc, bias, t_past,
                                     heads, head_dim)
    x = x + a
    h = _ln(x, p["norm3"])
    h = jax.nn.gelu(h @ p["ff1"]["w"] + p["ff1"]["b"], approximate=False)
    return x + h @ p["ff2"]["w"] + p["ff2"]["b"], kc, vc


def _tf_stack_inc(p, h, kv, bias, t_past, heads, head_dim):
    def body(hh, xs):
        lp, kc, vc = xs
        hh, kc, vc = _transformer_block_inc(lp, hh, kc, vc, bias, t_past,
                                            heads, head_dim)
        return hh, (kc, vc)
    h, (ks, vs) = jax.lax.scan(body, h, (p, kv["k"], kv["v"]))
    return h, {"k": ks, "v": vs}


def estimator_incremental(params: Params, x: jax.Array, mask: jax.Array,
                          mu: jax.Array, t: jax.Array, spks: jax.Array,
                          cond: jax.Array, cfg: FlowConfig, cs: Params,
                          t_past, f_val) -> Tuple[jax.Array, Params]:
    """One-Euler-step estimator over F NEW frames [t_past, t_past+F).

    x/mu/cond [B2, F, 80] (CFG-doubled rows), mask [B2, F, 1] marking the
    ``f_val`` valid new frames, ``cs`` = this step's cache slice (leaves
    without the leading step axis). Chunk-causal bias is built from GLOBAL
    positions, so the result equals the matching rows of
    :func:`estimator_forward` with ``streaming=True`` over the full
    prefix. Returns (velocity [B2, F, 80], updated cache slice)."""
    B, F, _ = x.shape
    heads, hd = cfg.est_num_heads, cfg.est_head_dim
    t_emb = _time_embedding(params["time_mlp"], t, cfg.est_in_channels)

    spks_t = jnp.broadcast_to(spks[:, None, :], (B, F, spks.shape[-1]))
    h = jnp.concatenate([x, mu, spks_t, cond], axis=-1)
    m = mask

    Tm = cs["down"]["attn"]["k"].shape[-2]
    qpos = t_past + jnp.arange(F)
    kpos = jnp.arange(Tm)
    blk = (qpos // cfg.static_chunk_size + 1) * cfg.static_chunk_size
    keep = jnp.logical_and(kpos[None, :] < blk[:, None],
                           kpos[None, :] < t_past + f_val)
    bias = jnp.where(keep, 0.0, -1e10).astype(jnp.float32)[None, None]

    h, d1, d2 = _causal_resnet_inc(params["down"]["resnet"], h, m, t_emb,
                                   cs["down"]["b1"], cs["down"]["b2"],
                                   f_val)
    h, dkv = _tf_stack_inc(params["down"]["blocks"], h,
                           cs["down"]["attn"], bias, t_past, heads, hd)
    skip = h
    h, dconv = _causal_conv_inc(h * m, cs["down"]["conv"],
                                params["down"]["conv"], 3, f_val)

    def mid(hh, xs):
        lp, b1, b2, kv = xs
        hh, b1, b2 = _causal_resnet_inc(lp["resnet"], hh, m, t_emb, b1,
                                        b2, f_val)
        hh, kv = _tf_stack_inc(lp["blocks"], hh, kv, bias, t_past, heads,
                               hd)
        return hh, (b1, b2, kv)
    h, (m1, m2, mkv) = jax.lax.scan(
        mid, h, (params["mid"], cs["mid"]["b1"], cs["mid"]["b2"],
                 cs["mid"]["attn"]))

    h = jnp.concatenate([h, skip], axis=-1)
    h, u1, u2 = _causal_resnet_inc(params["up"]["resnet"], h, m, t_emb,
                                   cs["up"]["b1"], cs["up"]["b2"], f_val)
    h, ukv = _tf_stack_inc(params["up"]["blocks"], h, cs["up"]["attn"],
                           bias, t_past, heads, hd)
    h, uconv = _causal_conv_inc(h * m, cs["up"]["conv"],
                                params["up"]["conv"], 3, f_val)

    h, ftail = _causal_block_inc(params["final_block"], h, m,
                                 cs["final"], f_val)
    out = (h * m) @ params["final_proj"]["w"][0] + params["final_proj"]["b"]
    new_cs = {
        "down": {"b1": d1, "b2": d2, "attn": dkv, "conv": dconv},
        "mid": {"b1": m1, "b2": m2, "attn": mkv},
        "up": {"b1": u1, "b2": u2, "attn": ukv, "conv": uconv},
        "final": ftail,
    }
    return out * m, new_cs


def solve_euler_incremental(params: Params, z: jax.Array, mu: jax.Array,
                            mask: jax.Array, spks: jax.Array,
                            cond: jax.Array, cfg: FlowConfig,
                            caches: Params, t_past,
                            f_val) -> Tuple[jax.Array, Params]:
    """Euler solve of the F new frames only (solve_euler semantics
    restricted to [t_past, t_past+F)), advancing the per-step caches."""
    n = cfg.n_timesteps
    t_span = np.linspace(0, 1, n + 1, dtype=np.float32)
    if cfg.t_scheduler == "cosine":
        t_span = 1 - np.cos(t_span * 0.5 * np.pi)
    ts = jnp.asarray(t_span[:-1])
    dts = jnp.asarray(np.diff(t_span))
    B = z.shape[0]
    g = cfg.inference_cfg_rate

    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
    mask2 = jnp.concatenate([mask, mask], axis=0)

    def step(carry, xs):
        x, cache = carry
        i, tt, dt = xs
        cs = jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(a, i, 0,
                                                   keepdims=False), cache)
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.full((2 * B,), tt, x.dtype)
        v, cs = estimator_incremental(params, x2, mask2, mu2, t2, spks2,
                                      cond2, cfg, cs, t_past, f_val)
        cache = jax.tree.map(
            lambda a, u: jax.lax.dynamic_update_index_in_dim(a, u, i, 0),
            cache, cs)
        dphi = (1.0 + g) * v[:B] - g * v[B:]
        return (x + dt * dphi, cache), None

    (x, caches), _ = jax.lax.scan(
        step, (z, caches), (jnp.arange(n, dtype=jnp.int32), ts, dts))
    return x, caches


def encode_flow_tokens(params: Params, token: jax.Array,
                       token_len: jax.Array, cfg: FlowConfig,
                       enc_len: jax.Array) -> jax.Array:
    """Encoder stage of the incremental stream (the forward_flow
    streaming=True/enc_len encoder section): token prefix -> projected
    features h [B, ratio*W, 80]. Kept a SEPARATE program from the solver
    so widths compile independently: ~W/bucket cheap encoder compiles +
    ~log(F) expensive solver compiles, instead of their product."""
    B, T = token.shape
    tok_mask = (jnp.arange(T)[None, :] < token_len[:, None])[..., None]
    x = jnp.take(params["input_embedding"], jnp.maximum(token, 0), axis=0)
    x = x * tok_mask
    h, _ = flow_encoder.forward(params["encoder"], x, enc_len,
                                cfg.encoder, streaming=True)
    return h @ params["encoder_proj"]["w"] + params["encoder_proj"]["b"]


def solve_flow_incremental(params: Params, mu_new: jax.Array,
                           prompt_feat: jax.Array,
                           prompt_feat_len: jax.Array,
                           embedding: jax.Array, cfg: FlowConfig,
                           caches: Params, t_past,
                           noise_new: jax.Array,
                           enc_len: jax.Array
                           ) -> Tuple[jax.Array, Params]:
    """Solver stage of the incremental stream: Euler-solve ONLY the new
    mel frames [t_past, t_past+F) against the per-step caches.

    ``mu_new`` [B, F, 80] = the encoder features at the new frames (from
    :func:`encode_flow_tokens`, sliced at ``t_past``); ``noise_new``
    [B, F, 80] = the utterance noise buffer sliced likewise; ``t_past`` =
    first new frame (traced scalar == ratio * previously encoded tokens).
    Valid new frames = ratio*enc_len - t_past; rows beyond are masked out
    of the caches and overwritten by the next call. Returns
    (mel_new [B, F, 80] fp32, caches)."""
    emb = embedding / jnp.linalg.norm(embedding, axis=1, keepdims=True)
    emb = emb @ params["spk_affine"]["w"] + params["spk_affine"]["b"]

    F = noise_new.shape[1]
    pos = t_past + jnp.arange(F)                        # global frame pos
    pmask = (pos[None, :] < prompt_feat_len[:, None])[..., None]
    Tp = prompt_feat.shape[1]
    pf_rows = jnp.take(prompt_feat, jnp.clip(pos, 0, Tp - 1), axis=1)
    cond_new = jnp.where(pmask, pf_rows, 0.0)

    f_val = cfg.token_mel_ratio * enc_len[0] - t_past
    h_lens = cfg.encoder.up_stride * enc_len
    mask_new = ((pos[None, :] < h_lens[:, None])[..., None]
                .astype(mu_new.dtype) * 1.0)
    feat, caches = solve_euler_incremental(
        params["estimator"], noise_new, mu_new, mask_new, emb, cond_new,
        cfg, caches, t_past, f_val)
    return feat.astype(jnp.float32), caches


# ---------------------------------------------------------------------------
# init / conversion
# ---------------------------------------------------------------------------


def _init_estimator(host, cfg: FlowConfig) -> Params:
    C = cfg.est_channels
    Cin = cfg.est_in_channels
    TE = C * 4
    heads, hd = cfg.est_num_heads, cfg.est_head_dim
    inner = heads * hd
    ffi = C * 4

    def nrm(*shape):
        return jnp.asarray(host.normal(0, 0.02, shape), jnp.float32)

    def resnet(cin, cout, n=None):
        sh = (lambda *s: (n,) + s) if n is not None else (lambda *s: s)
        return {
            "block1": {"conv": {"w": nrm(*sh(3, cin, cout)),
                                "b": jnp.zeros(sh(cout))},
                       "ln": {"scale": jnp.ones(sh(cout)),
                              "bias": jnp.zeros(sh(cout))}},
            "block2": {"conv": {"w": nrm(*sh(3, cout, cout)),
                                "b": jnp.zeros(sh(cout))},
                       "ln": {"scale": jnp.ones(sh(cout)),
                              "bias": jnp.zeros(sh(cout))}},
            "mlp": {"w": nrm(*sh(TE, cout)), "b": jnp.zeros(sh(cout))},
            "res": {"w": nrm(*sh(1, cin, cout)), "b": jnp.zeros(sh(cout))},
        }

    def tf_blocks(n, outer=None):
        sh = (lambda *s: ((outer, n) if outer is not None else (n,)) + s)
        return {
            "norm1": {"scale": jnp.ones(sh(C)), "bias": jnp.zeros(sh(C))},
            "norm3": {"scale": jnp.ones(sh(C)), "bias": jnp.zeros(sh(C))},
            "attn": {"q": {"w": nrm(*sh(C, inner))},
                     "k": {"w": nrm(*sh(C, inner))},
                     "v": {"w": nrm(*sh(C, inner))},
                     "out": {"w": nrm(*sh(inner, C)),
                             "b": jnp.zeros(sh(C))}},
            "ff1": {"w": nrm(*sh(C, ffi)), "b": jnp.zeros(sh(ffi))},
            "ff2": {"w": nrm(*sh(ffi, C)), "b": jnp.zeros(sh(C))},
        }

    M = cfg.est_num_mid_blocks
    return {
        "time_mlp": {"lin1": {"w": nrm(Cin, TE), "b": jnp.zeros((TE,))},
                     "lin2": {"w": nrm(TE, TE), "b": jnp.zeros((TE,))}},
        "down": {"resnet": resnet(Cin, C),
                 "blocks": tf_blocks(cfg.est_n_blocks),
                 "conv": {"w": nrm(3, C, C), "b": jnp.zeros((C,))}},
        "mid": {"resnet": resnet(C, C, n=M),
                "blocks": tf_blocks(cfg.est_n_blocks, outer=M)},
        "up": {"resnet": resnet(2 * C, C),
               "blocks": tf_blocks(cfg.est_n_blocks),
               "conv": {"w": nrm(3, C, C), "b": jnp.zeros((C,))}},
        "final_block": {"conv": {"w": nrm(3, C, C), "b": jnp.zeros((C,))},
                        "ln": {"scale": jnp.ones((C,)),
                               "bias": jnp.zeros((C,))}},
        "final_proj": {"w": nrm(1, C, cfg.output_size),
                       "b": jnp.zeros((cfg.output_size,))},
    }


def init_params(rng: jax.Array, cfg: FlowConfig) -> Params:
    host = np.random.default_rng(0)
    D = cfg.input_size
    return {
        "input_embedding": jnp.asarray(
            host.normal(0, 0.02, (cfg.vocab_size, D)), jnp.float32),
        "spk_affine": {
            "w": jnp.asarray(host.normal(0, 0.02, (cfg.spk_embed_dim,
                                                   cfg.output_size)),
                             jnp.float32),
            "b": jnp.zeros((cfg.output_size,))},
        "encoder": flow_encoder.init_params(rng, cfg.encoder),
        "encoder_proj": {
            "w": jnp.asarray(host.normal(
                0, 0.02, (cfg.encoder.output_size, cfg.output_size)),
                jnp.float32),
            "b": jnp.zeros((cfg.output_size,))},
        "estimator": _init_estimator(host, cfg),
    }


def convert_torch_state(state: Dict[str, Any], cfg: FlowConfig) -> Params:
    """Map the reference flow.pt state dict into this pytree (names from
    CausalMaskedDiffWithXvec / CausalConditionalDecoder)."""
    def np_(t):
        if isinstance(t, np.ndarray):
            return t.astype(np.float32)
        import torch
        return t.detach().to(torch.float32).cpu().numpy()

    def g(name):
        return np_(state[name])

    def lin(name):
        return {"w": jnp.asarray(g(name + ".weight").T),
                "b": jnp.asarray(g(name + ".bias"))}

    def conv(name):
        return {"w": jnp.asarray(g(name + ".weight").transpose(2, 1, 0)),
                "b": jnp.asarray(g(name + ".bias"))}

    def causal_block(pref):
        return {"conv": conv(pref + ".block.0"),
                "ln": {"scale": jnp.asarray(g(pref + ".block.2.weight")),
                       "bias": jnp.asarray(g(pref + ".block.2.bias"))}}

    def resnet(pref, stack_idx=None):
        def one(p):
            return {
                "block1": causal_block(p + ".block1"),
                "block2": causal_block(p + ".block2"),
                "mlp": lin(p + ".mlp.1"),
                "res": conv(p + ".res_conv"),
            }
        return one(pref)

    def tf_block(pref):
        return {
            "norm1": {"scale": jnp.asarray(g(pref + ".norm1.weight")),
                      "bias": jnp.asarray(g(pref + ".norm1.bias"))},
            "norm3": {"scale": jnp.asarray(g(pref + ".norm3.weight")),
                      "bias": jnp.asarray(g(pref + ".norm3.bias"))},
            "attn": {"q": {"w": jnp.asarray(g(pref + ".attn1.to_q.weight").T)},
                     "k": {"w": jnp.asarray(g(pref + ".attn1.to_k.weight").T)},
                     "v": {"w": jnp.asarray(g(pref + ".attn1.to_v.weight").T)},
                     "out": {"w": jnp.asarray(
                                 g(pref + ".attn1.to_out.0.weight").T),
                             "b": jnp.asarray(
                                 g(pref + ".attn1.to_out.0.bias"))}},
            "ff1": lin(pref + ".ff.net.0.proj"),
            "ff2": lin(pref + ".ff.net.2"),
        }

    def tf_stack(fmt, n):
        blocks = [tf_block(fmt.format(i)) for i in range(n)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    est = "decoder.estimator."
    nb = cfg.est_n_blocks
    mids = []
    for i in range(cfg.est_num_mid_blocks):
        mids.append({
            "resnet": resnet(f"{est}mid_blocks.{i}.0"),
            "blocks": tf_stack(f"{est}mid_blocks.{i}.1.{{}}", nb),
        })
    mid_stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *mids)

    estimator = {
        "time_mlp": {"lin1": lin(est + "time_mlp.linear_1"),
                     "lin2": lin(est + "time_mlp.linear_2")},
        "down": {"resnet": resnet(est + "down_blocks.0.0"),
                 "blocks": tf_stack(est + "down_blocks.0.1.{}", nb),
                 "conv": conv(est + "down_blocks.0.2")},
        "mid": mid_stacked,
        "up": {"resnet": resnet(est + "up_blocks.0.0"),
               "blocks": tf_stack(est + "up_blocks.0.1.{}", nb),
               "conv": conv(est + "up_blocks.0.2")},
        "final_block": causal_block(est + "final_block"),
        "final_proj": conv(est + "final_proj"),
    }
    return {
        "input_embedding": jnp.asarray(g("input_embedding.weight")),
        "spk_affine": lin("spk_embed_affine_layer"),
        "encoder": flow_encoder.convert_torch_state(state, cfg.encoder,
                                                    prefix="encoder."),
        "encoder_proj": lin("encoder_proj"),
        "estimator": estimator,
    }
