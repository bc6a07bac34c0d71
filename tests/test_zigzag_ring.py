"""Zig-zag ring attention (ops/ring_attention.py zigzag_*).

The zig-zag chunk-pair layout balances causal work across sp ranks and
computes only live (C x C) blocks (~half the contiguous ring's attention
FLOPs). Proven equal to full causal attention on the 8-virtual-device CPU
platform: op-level fwd/grads, inside the qwen3 forward (which permutes
embeds + rope positions and inverts after the stack), and through a full
sharded KD step.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from speech_distill_tpu.core.config import (
    DistillConfig, LoraConfig, MeshConfig, qwen3_tiny)
from speech_distill_tpu.models import qwen3
from speech_distill_tpu.ops.attention import sdpa_xla
from speech_distill_tpu.ops.ring_attention import (
    zigzag_available, zigzag_inverse, zigzag_order, zigzag_ring_attention)
from speech_distill_tpu.parallel import mesh as meshlib
from speech_distill_tpu.parallel import sharding

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def _mesh(dp=2, sp=2, tp=2):
    return meshlib.make_mesh(MeshConfig(dp=dp, sp=sp, tp=tp))


def _qkv(key, B=4, T=32, H=4, KV=2, Dh=8):
    ks = jax.random.split(key, 3)
    return (jax.random.normal(ks[0], (B, T, H, Dh), jnp.float32),
            jax.random.normal(ks[1], (B, T, KV, Dh), jnp.float32),
            jax.random.normal(ks[2], (B, T, KV, Dh), jnp.float32))


def _causal_bias(B, T):
    qp = jnp.arange(T)[:, None]
    kp = jnp.arange(T)[None, :]
    return jnp.where(kp <= qp, 0.0, -jnp.inf
                     ).astype(jnp.float32)[None, None].repeat(B, 0)


def _put(mesh, *arrs):
    sh = NamedSharding(mesh, P("dp", "sp", None, None))
    return tuple(jax.device_put(a, sh) for a in arrs)


def test_order_inverse_roundtrip():
    for T, sp in [(32, 2), (32, 4), (48, 3), (64, 8)]:
        order = zigzag_order(T, sp)
        inv = zigzag_inverse(T, sp)
        assert sorted(order.tolist()) == list(range(T))
        np.testing.assert_array_equal(order[inv], np.arange(T))
        # rank r's first chunk is global chunk r, second its mirror
        C = T // (2 * sp)
        for r in range(sp):
            np.testing.assert_array_equal(
                order[r * 2 * C: r * 2 * C + C], np.arange(C) + r * C)
            np.testing.assert_array_equal(
                order[r * 2 * C + C: (r + 1) * 2 * C],
                np.arange(C) + (2 * sp - 1 - r) * C)


@pytest.mark.parametrize("sp,tp", [(2, 2), (4, 1), (8, 1)])
def test_zigzag_matches_full_causal(sp, tp):
    mesh = _mesh(dp=8 // (sp * tp), sp=sp, tp=tp)
    q, k, v = _qkv(jax.random.PRNGKey(0), T=32)
    ref = sdpa_xla(q, k, v, _causal_bias(q.shape[0], q.shape[1]))
    order = zigzag_order(32, sp)
    inv = zigzag_inverse(32, sp)
    out = jax.jit(lambda a, b, c: zigzag_ring_attention(a, b, c, mesh))(
        *_put(mesh, q[:, order], k[:, order], v[:, order]))
    np.testing.assert_allclose(np.asarray(out)[:, inv], np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_zigzag_gradients_match():
    mesh = _mesh()
    q, k, v = _qkv(jax.random.PRNGKey(1))
    order = jnp.asarray(zigzag_order(32, 2))
    inv = jnp.asarray(zigzag_inverse(32, 2))

    def loss_zz(q, k, v):
        o = zigzag_ring_attention(q[:, order], k[:, order], v[:, order],
                                  mesh)
        return (o[:, inv].astype(jnp.float32) ** 2).sum()

    def loss_ref(q, k, v):
        return (sdpa_xla(q, k, v, _causal_bias(q.shape[0], q.shape[1]))
                .astype(jnp.float32) ** 2).sum()

    g1 = jax.jit(jax.grad(loss_zz, argnums=(0, 1, 2)))(*_put(mesh, q, k, v))
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_zigzag_available_logic():
    mesh = _mesh()                       # sp = 2
    assert zigzag_available(mesh, 32)
    assert not zigzag_available(mesh, 34)    # 34 % (2*sp=4) != 0
    assert not zigzag_available(None, 32)
    assert not zigzag_available(meshlib.make_mesh(MeshConfig(dp=8)), 32)


def test_qwen3_forward_zigzag_equals_xla():
    """Full model forward with attn_impl='ring_zigzag' on dp2 x sp2 x tp2
    equals the single-device XLA forward, including right-padded rows
    (the permute/invert happens inside qwen3.forward)."""
    cfg = qwen3_tiny(128)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False,
                       "attn_impl": "xla"})
    cfg_zz = type(cfg)(**{**cfg.__dict__, "attn_impl": "ring_zigzag"})
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    B, T = 4, 32
    ids = jnp.asarray(rng.integers(0, 128, (B, T)), jnp.int32)
    mask = np.ones((B, T), np.int32)
    mask[1, 28:] = 0
    mask[3, 20:] = 0
    mask = jnp.asarray(mask)

    ref = qwen3.forward(params, ids, cfg, attention_mask=mask)

    mesh = _mesh()
    with meshlib.active_mesh(mesh):
        params_s = sharding.shard_params(mesh, params, cfg)
        batch = sharding.shard_batch(
            mesh, {"ids": ids, "mask": mask}, microbatched=False)
        out = jax.jit(lambda p, i, m: qwen3.forward(
            p, i, cfg_zz, attention_mask=m))(
                params_s, batch["ids"], batch["mask"])

    valid = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(np.asarray(out)[valid],
                               np.asarray(ref)[valid],
                               atol=2e-4, rtol=2e-4)


def test_zigzag_no_active_mesh_falls_back():
    cfg = qwen3_tiny(128)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False,
                       "attn_impl": "ring_zigzag"})
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 16)),
                      jnp.int32)
    with meshlib.active_mesh(None):
        out = qwen3.forward(params, ids, cfg)
    cfg_x = type(cfg)(**{**cfg.__dict__, "attn_impl": "xla"})
    ref = qwen3.forward(params, ids, cfg_x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


@pytest.mark.slow
def test_kd_step_zigzag_matches_single_device():
    """Full online-sparse KD step with zig-zag ring attention over a
    dp2 x sp2 x tp2 mesh equals the single-device step — the loss's causal
    shift runs on globally-ordered logits (the permutation is internal to
    the model forward)."""
    from speech_distill_tpu.distill import train_step
    from speech_distill_tpu.distill.lora import init_lora

    cfg = qwen3_tiny(128)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False})
    cfg_zz = type(cfg)(**{**cfg.__dict__, "attn_impl": "ring_zigzag"})
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    teacher = qwen3.init_params(jax.random.PRNGKey(1), cfg)
    dcfg = DistillConfig(top_k=8,
                         lora=LoraConfig(r=4, alpha=8,
                                         init_weights="gaussian"))
    lora, base = init_lora(jax.random.PRNGKey(2), params, cfg, dcfg.lora)
    opt = train_step.make_optimizer(1e-3, 1, 20)

    rng = np.random.default_rng(0)
    B, T = 8, 16
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, 128, (1, B, T)), jnp.int32),
        "attention_mask": jnp.ones((1, B, T), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 128, (1, B, T)), jnp.int64),
    }

    step = train_step.make_kd_step(cfg, dcfg, opt, mode="online_sparse",
                                   teacher_cfg=cfg, donate=False)
    s0 = train_step.init_state(lora, opt)
    s0_after, m0 = step(s0, base, teacher, batch)

    mesh = _mesh()
    with meshlib.active_mesh(mesh):
        step_z = train_step.make_kd_step(cfg_zz, dcfg, opt,
                                         mode="online_sparse",
                                         teacher_cfg=cfg_zz, donate=False)
        base_s = sharding.shard_params(mesh, base, cfg)
        teacher_s = sharding.shard_params(mesh, teacher, cfg)
        lora_s = sharding.shard_lora(mesh, lora)
        st = train_step.init_state(lora_s, opt)
        st = train_step.TrainState(
            lora_s,
            sharding.shard_opt_state(mesh, st.opt_state,
                                     sharding.lora_pspecs(lora)),
            jax.device_put(st.step, meshlib.replicated(mesh)))
        batch_s = sharding.shard_batch(mesh, batch)
        st_after, m1 = step_z(st, base_s, teacher_s, batch_s)

    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s0_after.trainable),
                    jax.tree.leaves(st_after.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_zigzag_degrades_to_contiguous_ring():
    """T divisible by sp but not 2*sp: attn_impl='ring_zigzag' must route
    through the CONTIGUOUS ring (no permutation, no [B,1,T,T] bias), not
    silently fall back to full masked SDPA."""
    mesh = meshlib.make_mesh(MeshConfig(dp=2, sp=4))      # 2*sp = 8
    T = 36                                                 # 36 % 4 == 0
    assert not zigzag_available(mesh, T)
    from speech_distill_tpu.ops.ring_attention import ring_available
    assert ring_available(mesh, T)

    cfg = qwen3_tiny(128)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False,
                       "attn_impl": "xla"})
    cfg_zz = type(cfg)(**{**cfg.__dict__, "attn_impl": "ring_zigzag"})
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 128, (4, T)),
                      jnp.int32)
    ref = qwen3.forward(params, ids, cfg)
    with meshlib.active_mesh(mesh):
        batch = sharding.shard_batch(mesh, {"ids": ids}, microbatched=False)
        out = jax.jit(lambda p, i: qwen3.forward(p, i, cfg_zz))(
            params, batch["ids"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
