"""Sequence-parallel ring attention (ops/ring_attention.py).

Correctness is proven against full-sequence XLA SDPA on the 8-virtual-device
CPU platform: the ring runs with seq sharded over an sp mesh axis and must
equal the unsharded causal computation — forward, gradients, inside the
qwen3 forward, and through a full sharded KD training step.
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
from speech_distill_tpu.ops.ring_attention import ring_attention, ring_available
from speech_distill_tpu.parallel import mesh as meshlib
from speech_distill_tpu.parallel import sharding

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def _mesh(dp=2, sp=2, tp=2):
    return meshlib.make_mesh(MeshConfig(dp=dp, sp=sp, tp=tp))


def _qkv(key, B=4, T=32, H=4, KV=2, Dh=8):
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (B, T, H, Dh), jnp.float32)
    k = jax.random.normal(ks[1], (B, T, KV, Dh), jnp.float32)
    v = jax.random.normal(ks[2], (B, T, KV, Dh), jnp.float32)
    return q, k, v


def _causal_bias(B, T):
    qp = jnp.arange(T)[:, None]
    kp = jnp.arange(T)[None, :]
    return jnp.where(kp <= qp, 0.0, -jnp.inf
                     ).astype(jnp.float32)[None, None].repeat(B, 0)


def _put(mesh, q, k, v):
    qs = jax.device_put(q, NamedSharding(mesh, P("dp", "sp", "tp", None)))
    kv = NamedSharding(mesh, P("dp", "sp", None, None))
    return qs, jax.device_put(k, kv), jax.device_put(v, kv)


@pytest.mark.parametrize("sp,tp", [(2, 2), (4, 1), (8, 1)])
def test_ring_matches_full_causal(sp, tp):
    mesh = _mesh(dp=8 // (sp * tp), sp=sp, tp=tp)
    q, k, v = _qkv(jax.random.PRNGKey(0), T=32)
    ref = sdpa_xla(q, k, v, _causal_bias(q.shape[0], q.shape[1]))
    out = jax.jit(lambda a, b, c: ring_attention(a, b, c, mesh))(
        *_put(mesh, q, k, v))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ring_gradients_match():
    mesh = _mesh()
    q, k, v = _qkv(jax.random.PRNGKey(1))

    def loss_ring(q, k, v):
        return (ring_attention(q, k, v, mesh).astype(jnp.float32) ** 2).sum()

    def loss_ref(q, k, v):
        return (sdpa_xla(q, k, v, _causal_bias(q.shape[0], q.shape[1]))
                .astype(jnp.float32) ** 2).sum()

    g1 = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(*_put(mesh, q, k, v))
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_ring_available_logic():
    mesh = _mesh()
    assert ring_available(mesh, 32)
    assert not ring_available(mesh, 33)          # not divisible by sp=2
    assert not ring_available(None, 32)          # no active mesh
    dp_only = meshlib.make_mesh(MeshConfig(dp=8))
    assert not ring_available(dp_only, 32)       # sp axis of size 1


def test_qwen3_forward_ring_equals_xla():
    """Full model forward with attn_impl='ring' on a dp2 x sp2 x tp2 mesh
    equals the single-device XLA forward, including right-padded rows."""
    cfg = qwen3_tiny(128)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False,
                       "attn_impl": "xla"})
    cfg_ring = type(cfg)(**{**cfg.__dict__, "attn_impl": "ring"})
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    B, T = 4, 32
    ids = jnp.asarray(rng.integers(0, 128, (B, T)), jnp.int32)
    mask = np.ones((B, T), np.int32)
    mask[1, 28:] = 0                              # right padding
    mask[3, 20:] = 0
    mask = jnp.asarray(mask)

    ref = qwen3.forward(params, ids, cfg, attention_mask=mask)

    mesh = _mesh()
    with meshlib.active_mesh(mesh):
        params_s = sharding.shard_params(mesh, params, cfg)
        batch = sharding.shard_batch(
            mesh, {"ids": ids, "mask": mask}, microbatched=False)
        out = jax.jit(lambda p, i, m: qwen3.forward(
            p, i, cfg_ring, attention_mask=m))(
                params_s, batch["ids"], batch["mask"])

    ref_np, out_np = np.asarray(ref), np.asarray(out)
    valid = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(out_np[valid], ref_np[valid],
                               atol=2e-4, rtol=2e-4)


def test_ring_no_active_mesh_falls_back():
    """attn_impl='ring' without an active sp mesh silently computes the
    masked XLA path (mask_bias is materialized), so results still match."""
    cfg = qwen3_tiny(128)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False,
                       "attn_impl": "ring"})
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 16)),
                      jnp.int32)
    with meshlib.active_mesh(None):   # pipelines may have set the global
        out = qwen3.forward(params, ids, cfg)
    cfg_x = type(cfg)(**{**cfg.__dict__, "attn_impl": "xla"})
    ref = qwen3.forward(params, ids, cfg_x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


@pytest.mark.slow
def test_kd_step_dp2_sp2_tp2_matches_single_device():
    """The full online-sparse KD step with ring attention over a
    dp2 x sp2 x tp2 mesh equals the single-device step."""
    from speech_distill_tpu.distill import train_step
    from speech_distill_tpu.distill.lora import init_lora

    cfg = qwen3_tiny(128)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False})
    cfg_ring = type(cfg)(**{**cfg.__dict__, "attn_impl": "ring"})
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    teacher = qwen3.init_params(jax.random.PRNGKey(1), cfg)
    dcfg = DistillConfig(top_k=8,
                         lora=LoraConfig(r=4, alpha=8, init_weights="gaussian"))
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
        step_r = train_step.make_kd_step(cfg_ring, dcfg, opt,
                                         mode="online_sparse",
                                         teacher_cfg=cfg_ring, donate=False)
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
        st_after, m1 = step_r(st, base_s, teacher_s, batch_s)

    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s0_after.trainable),
                    jax.tree.leaves(st_after.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_shard_batch_sp_axis():
    """shard_batch on an sp mesh shards the seq dim; non-divisible and
    rank-deficient entries stay batch-only."""
    mesh = _mesh()
    batch = {
        "input_ids": jnp.zeros((2, 4, 32), jnp.int32),
        "lengths": jnp.zeros((2, 4), jnp.int32),        # no seq dim
        "odd": jnp.zeros((2, 4, 33), jnp.int32),        # 33 % 2 != 0
    }
    out = sharding.shard_batch(mesh, batch)
    assert out["input_ids"].sharding.spec == P(None, "dp", "sp")
    assert out["lengths"].sharding.spec == P(None, "dp")
    assert out["odd"].sharding.spec == P(None, "dp")
