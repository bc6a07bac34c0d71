"""Multi-device KD training over a dp x tp mesh (8 virtual CPU devices)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from speech_distill_tpu.core.config import DistillConfig, LoraConfig, MeshConfig, qwen3_tiny
from speech_distill_tpu.distill import train_step
from speech_distill_tpu.distill.lora import init_lora
from speech_distill_tpu.models import qwen3
from speech_distill_tpu.parallel import mesh as meshlib
from speech_distill_tpu.parallel import sharding


def _f32(cfg):
    return type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False})


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.slow
def test_kd_step_dp4_tp2_matches_single_device():
    cfg = _f32(qwen3_tiny(128))
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

    # single device result
    s0 = train_step.init_state(lora, opt)
    s0_after, m0 = step(s0, base, teacher, batch)

    # sharded over 4x2 mesh
    m = meshlib.make_mesh(MeshConfig(dp=4, tp=2))
    base_s = sharding.shard_params(m, base, cfg)
    teacher_s = sharding.shard_params(m, teacher, cfg)
    lora_s = sharding.shard_lora(m, lora)
    st = train_step.init_state(lora_s, opt)
    st = train_step.TrainState(
        lora_s,
        sharding.shard_opt_state(m, st.opt_state, sharding.lora_pspecs(lora)),
        jax.device_put(st.step, meshlib.replicated(m)))
    batch_s = sharding.shard_batch(m, batch)

    st_after, m1 = step(st, base_s, teacher_s, batch_s)

    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s0_after.trainable),
                    jax.tree.leaves(st_after.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_mesh_extraction_matches_single_device():
    """The extraction service under a dp8 mesh (shard_batch
    microbatched=False) returns the same artifacts as single-device
    extraction — the 'extraction scales to a pod slice unchanged' claim."""
    from speech_distill_tpu.pipelines.extract_logits import (
        extract_teacher_logprobs)

    cfg = _f32(qwen3_tiny(128))
    teacher = qwen3.init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(1)
    feats = []
    for _ in range(16):
        L = int(rng.integers(6, 14))
        feats.append({
            "teacher_input_ids": rng.integers(0, 128, L).tolist(),
            "teacher_attention_mask": [1] * L,
        })

    def fwd(pp, ids, mask):
        return qwen3.forward(pp, ids, cfg, attention_mask=mask)

    v0, i0 = extract_teacher_logprobs(
        teacher, fwd, feats, top_k=8, batch_size=8, pad_token_id=0,
        pad_to_multiple_of=8, progress=False)

    m = meshlib.make_mesh(MeshConfig(dp=8, tp=1))
    teacher_s = sharding.shard_params(m, teacher, cfg)
    v1, i1 = extract_teacher_logprobs(
        teacher_s, fwd, feats, top_k=8, batch_size=8, pad_token_id=0,
        pad_to_multiple_of=8, progress=False, mesh=m)

    assert len(v0) == len(v1) == len(feats)
    for a, b in zip(i0, i1):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(v0, v1):
        np.testing.assert_allclose(a.astype(np.float32),
                                   b.astype(np.float32), atol=2e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_mesh_construction():
    m = meshlib.make_mesh(MeshConfig(dp=-1, tp=2))
    assert m.shape == {"dp": 4, "pp": 1, "sp": 1, "tp": 2}
    m = meshlib.make_mesh(MeshConfig())
    assert m.shape == {"dp": 8, "pp": 1, "sp": 1, "tp": 1}
    m = meshlib.make_mesh(MeshConfig(sp=2, tp=2))
    assert m.shape == {"dp": 2, "pp": 1, "sp": 2, "tp": 2}
    m = meshlib.make_mesh(MeshConfig(pp=2, tp=2))
    assert m.shape == {"dp": 2, "pp": 2, "sp": 1, "tp": 2}
    with pytest.raises(ValueError):
        meshlib.make_mesh(MeshConfig(dp=3, tp=2))
    with pytest.raises(ValueError):
        meshlib.make_mesh(MeshConfig(sp=3))
    with pytest.raises(ValueError):
        meshlib.make_mesh(MeshConfig(pp=3))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_zero1_opt_sharding_matches_single_device():
    """ZeRO-1 (optimizer moments dp-sharded on top of the param specs):
    the KD step stays leaf-exact vs single-device, and the moment leaves
    actually carry the extra dp axis in their sharding."""
    from jax.sharding import PartitionSpec as PS

    cfg = _f32(qwen3_tiny(128))
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

    m = meshlib.make_mesh(MeshConfig(dp=4, tp=2))
    base_s = sharding.shard_params(m, base, cfg)
    teacher_s = sharding.shard_params(m, teacher, cfg)
    lora_s = sharding.shard_lora(m, lora)
    st = train_step.init_state(lora_s, opt)
    opt_s = sharding.shard_opt_state(m, st.opt_state,
                                     sharding.lora_pspecs(lora),
                                     zero1=True)
    # the embed moment must actually be dp-sharded (vocab 128 / (2*4))
    mu_embed = opt_s[1][0].mu["embed"]["weight"]
    assert mu_embed.sharding.spec == PS(("tp", "dp"), None)
    st = train_step.TrainState(
        lora_s, opt_s, jax.device_put(st.step, meshlib.replicated(m)))
    st_after, m1 = step(st, base_s, teacher_s,
                        sharding.shard_batch(m, batch))
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s0_after.trainable),
                    jax.tree.leaves(st_after.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
