"""Pod-scale config smoke: seq-2048 KD step over the 8-device mesh with the
fused lm-head loss (the BASELINE.json pod-scale configuration, shrunk to a
tiny model so it runs on the CPU mesh)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from speech_distill_tpu.core.config import (DistillConfig, LoraConfig,
                                            MeshConfig, qwen3_tiny)
from speech_distill_tpu.distill import train_step
from speech_distill_tpu.distill.lora import init_lora
from speech_distill_tpu.models import qwen3
from speech_distill_tpu.parallel import mesh as meshlib
from speech_distill_tpu.parallel import sharding


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_seq2048_kd_step_dp8_fused_loss():
    cfg = qwen3_tiny(512)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": True,
                       "max_position_embeddings": 4096})
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    dcfg = DistillConfig(top_k=8,
                         lora=LoraConfig(r=4, alpha=8,
                                         init_weights="gaussian"))
    lora, base = init_lora(jax.random.PRNGKey(1), params, cfg, dcfg.lora)
    opt = train_step.make_optimizer(1e-3, 1, 10)

    mesh = meshlib.make_mesh(MeshConfig(dp=8, tp=1))
    base_s = sharding.shard_params(mesh, base, cfg)
    lora_s = sharding.shard_lora(mesh, lora)
    state = train_step.init_state(lora_s, opt)
    state = train_step.TrainState(
        lora_s, sharding.shard_opt_state(mesh, state.opt_state,
                                         sharding.lora_pspecs(lora)),
        state.step)

    rng = np.random.default_rng(0)
    B, T, K = 8, 2048, 8
    batch = sharding.shard_batch(mesh, {
        "input_ids": rng.integers(0, 512, (1, B, T)).astype(np.int32),
        "attention_mask": np.ones((1, B, T), np.int32),
        "labels": rng.integers(0, 512, (1, B, T)).astype(np.int64),
        "teacher_top_k_v": (rng.normal(size=(1, B, T, K)) - 3
                            ).astype(np.float16),
        "teacher_top_k_i": rng.integers(0, 512,
                                        (1, B, T, K)).astype(np.int32),
    })

    step = train_step.make_kd_step(cfg, dcfg, opt, mode="precomputed",
                                   donate=False, fused_loss=True,
                                   loss_chunk_size=128)
    state, metrics = step(state, base_s, None, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_seq2048_kd_step_dp2_sp4_ring():
    """Long-context parallel layout: seq 2048 sharded 4-way over sp with
    ring attention, dp2, fused loss — the configuration that scales
    sequence length past one chip's HBM."""
    cfg = qwen3_tiny(512)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": True,
                       "max_position_embeddings": 4096,
                       "attn_impl": "ring"})
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    dcfg = DistillConfig(top_k=8,
                         lora=LoraConfig(r=4, alpha=8,
                                         init_weights="gaussian"))
    lora, base = init_lora(jax.random.PRNGKey(1), params, cfg, dcfg.lora)
    opt = train_step.make_optimizer(1e-3, 1, 10)

    mesh = meshlib.make_mesh(MeshConfig(dp=2, sp=4, tp=1))
    with meshlib.active_mesh(mesh):
        base_s = sharding.shard_params(mesh, base, cfg)
        lora_s = sharding.shard_lora(mesh, lora)
        state = train_step.init_state(lora_s, opt)
        state = train_step.TrainState(
            lora_s, sharding.shard_opt_state(mesh, state.opt_state,
                                             sharding.lora_pspecs(lora)),
            state.step)

        rng = np.random.default_rng(0)
        B, T, K = 4, 2048, 8
        batch = sharding.shard_batch(mesh, {
            "input_ids": rng.integers(0, 512, (1, B, T)).astype(np.int32),
            "attention_mask": np.ones((1, B, T), np.int32),
            "labels": rng.integers(0, 512, (1, B, T)).astype(np.int64),
            "teacher_top_k_v": (rng.normal(size=(1, B, T, K)) - 3
                                ).astype(np.float16),
            "teacher_top_k_i": rng.integers(0, 512,
                                            (1, B, T, K)).astype(np.int32),
        })
        assert batch["input_ids"].sharding.spec == \
            jax.sharding.PartitionSpec(None, "dp", "sp")

        step = train_step.make_kd_step(cfg, dcfg, opt, mode="precomputed",
                                       donate=False, fused_loss=True,
                                       loss_chunk_size=128)
        state, metrics = step(state, base_s, None, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 1
