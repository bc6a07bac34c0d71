"""Disaggregated teacher extraction (distill/disaggregate.py): the teacher
on its own mesh slice streams top-K artifacts into the precomputed KD step
— must equal monolithic online KD when extraction is exact."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_distill_tpu.core.config import (
    DistillConfig, LoraConfig, MeshConfig, qwen3_tiny)
from speech_distill_tpu.distill import disaggregate, train_step
from speech_distill_tpu.distill.lora import init_lora
from speech_distill_tpu.models import qwen3
from speech_distill_tpu.parallel import mesh as meshlib
from speech_distill_tpu.parallel import sharding

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def _f32(cfg):
    return type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False})


def _batches(rng, n, B=8, T=16, vocab=128):
    out = []
    for _ in range(n):
        out.append({
            "input_ids": rng.integers(0, vocab, (1, B, T)).astype(np.int32),
            "attention_mask": np.ones((1, B, T), np.int32),
            "labels": rng.integers(0, vocab, (1, B, T)).astype(np.int32),
        })
    return out


def test_split_devices():
    s, t = disaggregate.split_devices(4)
    assert len(s) == 4 and len(t) == 4
    assert set(s).isdisjoint(t)
    with pytest.raises(ValueError):
        disaggregate.split_devices(0)
    with pytest.raises(ValueError):
        disaggregate.split_devices(len(jax.devices()))


def test_pipeline_batches_ordering_and_alignment():
    """With depth-2 lookahead each yielded batch carries the artifacts of
    ITS OWN extraction (no off-by-one), identical to direct extraction."""
    cfg = _f32(qwen3_tiny(128))
    teacher = qwen3.init_params(jax.random.PRNGKey(1), cfg)
    _, t_devs = disaggregate.split_devices(4)
    t_mesh = meshlib.make_mesh(MeshConfig(dp=4), devices=t_devs)
    svc = disaggregate.make_teacher_service(
        teacher, cfg, t_mesh, top_k=8, student_vocab_size=128,
        method="exact", depth=2)

    rng = np.random.default_rng(0)
    batches = _batches(rng, 5)
    got = list(disaggregate.pipeline_batches(iter(batches), svc))
    assert len(got) == len(batches)
    assert len(svc) == 0

    from speech_distill_tpu.distill import losses
    for hb, out in zip(batches, got):
        np.testing.assert_array_equal(hb["input_ids"], out["input_ids"])
        logits = qwen3.forward(teacher, jnp.asarray(hb["input_ids"][0]), cfg,
                               attention_mask=jnp.asarray(
                                   hb["attention_mask"][0]))
        v, i = losses.extract_top_k(logits, 8, student_vocab_size=128,
                                    method="exact")
        np.testing.assert_array_equal(out["teacher_top_k_i"][0],
                                      np.asarray(i))
        np.testing.assert_allclose(out["teacher_top_k_v"][0].astype(np.float32),
                                   np.asarray(v).astype(np.float32),
                                   atol=2e-3)


@pytest.mark.slow
def test_disaggregated_teacher_feeds_1f1b_student():
    """Online KD with the teacher disaggregated onto its own 4-device mesh
    and the student running the hand-scheduled 1F1B pipeline (dp2 x pp2,
    4 microbatches) equals monolithic online-sparse KD on one device, step
    for step — the CLI wiring ``--teacher_devices N --pp 2 --pp_schedule
    1f1b`` (pipelines/train.py:336 turns the student step precomputed, the
    only mode 1F1B supports; reference train.py:60-94 has neither a
    pipeline nor a disaggregation story)."""
    cfg = _f32(qwen3_tiny(128))
    cfg_pp = type(cfg)(**{**cfg.__dict__, "pp_microbatches": 4})
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    teacher = qwen3.init_params(jax.random.PRNGKey(1), cfg)
    dcfg = DistillConfig(top_k=8, online_topk_method="exact",
                         lora=LoraConfig(r=4, alpha=8,
                                         init_weights="gaussian"))
    lora, base = init_lora(jax.random.PRNGKey(2), params, cfg, dcfg.lora)
    opt = train_step.make_optimizer(1e-3, 1, 20)
    rng = np.random.default_rng(0)
    batches = _batches(rng, 3)

    # --- monolithic online (single device); unfused head = the same
    # composable-loss numerics the 1F1B sum-form head reassociates
    step_on = train_step.make_kd_step(cfg, dcfg, opt, mode="online_sparse",
                                      teacher_cfg=cfg, donate=False,
                                      head_loss="unfused")
    s_on = train_step.init_state(lora, opt)
    losses_on = []
    for hb in batches:
        s_on, m = step_on(s_on, base, teacher, hb)
        losses_on.append(float(m["loss"]))

    # --- disaggregated teacher (last 4 devices) + 1F1B student (first 4)
    s_devs, t_devs = disaggregate.split_devices(4)
    s_mesh = meshlib.make_mesh(MeshConfig(dp=2, pp=2), devices=s_devs)
    t_mesh = meshlib.make_mesh(MeshConfig(dp=4), devices=t_devs)
    svc = disaggregate.make_teacher_service(
        teacher, cfg, t_mesh, top_k=8, student_vocab_size=128,
        method="exact", depth=2)

    with meshlib.active_mesh(s_mesh):
        step_pre = train_step.make_kd_step(cfg_pp, dcfg, opt,
                                           mode="precomputed", donate=False,
                                           pp_schedule="1f1b")
        base_s = sharding.shard_params(s_mesh, base, cfg)
        lora_s = sharding.shard_lora(s_mesh, lora)
        st = train_step.init_state(lora_s, opt)
        st = train_step.TrainState(
            lora_s,
            sharding.shard_opt_state(s_mesh, st.opt_state,
                                     sharding.lora_pspecs(lora, pp=True)),
            jax.device_put(st.step, meshlib.replicated(s_mesh)))

        losses_dis = []
        for hb in disaggregate.pipeline_batches(iter(batches), svc):
            st, m = step_pre(st, base_s, None,
                             sharding.shard_batch(s_mesh, hb))
            losses_dis.append(float(m["loss"]))

    np.testing.assert_allclose(losses_dis, losses_on, rtol=1e-5)
    for (ka, a), (kb, b) in zip(jax.tree.leaves_with_path(s_on.trainable),
                                jax.tree.leaves_with_path(st.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4,
                                   err_msg=jax.tree_util.keystr(ka))


@pytest.mark.slow
def test_disaggregated_matches_monolithic_online():
    """3 KD steps with the teacher disaggregated onto its own 4-device mesh
    (student on the other 4, dp2 x tp2) equal monolithic online-sparse KD
    with exact extraction, step for step."""
    cfg = _f32(qwen3_tiny(128))
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    teacher = qwen3.init_params(jax.random.PRNGKey(1), cfg)
    dcfg = DistillConfig(top_k=8, online_topk_method="exact",
                         lora=LoraConfig(r=4, alpha=8,
                                         init_weights="gaussian"))
    lora, base = init_lora(jax.random.PRNGKey(2), params, cfg, dcfg.lora)
    opt = train_step.make_optimizer(1e-3, 1, 20)
    rng = np.random.default_rng(0)
    batches = _batches(rng, 3)

    # --- monolithic online (single device)
    step_on = train_step.make_kd_step(cfg, dcfg, opt, mode="online_sparse",
                                      teacher_cfg=cfg, donate=False)
    s_on = train_step.init_state(lora, opt)
    losses_on = []
    for hb in batches:
        s_on, m = step_on(s_on, base, teacher, hb)
        losses_on.append(float(m["loss"]))

    # --- disaggregated: teacher mesh (last 4), student mesh (first 4)
    s_devs, t_devs = disaggregate.split_devices(4)
    s_mesh = meshlib.make_mesh(MeshConfig(dp=2, tp=2), devices=s_devs)
    t_mesh = meshlib.make_mesh(MeshConfig(dp=4), devices=t_devs)
    svc = disaggregate.make_teacher_service(
        teacher, cfg, t_mesh, top_k=8, student_vocab_size=128,
        method="exact", depth=2)

    step_pre = train_step.make_kd_step(cfg, dcfg, opt, mode="precomputed",
                                       donate=False)
    base_s = sharding.shard_params(s_mesh, base, cfg)
    lora_s = sharding.shard_lora(s_mesh, lora)
    st = train_step.init_state(lora_s, opt)
    st = train_step.TrainState(
        lora_s, sharding.shard_opt_state(s_mesh, st.opt_state,
                                         sharding.lora_pspecs(lora)),
        jax.device_put(st.step, meshlib.replicated(s_mesh)))

    losses_dis = []
    for hb in disaggregate.pipeline_batches(iter(batches), svc):
        st, m = step_pre(st, base_s, None, sharding.shard_batch(s_mesh, hb))
        losses_dis.append(float(m["loss"]))

    np.testing.assert_allclose(losses_dis, losses_on, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_on.trainable),
                    jax.tree.leaves(st.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
