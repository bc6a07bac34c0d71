"""Trainer loop: checkpoint save/restore/resume + metrics logging."""
import json
import os
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_distill_tpu.core.checkpoint import CheckpointManager, export_hf
from speech_distill_tpu.core.config import (DistillConfig, LoraConfig,
                                            qwen3_tiny)
from speech_distill_tpu.core.trainer import LoopConfig, batches_from, train_loop
from speech_distill_tpu.data.collator import DistillCollator
from speech_distill_tpu.distill import train_step
from speech_distill_tpu.distill.lora import init_lora
from speech_distill_tpu.models import qwen3


def _f32(cfg):
    return type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False})


def _features(cfg, n=16, seed=0):
    rng = np.random.default_rng(seed)
    feats = []
    for _ in range(n):
        L = int(rng.integers(8, 14))
        ids = rng.integers(0, cfg.vocab_size, L).tolist()
        K = 4
        feats.append({
            "student_input_ids": ids,
            "student_attention_mask": [1] * L,
            "teacher_top_k_v": (rng.normal(size=(L, K)) - 2).astype(np.float16),
            "teacher_top_k_i": rng.integers(0, cfg.vocab_size,
                                            (L, K)).astype(np.int32),
        })
    return feats


@pytest.mark.slow
def test_train_loop_with_checkpoint_resume(tmp_path):
    cfg = _f32(qwen3_tiny(64))
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    dcfg = DistillConfig(lora=LoraConfig(r=4, alpha=8,
                                         init_weights="gaussian"))
    lora, base = init_lora(jax.random.PRNGKey(1), params, cfg, dcfg.lora)
    opt = train_step.make_optimizer(1e-3, 1, 100)
    state = train_step.init_state(lora, opt)
    step = train_step.make_kd_step(cfg, dcfg, opt, mode="precomputed",
                                   donate=False)

    collator = DistillCollator(pad_token_id=0, speech_bos_id=None,
                               pad_to_multiple_of=16)
    feats = _features(cfg)

    def batch_iter(epoch):
        return batches_from(feats, collator, batch_size=2, accum=2,
                            shuffle_seed=0, epoch=epoch)

    out_dir = str(tmp_path / "run")
    loop_cfg = LoopConfig(num_epochs=1, max_steps=3, logging_steps=1,
                          save_steps=2, output_dir=out_dir)
    final = train_loop(step, state, (base, None), batch_iter, loop_cfg)
    assert int(final.step) == 3

    # metrics written
    lines = [json.loads(l) for l in
             open(os.path.join(out_dir, "metrics.jsonl"))]
    assert any("loss" in l for l in lines)

    # resume continues from the saved step
    state2 = train_step.init_state(lora, opt)
    loop_cfg2 = LoopConfig(num_epochs=1, max_steps=5, logging_steps=1,
                           save_steps=2, output_dir=out_dir)
    final2 = train_loop(step, state2, (base, None), batch_iter, loop_cfg2)
    assert int(final2.step) >= 4
    # resumed trainable matches the checkpointed one, not the fresh init
    ckpt = CheckpointManager(out_dir + "/ckpt")
    restored = ckpt.restore(jax.device_get(state2))
    assert restored is not None
    ckpt.close()


def test_streaming_batches_match_materialized():
    """shuffle_buffer=None reproduces the OLD materialized implementation
    (list + rng.permutation) batch-for-batch; bounded buffers stream every
    item exactly once, deterministically per (seed, epoch)."""
    from speech_distill_tpu.core.trainer import shuffled_stream

    items = [{"x": np.asarray([i], np.int32)} for i in range(37)]

    def old_impl(seed, epoch):
        order = np.random.default_rng(seed + epoch).permutation(len(items))
        return [items[i]["x"][0] for i in order]

    for epoch in (0, 1, 2):
        got = [d["x"][0] for d in
               shuffled_stream(iter(items), shuffle_seed=5, epoch=epoch)]
        assert got == old_impl(5, epoch)

    # bounded buffer: a permutation of the stream, deterministic, and
    # different across epochs
    a = [d["x"][0] for d in shuffled_stream(iter(items), shuffle_seed=5,
                                            epoch=0, shuffle_buffer=8)]
    b = [d["x"][0] for d in shuffled_stream(iter(items), shuffle_seed=5,
                                            epoch=0, shuffle_buffer=8)]
    c = [d["x"][0] for d in shuffled_stream(iter(items), shuffle_seed=5,
                                            epoch=1, shuffle_buffer=8)]
    assert a == b
    assert sorted(a) == list(range(37))
    assert a != c and sorted(c) == list(range(37))
    # buffer >= dataset: identical to the unbounded (old materialized) order
    d_ = [d["x"][0] for d in shuffled_stream(iter(items), shuffle_seed=5,
                                             epoch=0, shuffle_buffer=64)]
    assert d_ == old_impl(5, 0)

    # host sharding: disjoint, covering split BEFORE shuffling
    h0 = [d["x"][0] for d in shuffled_stream(iter(items), host_count=2,
                                             host_index=0)]
    h1 = [d["x"][0] for d in shuffled_stream(iter(items), host_count=2,
                                             host_index=1)]
    assert sorted(h0 + h1) == list(range(37))
    assert not set(h0) & set(h1)

    # batches_from end-to-end: streaming grouping equals the old grouping
    def collate(group):
        return {"x": np.stack([g["x"] for g in group])}

    got = list(batches_from(iter(items), collate, batch_size=2, accum=3,
                            shuffle_seed=9, epoch=0))
    order = np.random.default_rng(9).permutation(len(items))
    perm = [items[i] for i in order]
    want = []
    for i in range(0, len(perm) - 5, 6):
        big = collate(perm[i:i + 6])
        want.append({k: v.reshape((3, 2) + v.shape[1:])
                     for k, v in big.items()})
    assert len(got) == len(want) == 37 // 6
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g["x"], w["x"])

    # drop_last=False repeat-pads the tail group
    tail = list(batches_from(iter(items), collate, batch_size=2, accum=3,
                             drop_last=False))
    assert len(tail) == -(-37 // 6)
    np.testing.assert_array_equal(tail[-1]["x"].reshape(-1)[:1], [36])


def test_export_hf_roundtrip(tmp_path):
    cfg = _f32(qwen3_tiny(64))
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    out = str(tmp_path / "hf")
    export_hf(jax.device_get(params), cfg, out)
    from speech_distill_tpu.models.hf_loader import load_pretrained
    cfg2, params2 = load_pretrained(out, dtype="float32")
    assert cfg2.vocab_size == cfg.vocab_size
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 64, (1, 6)))
    a = qwen3.forward(params, ids, cfg)
    b = qwen3.forward(params2, ids, cfg2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                               rtol=1e-2)
