"""LoRA init/merge + KD/stage-1 train step behavior."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_distill_tpu.core.config import (
    DistillConfig, LoraConfig, qwen3_tiny)
from speech_distill_tpu.distill import train_step
from speech_distill_tpu.distill.lora import init_lora, lora_scaling, merge_lora
from speech_distill_tpu.models import qwen3


def _f32(cfg):
    return type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False})


@pytest.fixture(scope="module")
def tiny():
    cfg = _f32(qwen3_tiny(128))
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _batch(cfg, B=2, T=12, A=1, K=4, seed=0, with_topk=True):
    rng = np.random.default_rng(seed)
    V = cfg.vocab_size
    ids = rng.integers(0, V, (A, B, T)).astype(np.int32)
    mask = np.ones((A, B, T), np.int32)
    labels = ids.astype(np.int64).copy()
    labels[..., :3] = -100
    batch = {"input_ids": jnp.asarray(ids),
             "attention_mask": jnp.asarray(mask),
             "labels": jnp.asarray(labels)}
    if with_topk:
        v = rng.normal(size=(A, B, T, K)).astype(np.float16) - 3
        i = rng.integers(0, V, (A, B, T, K)).astype(np.int32)
        batch["teacher_top_k_v"] = jnp.asarray(v)
        batch["teacher_top_k_i"] = jnp.asarray(i)
    return batch


# -- LoRA -------------------------------------------------------------------


def test_pissa_merge_preserves_weights(tiny):
    cfg, params = tiny
    lcfg = LoraConfig(r=8, alpha=16, init_weights="pissa")
    lora, base = init_lora(jax.random.PRNGKey(1), params, cfg, lcfg)
    merged = merge_lora(base, lora, lcfg)
    # at init, residual + scaled principal == original weight
    np.testing.assert_allclose(
        np.asarray(merged["layers"]["attn"]["q"]),
        np.asarray(params["layers"]["attn"]["q"]), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(merged["layers"]["mlp"]["down"]),
        np.asarray(params["layers"]["mlp"]["down"]), atol=1e-4)


def test_gaussian_init_zero_delta(tiny):
    cfg, params = tiny
    lcfg = LoraConfig(r=4, alpha=8, init_weights="gaussian")
    lora, base = init_lora(jax.random.PRNGKey(1), params, cfg, lcfg)
    merged = merge_lora(base, lora, lcfg)
    np.testing.assert_allclose(np.asarray(merged["layers"]["attn"]["q"]),
                               np.asarray(params["layers"]["attn"]["q"]),
                               atol=1e-6)


def test_rslora_scaling():
    assert lora_scaling(LoraConfig(r=16, alpha=32, use_rslora=False)) == 2.0
    assert lora_scaling(LoraConfig(r=16, alpha=32, use_rslora=True)) == 8.0


def test_unmerged_adapter_forward_matches_merged(tiny):
    """qwen3.forward(adapters=...) == forward(merge_lora(...)) — the
    training step's unmerged path is numerically the merged model."""
    cfg, params = tiny
    lcfg = LoraConfig(r=4, alpha=8, init_weights="pissa")
    lora, base = init_lora(jax.random.PRNGKey(1), params, cfg, lcfg)
    g = lora_scaling(lcfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (2, 12)), jnp.int32)
    mask = jnp.ones((2, 12), jnp.int32)

    merged = merge_lora(base, lora, lcfg)
    ref = qwen3.forward(merged, ids, cfg, attention_mask=mask)

    eff = dict(base)
    eff["embed"] = lora["embed"]
    if "lm_head" in lora:
        eff["lm_head"] = lora["lm_head"]
    out = qwen3.forward(eff, ids, cfg, attention_mask=mask,
                        adapters=lora["layers"], adapter_scale=g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_kd_step_unmerged_matches_merged(tiny):
    """One KD step with merge_weights=True vs False: same loss and nearly
    identical updated adapters (the unmerged path is the default)."""
    cfg, params = tiny
    dcfg = DistillConfig(lora=LoraConfig(r=4, alpha=8,
                                         init_weights="gaussian"))
    lora, base = init_lora(jax.random.PRNGKey(1), params, cfg, dcfg.lora)
    batch = _batch(cfg)
    results = {}
    for mw in (False, True):
        opt = train_step.make_optimizer(1e-2, 1, 10)
        state = train_step.init_state(lora, opt)
        step = train_step.make_kd_step(cfg, dcfg, opt, mode="precomputed",
                                       donate=False, merge_weights=mw)
        state, _ = step(state, base, None, batch)   # warmup lr=0
        state, m = step(state, base, None, batch)
        results[mw] = (float(m["loss"]), state.trainable)
    np.testing.assert_allclose(results[False][0], results[True][0],
                               rtol=1e-5)
    a_un = np.asarray(results[False][1]["layers"]["attn"]["q"]["a"])
    a_mg = np.asarray(results[True][1]["layers"]["attn"]["q"]["a"])
    np.testing.assert_allclose(a_un, a_mg, rtol=1e-3, atol=1e-5)


# -- KD step ----------------------------------------------------------------


def test_kd_split_apply_matches_monolithic(tiny):
    """split_apply=True (grad program + donated apply program) produces
    leaf-exact state and metrics vs the single-program step."""
    cfg, params = tiny
    dcfg = DistillConfig(lora=LoraConfig(r=4, alpha=8,
                                         init_weights="gaussian"))
    lora, base = init_lora(jax.random.PRNGKey(1), params, cfg, dcfg.lora)
    batch = _batch(cfg)
    opt = train_step.make_optimizer(1e-2, 1, 10)

    mono = train_step.make_kd_step(cfg, dcfg, opt, mode="precomputed",
                                   donate=False)
    split = train_step.make_kd_step(cfg, dcfg, opt, mode="precomputed",
                                    donate=True, split_apply=True)
    s_m = train_step.init_state(lora, opt)
    s_s = train_step.init_state(lora, opt)
    for _ in range(3):
        s_m, m_m = mono(s_m, base, None, batch)
        s_s, m_s = split(s_s, base, None, batch)
    assert float(m_m["loss"]) == float(m_s["loss"])
    assert float(m_m["grad_norm"]) == float(m_s["grad_norm"])
    for a, b in zip(jax.tree.leaves(s_m.trainable),
                    jax.tree.leaves(s_s.trainable)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(s_m.opt_state),
                    jax.tree.leaves(s_s.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_kd_precomputed_loss_decreases(tiny):
    cfg, params = tiny
    dcfg = DistillConfig(lora=LoraConfig(r=4, alpha=8, init_weights="gaussian"))
    lora, base = init_lora(jax.random.PRNGKey(1), params, cfg, dcfg.lora)
    opt = train_step.make_optimizer(1e-2, warmup_steps=1, total_steps=50)
    state = train_step.init_state(lora, opt)
    step = train_step.make_kd_step(cfg, dcfg, opt, mode="precomputed",
                                   donate=False)
    batch = _batch(cfg)
    state, m0 = step(state, base, None, batch)
    for _ in range(8):
        state, m = step(state, base, None, batch)
    assert float(m["loss"]) < float(m0["loss"])
    assert np.isfinite(float(m["grad_norm"]))


@pytest.mark.slow
def test_kd_online_sparse_matches_precomputed(tiny):
    """Online top-K extraction == offline extraction at fp16 tolerance."""
    cfg, params = tiny
    teacher_params = qwen3.init_params(jax.random.PRNGKey(7), cfg)
    dcfg = DistillConfig(top_k=8,
                         lora=LoraConfig(r=4, alpha=8, init_weights="gaussian"))
    lora, base = init_lora(jax.random.PRNGKey(1), params, cfg, dcfg.lora)
    opt = train_step.make_optimizer(0.0, 1, 10)  # lr=0: states stay equal
    batch = _batch(cfg, with_topk=False)

    online = train_step.make_kd_step(cfg, dcfg, opt, mode="online_sparse",
                                     teacher_cfg=cfg, donate=False)
    s1 = train_step.init_state(lora, opt)
    _, m_online = online(s1, base, teacher_params, batch)

    # offline extraction with the same teacher
    from speech_distill_tpu.distill.losses import extract_top_k
    t_logits = qwen3.forward(teacher_params, batch["input_ids"][0], cfg,
                             attention_mask=batch["attention_mask"][0])
    v, i = extract_top_k(t_logits, 8, cfg.vocab_size)
    pre = dict(batch)
    pre["teacher_top_k_v"] = v[None]
    pre["teacher_top_k_i"] = i[None]
    precomp = train_step.make_kd_step(cfg, dcfg, opt, mode="precomputed",
                                      donate=False)
    s2 = train_step.init_state(lora, opt)
    _, m_pre = precomp(s2, base, None, pre)
    np.testing.assert_allclose(float(m_online["loss"]), float(m_pre["loss"]),
                               rtol=2e-3)


@pytest.mark.slow
def test_kd_online_dense_runs(tiny):
    cfg, params = tiny
    teacher_params = qwen3.init_params(jax.random.PRNGKey(7), cfg)
    dcfg = DistillConfig(top_k=0,
                         lora=LoraConfig(r=4, alpha=8, init_weights="gaussian"))
    assert dcfg.use_dense
    lora, base = init_lora(jax.random.PRNGKey(1), params, cfg, dcfg.lora)
    opt = train_step.make_optimizer(1e-3, 1, 10)
    state = train_step.init_state(lora, opt)
    step = train_step.make_kd_step(cfg, dcfg, opt, mode="online_dense",
                                   teacher_cfg=cfg, donate=False)
    _, m = step(state, base, teacher_params, _batch(cfg, with_topk=False))
    assert np.isfinite(float(m["loss"]))
    assert float(m["teacher_loss"]) > 0


@pytest.mark.slow
def test_grad_accumulation_averages(tiny):
    """[2, B, T] microbatches == mean of two single-microbatch losses."""
    cfg, params = tiny
    dcfg = DistillConfig(lora=LoraConfig(r=4, alpha=8, init_weights="gaussian"))
    lora, base = init_lora(jax.random.PRNGKey(1), params, cfg, dcfg.lora)
    opt = train_step.make_optimizer(0.0, 1, 10)
    step = train_step.make_kd_step(cfg, dcfg, opt, mode="precomputed",
                                   donate=False)
    b2 = _batch(cfg, A=2, seed=3)
    _, m2 = step(train_step.init_state(lora, opt), base, None, b2)
    singles = []
    for a in range(2):
        ba = jax.tree.map(lambda x: x[a:a + 1], b2)
        _, m1 = step(train_step.init_state(lora, opt), base, None, ba)
        singles.append(float(m1["loss"]))
    np.testing.assert_allclose(float(m2["loss"]), np.mean(singles), rtol=1e-5)


# -- stage 1 ----------------------------------------------------------------


def test_stage1_only_new_rows_update(tiny):
    cfg, params = tiny
    old_vocab = 100
    trainable = {"embed": {"weight": params["embed"]["weight"]}}
    base = {k: v for k, v in params.items()}
    opt = train_step.make_optimizer(1e-2, 1, 10)
    state = train_step.init_state(trainable, opt)
    step = train_step.make_stage1_step(cfg, opt, old_vocab, donate=False)
    batch = _batch(cfg, with_topk=False)
    before = np.asarray(trainable["embed"]["weight"])
    state, m = step(state, base, batch)     # warmup step 0: lr=0
    state, m = step(state, base, batch)
    after = np.asarray(state.trainable["embed"]["weight"])
    np.testing.assert_array_equal(after[:old_vocab], before[:old_vocab])
    assert np.abs(after[old_vocab:] - before[old_vocab:]).max() > 0
    assert np.isfinite(float(m["loss"]))


def test_lora_linear_custom_vjp_matches_autodiff():
    """ops.lora_linear fused op: forward == merged expression, grads ==
    autodiff of the explicit expression (reassociated backward)."""
    from speech_distill_tpu.ops.lora_linear import lora_linear
    rng = np.random.default_rng(0)
    B, T, din, dout, r = 2, 5, 16, 24, 4
    x = jnp.asarray(rng.normal(size=(B, T, din)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(din, dout)), jnp.float32)
    a = jnp.asarray(rng.normal(size=(din, r)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(r, dout)), jnp.float32)
    g = 2.5

    def explicit(x, w, a, b):
        return x @ (w + (a @ b) * g)

    np.testing.assert_allclose(np.asarray(lora_linear(x, w, a, b, g)),
                               np.asarray(explicit(x, w, a, b)),
                               rtol=1e-5, atol=1e-5)

    def loss_fused(args):
        x, a, b = args
        return jnp.sum(jnp.sin(lora_linear(x, w, a, b, g)))

    def loss_ref(args):
        x, a, b = args
        return jnp.sum(jnp.sin(explicit(x, w, a, b)))

    gf = jax.grad(loss_fused)((x, a, b))
    gr = jax.grad(loss_ref)((x, a, b))
    for u, v in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   rtol=1e-4, atol=1e-4)


def test_fused_clip_adamw_matches_optax_chain():
    """fused_clip_adamw (one traversal) is leaf-exact vs
    optax.chain(clip_by_global_norm, adamw) over several steps, both under
    and over the clip threshold, with and without weight decay."""
    import optax
    for wd in (0.0, 0.01):
        sched = optax.schedules.linear_schedule(1e-3, 0.0, 10)
        ref = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8,
                        weight_decay=wd))
        fused = train_step.fused_clip_adamw(sched, weight_decay=wd,
                                            max_grad_norm=1.0)
        rng = np.random.default_rng(0)
        params = {"a": jnp.asarray(rng.normal(size=(4, 8)), jnp.float32),
                  "b": {"c": jnp.asarray(rng.normal(size=(16,)),
                                         jnp.float32)}}
        s_ref = ref.init(params)
        s_fused = fused.init(params)
        p_ref = params
        p_fused = jax.tree.map(lambda x: x, params)
        for step in range(5):
            scale = 0.01 if step % 2 == 0 else 10.0   # under / over clip
            grads = jax.tree.map(
                lambda p: jnp.asarray(
                    rng.normal(size=p.shape) * scale, jnp.float32), params)
            u_ref, s_ref = ref.update(grads, s_ref, p_ref)
            u_fused, s_fused = fused.update(grads, s_fused, p_fused)
            for a, b in zip(jax.tree.leaves(u_ref),
                            jax.tree.leaves(u_fused)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-7, rtol=1e-6)
            p_ref = optax.apply_updates(p_ref, u_ref)
            p_fused = optax.apply_updates(p_fused, u_fused)
