"""Pipeline parallelism (parallel/pipeline.py): GPipe microbatch schedule
over the pp mesh axis must equal the unpipelined layer stack — forward,
through the full model, and through a complete KD training step."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from speech_distill_tpu.core.config import (
    DistillConfig, LoraConfig, MeshConfig, qwen3_tiny)
from speech_distill_tpu.models import qwen3
from speech_distill_tpu.parallel import mesh as meshlib
from speech_distill_tpu.parallel import sharding
from speech_distill_tpu.parallel.pipeline import pipelined_layers

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def _cfg(vocab=128, layers=4, pp_micro=0):
    cfg = qwen3_tiny(vocab)
    return type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False,
                        "num_hidden_layers": layers,
                        "pp_microbatches": pp_micro})


def test_qwen3_forward_pp2_equals_unpipelined():
    cfg = _cfg(layers=4)
    cfg_pp = _cfg(layers=4, pp_micro=4)
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, T = 8, 16
    ids = jnp.asarray(rng.integers(0, 128, (B, T)), jnp.int32)
    mask = np.ones((B, T), np.int32)
    mask[2, 12:] = 0
    mask = jnp.asarray(mask)

    ref = qwen3.forward(params, ids, cfg, attention_mask=mask)

    mesh = meshlib.make_mesh(MeshConfig(dp=2, pp=2, tp=2))
    with meshlib.active_mesh(mesh):
        params_s = sharding.shard_params(mesh, params, cfg)
        batch = sharding.shard_batch(mesh, {"ids": ids, "mask": mask},
                                     microbatched=False)
        out = jax.jit(lambda p, i, m: qwen3.forward(
            p, i, cfg_pp, attention_mask=m))(
                params_s, batch["ids"], batch["mask"])

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_qwen3_pp2_bf16_grad_compiles_and_matches():
    """bf16 activations under pp: sub-f32 psums inside the shard_map lower
    to copy-rooted ``psum_invariant`` all-reduces that crash XLA CPU's
    AllReducePromotion pass — pipeline.py routes them through f32 on CPU.
    This locks in that the forward AND backward compile and match the
    unpipelined bf16 stack."""
    cfg = _cfg(layers=4)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "bfloat16"})
    cfg_pp = type(cfg)(**{**cfg.__dict__, "pp_microbatches": 4})
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, T = 8, 16
    ids = jnp.asarray(rng.integers(0, 128, (B, T)), jnp.int32)
    mask = jnp.ones((B, T), jnp.int32)

    def loss(p, c):
        h = qwen3.forward(p, ids, c, attention_mask=mask)
        return jnp.sum(h.astype(jnp.float32) ** 2)

    ref, ref_g = jax.value_and_grad(loss)(params, cfg)

    mesh = meshlib.make_mesh(MeshConfig(dp=2, pp=2, tp=2))
    with meshlib.active_mesh(mesh):
        params_s = sharding.shard_params(mesh, params, cfg)
        out, g = jax.jit(jax.value_and_grad(
            lambda p: loss(p, cfg_pp)))(params_s)
    np.testing.assert_allclose(float(out), float(ref), rtol=2e-2)
    # bf16 grads reassociate across the microbatch split — compare in
    # relative L2 per leaf rather than elementwise (exactness at f32 is
    # covered by the other tests)
    for a, b in zip(jax.tree.leaves(ref_g), jax.tree.leaves(g)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-6)
        assert rel < 2e-2, rel


def test_pp_requires_divisible_layers_and_batch():
    mesh = meshlib.make_mesh(MeshConfig(dp=4, pp=2))
    cfg = _cfg(layers=3, pp_micro=2)      # 3 layers % pp=2 != 0
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.zeros((4, 8), jnp.int32)
    with meshlib.active_mesh(mesh):
        with pytest.raises(ValueError, match="not divisible"):
            qwen3.forward(params, ids, cfg)
        cfg2 = _cfg(layers=4, pp_micro=3)  # batch 4 % n_micro=3 != 0
        params2 = qwen3.init_params(jax.random.PRNGKey(0), cfg2)
        with pytest.raises(ValueError, match="not divisible"):
            qwen3.forward(params2, ids, cfg2)


def test_pp_and_ring_are_exclusive():
    mesh = meshlib.make_mesh(MeshConfig(dp=2, pp=2, sp=2))
    cfg = _cfg(layers=4, pp_micro=2)
    cfg = type(cfg)(**{**cfg.__dict__, "attn_impl": "ring"})
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.zeros((4, 8), jnp.int32)
    with meshlib.active_mesh(mesh):
        with pytest.raises(ValueError, match="cannot nest"):
            qwen3.forward(params, ids, cfg)


@pytest.mark.slow
def test_kd_step_dp2_pp2_tp2_matches_single_device():
    """Full online-sparse KD step with the layer stack pipelined (pp2,
    4 microbatches) over dp2 x pp2 x tp2 equals the single-device step."""
    from speech_distill_tpu.distill import train_step
    from speech_distill_tpu.distill.lora import init_lora

    cfg = _cfg(layers=4)
    cfg = type(cfg)(**{**cfg.__dict__, "remat": True})
    cfg_pp = type(cfg)(**{**cfg.__dict__, "pp_microbatches": 4})
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
        "labels": jnp.asarray(rng.integers(0, 128, (1, B, T)), jnp.int32),
    }

    step = train_step.make_kd_step(cfg, dcfg, opt, mode="online_sparse",
                                   teacher_cfg=cfg, donate=False)
    s0 = train_step.init_state(lora, opt)
    s0_after, m0 = step(s0, base, teacher, batch)

    mesh = meshlib.make_mesh(MeshConfig(dp=2, pp=2, tp=2))
    with meshlib.active_mesh(mesh):
        step_p = train_step.make_kd_step(cfg_pp, dcfg, opt,
                                         mode="online_sparse",
                                         teacher_cfg=cfg_pp, donate=False)
        base_s = sharding.shard_params(mesh, base, cfg)
        teacher_s = sharding.shard_params(mesh, teacher, cfg)
        lora_s = sharding.shard_lora(mesh, lora)
        st = train_step.init_state(lora_s, opt)
        st = train_step.TrainState(
            lora_s,
            sharding.shard_opt_state(
                mesh, st.opt_state, sharding.lora_pspecs(lora, pp=True)),
            jax.device_put(st.step, meshlib.replicated(mesh)))
        batch_s = sharding.shard_batch(mesh, batch)
        st_after, m1 = step_p(st, base_s, teacher_s, batch_s)

    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s0_after.trainable),
                    jax.tree.leaves(st_after.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# 1F1B schedule (pipelined_grads_1f1b): hand-scheduled backward must be
# gradient-exact vs the unpipelined stack's autodiff AND vs GPipe-by-autodiff
# (VERDICT-r3 #8). Activation memory accounting lives in
# scripts/pp_memory_accounting.py --schedule both.
# ---------------------------------------------------------------------------

def test_1f1b_grads_match_unpipelined_and_gpipe():
    from speech_distill_tpu.parallel.pipeline import pipelined_grads_1f1b

    cfg = _cfg(layers=4)
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    layers = params["layers"]
    D = cfg.hidden_size
    B, T, M, V = 8, 16, 4, 32
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (B, T, D)).astype(np.float32))
    W = jnp.asarray(rng.normal(0, 0.05, (D, V)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, V, (B, T)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    cos, sin = qwen3.rope_angles(positions, cfg.head_dim, cfg.rope_theta)
    bias = qwen3._causal_bias(jnp.ones((B, T), jnp.int32), B, T)

    def layer_fn(lp, h, la, c, s_, m_):
        return qwen3._layer(lp, h, c, s_, m_, cfg, la=la)[0]

    def head_fn(h, hp, aux):
        logp = jax.nn.log_softmax((h @ hp).astype(jnp.float32))
        nll = -jnp.take_along_axis(logp, aux["labels"][..., None], -1)
        return nll.mean()

    def mb_loss_sum(h, hp):
        hm = h.reshape(M, B // M, T, D)
        lm = labels.reshape(M, B // M, T)
        return sum(head_fn(hm[i], hp, {"labels": lm[i]}) for i in range(M))

    def ref_loss(lyrs, x_, hp):
        def body(carry, lp):
            return layer_fn(lp, carry, None, cos, sin, bias), None
        h, _ = jax.lax.scan(body, x_, lyrs)
        return mb_loss_sum(h, hp)

    ref_l, (g_lyr_ref, g_x_ref, g_w_ref) = jax.value_and_grad(
        ref_loss, argnums=(0, 1, 2))(layers, x, W)

    mesh = meshlib.make_mesh(MeshConfig(dp=2, pp=2, tp=2))
    with meshlib.active_mesh(mesh):
        run = jax.jit(lambda lyrs, x_, hp, lab: pipelined_grads_1f1b(
            layer_fn, lyrs, None, x_, cos, sin, bias, head_fn, hp,
            {"labels": lab}, mesh, M))
        loss, metrics, g_lyr, g_ad, g_x, g_w = run(layers, x, W, labels)
        assert metrics is None

        # GPipe-by-autodiff over the same mesh, same microbatched loss
        def gpipe_loss(lyrs, x_, hp):
            h = pipelined_layers(layer_fn, lyrs, None, x_, cos, sin,
                                 bias, mesh, M)
            return mb_loss_sum(h, hp)
        gp_l, (g_lyr_gp, g_x_gp, g_w_gp) = jax.jit(jax.value_and_grad(
            gpipe_loss, argnums=(0, 1, 2)))(layers, x, W)

    assert g_ad is None
    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
    np.testing.assert_allclose(float(loss), float(gp_l), rtol=1e-5)
    for name, got, want in [("x", g_x, g_x_ref), ("w", g_w, g_w_ref)]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-3, err_msg=name)
    for got, want, got_gp in zip(jax.tree.leaves(g_lyr),
                                 jax.tree.leaves(g_lyr_ref),
                                 jax.tree.leaves(g_lyr_gp)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(got_gp, np.float32),
                                   atol=2e-4, rtol=2e-3)


def test_kd_step_1f1b_matches_single_device():
    """Precomputed sparse-KD step under pp_schedule='1f1b' (dp2 x pp2 x tp2,
    4 microbatches) equals the single-device unfused step: loss, metrics,
    and every trainable leaf after one optimizer update. Exercises the
    embed/lm_head gradient chaining (default modules_to_save) and the
    sum-form global-denominator head (losses.sparse_distill_sums) against
    padding + ignored labels + a speech-token mask."""
    from speech_distill_tpu.distill import train_step
    from speech_distill_tpu.distill.lora import init_lora

    cfg = _cfg(layers=4)
    cfg = type(cfg)(**{**cfg.__dict__, "remat": True})
    cfg_pp = type(cfg)(**{**cfg.__dict__, "pp_microbatches": 4})
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    dcfg = DistillConfig(top_k=8,
                         lora=LoraConfig(r=4, alpha=8,
                                         init_weights="gaussian"))
    lora, base = init_lora(jax.random.PRNGKey(2), params, cfg, dcfg.lora)
    assert "embed" in lora           # modules_to_save default: embed path on
    opt = train_step.make_optimizer(1e-3, 1, 20)

    rng = np.random.default_rng(0)
    B, T, K = 8, 16, 8
    labels = rng.integers(0, 128, (1, B, T))
    labels[0, 1, :4] = -100                          # ignored prefix
    mask = np.ones((1, B, T), np.int32)
    mask[0, 3, 12:] = 0                              # right padding
    smask = np.ones((1, B, T), np.int32)
    smask[0, 5, :8] = 0                              # text positions
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, 128, (1, B, T)), jnp.int32),
        "attention_mask": jnp.asarray(mask),
        "labels": jnp.asarray(labels, jnp.int32),
        "speech_token_mask": jnp.asarray(smask),
        "teacher_top_k_v": jnp.asarray(
            rng.normal(-2, 1, (1, B, T, K)).astype(np.float32)),
        "teacher_top_k_i": jnp.asarray(
            rng.integers(0, 128, (1, B, T, K)), jnp.int32),
    }

    step = train_step.make_kd_step(cfg, dcfg, opt, mode="precomputed",
                                   donate=False, head_loss="unfused")
    s0 = train_step.init_state(lora, opt)
    s0_after, m0 = step(s0, base, None, batch)

    mesh = meshlib.make_mesh(MeshConfig(dp=2, pp=2, tp=2))
    with meshlib.active_mesh(mesh):
        step_p = train_step.make_kd_step(cfg_pp, dcfg, opt,
                                         mode="precomputed", donate=False,
                                         pp_schedule="1f1b")
        base_s = sharding.shard_params(mesh, base, cfg)
        lora_s = sharding.shard_lora(mesh, lora)
        st = train_step.init_state(lora_s, opt)
        st = train_step.TrainState(
            lora_s,
            sharding.shard_opt_state(
                mesh, st.opt_state, sharding.lora_pspecs(lora, pp=True)),
            jax.device_put(st.step, meshlib.replicated(mesh)))
        batch_s = sharding.shard_batch(mesh, batch)
        st_after, m1 = step_p(st, base_s, None, batch_s)

    for k in ("loss", "student_loss", "distill_loss", "teacher_loss"):
        np.testing.assert_allclose(float(m0[k]), float(m1[k]), rtol=1e-5,
                                   err_msg=k)
    for (ka, a), (kb, b) in zip(
            jax.tree.leaves_with_path(s0_after.trainable),
            jax.tree.leaves_with_path(st_after.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4,
                                   err_msg=jax.tree_util.keystr(ka))


def test_interleaved_schedule_tables():
    """The static interleaved-1F1B schedule: the generator self-asserts
    ring tightness (every message consumed exactly one tick later); here
    we additionally pin down slot counts, tick totals, and the V=1
    reduction to the plain 1F1B schedule."""
    from speech_distill_tpu.parallel.pipeline import _interleaved_schedule

    for S, V, M in [(2, 1, 4), (4, 1, 8), (2, 2, 4), (4, 2, 8),
                    (2, 4, 8), (4, 2, 6), (3, 2, 4), (4, 4, 16),
                    (2, 2, 1), (4, 2, 3)]:
        tb, tB0, tC0, T, K = _interleaved_schedule(S, V, M)
        assert tb["fvalid"].sum() == M * V * S
        assert tb["bvalid"].sum() == M * V * S
        assert tb["hvalid"].sum() == M
        assert tB0 == S * V - 1
        if V == 1:
            # plain 1F1B: fwd t = m + s, bwd t = m + 2(S-1) - s
            assert T == M + 2 * S - 2
            assert K == min(M, 2 * S - 1)
            for s in range(S):
                for m in range(M):
                    assert tb["fvalid"][m + s, s]
                    assert tb["fm"][m + s, s] == m
                    assert tb["bvalid"][m + 2 * (S - 1) - s, s]
        if M % S == 0:
            # full-group totals: MV + S - 1 fwd ticks, same bwd ticks
            assert tC0 == M * V + S - 1
            assert T == M * V + S * V + S - 2


def test_interleaved_grads_match_unpipelined_and_plain_1f1b():
    """Interleaved 1F1B (pp2, V=2 virtual chunks of 1 layer each, 4 then
    3 microbatches) is gradient-exact vs the unpipelined stack and vs the
    plain 1F1B schedule — including an M not divisible by S (partial
    Megatron group -> masked schedule holes)."""
    from speech_distill_tpu.parallel.pipeline import (
        pipelined_grads_1f1b, pipelined_grads_interleaved)

    cfg = _cfg(layers=4)
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    layers = params["layers"]
    D = cfg.hidden_size
    B, T, V = 12, 16, 32
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (B, T, D)).astype(np.float32))
    W = jnp.asarray(rng.normal(0, 0.05, (D, V)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, V, (B, T)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    cos, sin = qwen3.rope_angles(positions, cfg.head_dim, cfg.rope_theta)
    bias = qwen3._causal_bias(jnp.ones((B, T), jnp.int32), B, T)

    def layer_fn(lp, h, la, c, s_, m_):
        return qwen3._layer(lp, h, c, s_, m_, cfg, la=la)[0]

    def head_fn(h, hp, aux):
        logp = jax.nn.log_softmax((h @ hp).astype(jnp.float32))
        nll = -jnp.take_along_axis(logp, aux["labels"][..., None], -1)
        return nll.mean()

    def ref_loss(lyrs, x_, hp, M):
        def body(carry, lp):
            return layer_fn(lp, carry, None, cos, sin, bias), None
        h, _ = jax.lax.scan(body, x_, lyrs)
        hm = h.reshape(M, B // M, T, D)
        lm = labels.reshape(M, B // M, T)
        return sum(head_fn(hm[i], hp, {"labels": lm[i]}) for i in range(M))

    mesh = meshlib.make_mesh(MeshConfig(dp=2, pp=2, tp=2))
    for M in (4, 3):                      # 3: M % S != 0
        ref_l, (g_lyr_ref, g_x_ref, g_w_ref) = jax.value_and_grad(
            ref_loss, argnums=(0, 1, 2))(layers, x, W, M)
        with meshlib.active_mesh(mesh):
            run = jax.jit(lambda lyrs, x_, hp, lab: pipelined_grads_interleaved(
                layer_fn, lyrs, None, x_, cos, sin, bias, head_fn, hp,
                {"labels": lab}, mesh, M, 2))
            loss, metrics, g_lyr, g_ad, g_x, g_w = run(layers, x, W, labels)
            plain = jax.jit(lambda lyrs, x_, hp, lab: pipelined_grads_1f1b(
                layer_fn, lyrs, None, x_, cos, sin, bias, head_fn, hp,
                {"labels": lab}, mesh, M))
            pl_l, _, g_lyr_pl, _, g_x_pl, g_w_pl = plain(layers, x, W, labels)
        assert metrics is None and g_ad is None
        np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
        np.testing.assert_allclose(float(loss), float(pl_l), rtol=1e-5)
        for name, got, want in [("x", g_x, g_x_ref), ("w", g_w, g_w_ref),
                                ("x_pl", g_x, g_x_pl), ("w_pl", g_w, g_w_pl)]:
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-4, rtol=2e-3, err_msg=name)
        for got, want, got_pl in zip(jax.tree.leaves(g_lyr),
                                     jax.tree.leaves(g_lyr_ref),
                                     jax.tree.leaves(g_lyr_pl)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-4, rtol=2e-3)
            np.testing.assert_allclose(np.asarray(got), np.asarray(got_pl),
                                       atol=2e-4, rtol=2e-3)


def test_kd_step_1f1b_interleaved_matches_single_device():
    """Precomputed sparse-KD step under pp_schedule='1f1b' with
    pp_interleave=2 (dp2 x pp2 x tp2, 4 microbatches, 4 layers -> 2
    one-layer virtual chunks per pp rank) equals the single-device
    unfused step — the --pp_interleave CLI semantics end to end."""
    from speech_distill_tpu.distill import train_step
    from speech_distill_tpu.distill.lora import init_lora

    cfg = _cfg(layers=4)
    cfg = type(cfg)(**{**cfg.__dict__, "remat": True})
    cfg_pp = type(cfg)(**{**cfg.__dict__, "pp_microbatches": 4,
                          "pp_interleave": 2})
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    dcfg = DistillConfig(top_k=8,
                         lora=LoraConfig(r=4, alpha=8,
                                         init_weights="gaussian"))
    lora, base = init_lora(jax.random.PRNGKey(2), params, cfg, dcfg.lora)
    opt = train_step.make_optimizer(1e-3, 1, 20)

    rng = np.random.default_rng(0)
    B, T, K = 8, 16, 8
    labels = rng.integers(0, 128, (1, B, T))
    labels[0, 1, :4] = -100
    mask = np.ones((1, B, T), np.int32)
    mask[0, 3, 12:] = 0
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, 128, (1, B, T)), jnp.int32),
        "attention_mask": jnp.asarray(mask),
        "labels": jnp.asarray(labels, jnp.int32),
        "teacher_top_k_v": jnp.asarray(
            rng.normal(-2, 1, (1, B, T, K)).astype(np.float32)),
        "teacher_top_k_i": jnp.asarray(
            rng.integers(0, 128, (1, B, T, K)), jnp.int32),
    }

    step = train_step.make_kd_step(cfg, dcfg, opt, mode="precomputed",
                                   donate=False, head_loss="unfused")
    s0 = train_step.init_state(lora, opt)
    s0_after, m0 = step(s0, base, None, batch)

    mesh = meshlib.make_mesh(MeshConfig(dp=2, pp=2, tp=2))
    with meshlib.active_mesh(mesh):
        step_p = train_step.make_kd_step(cfg_pp, dcfg, opt,
                                         mode="precomputed", donate=False,
                                         pp_schedule="1f1b")
        base_s = sharding.shard_params(mesh, base, cfg)
        lora_s = sharding.shard_lora(mesh, lora)
        st = train_step.init_state(lora_s, opt)
        st = train_step.TrainState(
            lora_s,
            sharding.shard_opt_state(
                mesh, st.opt_state, sharding.lora_pspecs(lora, pp=True)),
            jax.device_put(st.step, meshlib.replicated(mesh)))
        batch_s = sharding.shard_batch(mesh, batch)
        st_after, m1 = step_p(st, base_s, None, batch_s)

    for k in ("loss", "student_loss", "distill_loss", "teacher_loss"):
        np.testing.assert_allclose(float(m0[k]), float(m1[k]), rtol=1e-5,
                                   err_msg=k)
    for (ka, a), (kb, b) in zip(
            jax.tree.leaves_with_path(s0_after.trainable),
            jax.tree.leaves_with_path(st_after.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4,
                                   err_msg=jax.tree_util.keystr(ka))


def test_kd_step_1f1b_full_finetune_matches_single_device():
    """use_lora=False under pp_schedule='1f1b': the full-finetune branch
    (grad_layers on, final_ln/embed/head grads assembled from
    g_head/g_x) matches the single-device full-finetune step."""
    from speech_distill_tpu.distill import train_step

    cfg = _cfg(layers=4)
    cfg = type(cfg)(**{**cfg.__dict__, "remat": True})
    cfg_pp = type(cfg)(**{**cfg.__dict__, "pp_microbatches": 2})
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    dcfg = DistillConfig(top_k=8)
    opt = train_step.make_optimizer(1e-3, 1, 20)

    rng = np.random.default_rng(1)
    B, T, K = 8, 16, 8
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, 128, (1, B, T)), jnp.int32),
        "attention_mask": jnp.ones((1, B, T), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 128, (1, B, T)), jnp.int32),
        "teacher_top_k_v": jnp.asarray(
            rng.normal(-2, 1, (1, B, T, K)).astype(np.float32)),
        "teacher_top_k_i": jnp.asarray(
            rng.integers(0, 128, (1, B, T, K)), jnp.int32),
    }

    step = train_step.make_kd_step(cfg, dcfg, opt, mode="precomputed",
                                   use_lora=False, donate=False,
                                   head_loss="unfused")
    s0 = train_step.init_state(params, opt)
    s0_after, m0 = step(s0, params, None, batch)

    mesh = meshlib.make_mesh(MeshConfig(dp=2, pp=2, tp=2))
    with meshlib.active_mesh(mesh):
        step_p = train_step.make_kd_step(cfg_pp, dcfg, opt,
                                         mode="precomputed", use_lora=False,
                                         donate=False, pp_schedule="1f1b")
        params_s = sharding.shard_params(mesh, params, cfg)
        st = train_step.init_state(params_s, opt)
        st = train_step.TrainState(
            params_s,
            sharding.shard_opt_state(
                mesh, st.opt_state,
                qwen3.param_pspecs(cfg, pp=True)),
            jax.device_put(st.step, meshlib.replicated(mesh)))
        batch_s = sharding.shard_batch(mesh, batch)
        st_after, m1 = step_p(st, params_s, None, batch_s)

    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    for (ka, a), (kb, b) in zip(
            jax.tree.leaves_with_path(s0_after.trainable),
            jax.tree.leaves_with_path(st_after.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4,
                                   err_msg=jax.tree_util.keystr(ka))
