"""8-bit AdamW: trajectory close to fp32 AdamW, state actually int8."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from speech_distill_tpu.distill.optim8bit import adamw_8bit, scale_by_adam_8bit


def _run(opt, steps=50, seed=0):
    rng = np.random.default_rng(seed)
    target = jnp.asarray(rng.normal(size=(37, 19)), jnp.float32)
    params = {"w": jnp.zeros((37, 19), jnp.float32)}
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss(p):
            return jnp.mean((p["w"] - target) ** 2)
        g = jax.grad(loss)(params)
        updates, state2 = opt.update(g, state, params)
        return optax.apply_updates(params, updates), state2

    for _ in range(steps):
        params, state = step(params, state)
    return params, state, target


def test_adam8bit_converges_like_fp32():
    p8, s8, target = _run(adamw_8bit(1e-1))
    pf, _, _ = _run(optax.chain(optax.clip_by_global_norm(1.0),
                                optax.adam(1e-1)))
    err8 = float(jnp.mean(jnp.abs(p8["w"] - target)))
    errf = float(jnp.mean(jnp.abs(pf["w"] - target)))
    assert err8 < 0.25
    assert abs(err8 - errf) < 0.1


def test_state_is_int8():
    opt = scale_by_adam_8bit()
    params = {"w": jnp.zeros((100, 10), jnp.float32)}
    state = opt.init(params)
    assert jax.tree.leaves(state.mu_q)[0].dtype == jnp.int8
    assert jax.tree.leaves(state.nu_q)[0].dtype == jnp.uint8
    # moment storage ~1 byte/param + scales
    nbytes = sum(x.size * x.dtype.itemsize for x in
                 jax.tree.leaves((state.mu_q, state.nu_q, state.mu_scale,
                                  state.nu_scale)))
    assert nbytes < 1000 * 2 * 1.1 + 64


def test_gradient_actually_flows():
    opt = adamw_8bit(1e-2)
    params = {"w": jnp.ones((8, 8), jnp.float32)}
    state = opt.init(params)
    g = {"w": jnp.ones((8, 8), jnp.float32)}
    updates, _ = opt.update(g, state, params)
    assert float(jnp.abs(updates["w"]).max()) > 0
