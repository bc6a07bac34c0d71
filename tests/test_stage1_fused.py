"""Stage-1 step with fused CE == materialized CE (values + updates)."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from speech_distill_tpu.core.config import qwen3_tiny
from speech_distill_tpu.distill import train_step
from speech_distill_tpu.models import qwen3


@pytest.mark.slow
def test_stage1_fused_matches_plain():
    cfg = qwen3_tiny(96)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False})
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    trainable = {"embed": {"weight": params["embed"]["weight"]}}
    base = dict(params)
    rng = np.random.default_rng(0)
    B, T = 2, 12
    ids = rng.integers(0, 96, (1, B, T)).astype(np.int32)
    labels = ids.astype(np.int64).copy()
    labels[..., :2] = -100
    batch = {"input_ids": jnp.asarray(ids),
             "attention_mask": jnp.ones((1, B, T), jnp.int32),
             "labels": jnp.asarray(labels)}

    results = {}
    for name, kw in [("plain", {}),
                     ("fused_xla", dict(fused_loss=True)),
                     ("fused_pallas", dict(fused_loss=True,
                                           fused_backend="pallas"))]:
        opt = train_step.make_optimizer(1e-2, 1, 10)
        step = train_step.make_stage1_step(cfg, opt, 48, donate=False, **kw)
        st = train_step.init_state(trainable, opt)
        st, m1 = step(st, base, batch)
        st, m2 = step(st, base, batch)
        results[name] = (float(m1["loss"]), float(m2["loss"]),
                         np.asarray(st.trainable["embed"]["weight"]))

    for name in ("fused_xla",):
        np.testing.assert_allclose(results[name][0], results["plain"][0],
                                   rtol=1e-5)
        np.testing.assert_allclose(results[name][1], results["plain"][1],
                                   rtol=1e-4)
        np.testing.assert_allclose(results[name][2], results["plain"][2],
                                   atol=1e-4)
