"""int8/int4 weight-only teacher quantization."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_distill_tpu.core.config import DistillConfig, qwen3_tiny
from speech_distill_tpu.models import qwen3
from speech_distill_tpu.ops import quant


def test_int8_roundtrip_accuracy():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(4, 64, 32)), jnp.float32)
    q = quant.quantize_array_int8(w)
    back = quant.dequantize_array(q, jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(w))
    # max error bounded by half a quantization step per output channel
    step = np.asarray(q["scale"])
    assert (err <= step / 2 + 1e-6).all()


def test_int4_pack_unpack_exact():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(2, 8, 6)), jnp.float32)
    q = quant.quantize_array_int4(w)
    assert q["q4"].shape == (2, 4, 6)
    back = quant.dequantize_array(q, jnp.float32)
    # requantizing the dequantized values must be a fixed point
    q2 = quant.quantize_array_int4(back)
    np.testing.assert_array_equal(np.asarray(q["q4"]), np.asarray(q2["q4"]))


@pytest.mark.slow
def test_quantized_teacher_forward_close_to_fp():
    cfg = qwen3_tiny(128)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False})
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_params(params, bits=8)

    ids = jnp.asarray(np.random.default_rng(2).integers(0, 128, (2, 10)))
    full = qwen3.forward(params, ids, cfg)
    quantized = qwen3.forward(qparams, ids, cfg)
    # logits stay correlated and close in logprob space
    lp_f = jax.nn.log_softmax(full, axis=-1)
    lp_q = jax.nn.log_softmax(quantized, axis=-1)
    assert float(jnp.abs(lp_f - lp_q).mean()) < 0.1
    # int8 params use ~4x less memory than fp32 (scales are tiny)
    assert quant.param_bytes(qparams) < 0.3 * quant.param_bytes(params)


def test_quantized_forces_dense():
    assert DistillConfig(teacher_quant="int8").use_dense
    assert DistillConfig(teacher_quant="int4").use_dense
    assert not DistillConfig(teacher_quant="none", top_k=128).use_dense
