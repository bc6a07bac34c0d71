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


def test_nf4_codebook_is_qlora_grid():
    """The 16 constants are the published QLoRA normal-float values."""
    code = np.asarray(quant.NF4_CODE)
    assert code.shape == (16,)
    assert code[0] == -1.0 and code[-1] == 1.0 and code[7] == 0.0
    assert (np.diff(code) > 0).all()
    # spot-check the exact published constants
    np.testing.assert_allclose(code[1], -0.6961928009986877)
    np.testing.assert_allclose(code[8], 0.07958029955625534)
    np.testing.assert_allclose(code[14], 0.7229568362236023)


def test_nf4_roundtrip_and_beats_symmetric_int4():
    """On N(0, sigma) weights the normal-float grid must beat the uniform
    symmetric int4 grid (the whole point of nf4; VERDICT #5)."""
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=(4, 128, 256)) * 0.02, jnp.float32)
    nf = quant.quantize_array_nf4(w, double_quant=False)
    assert nf["nf4"].shape == (4, 128, 128)
    back_nf = quant.dequantize_array(nf, jnp.float32)
    back_i4 = quant.dequantize_array(quant.quantize_array_int4(w),
                                     jnp.float32)
    mse_nf = float(jnp.mean((back_nf - w) ** 2))
    mse_i4 = float(jnp.mean((back_i4 - w) ** 2))
    assert mse_nf < mse_i4, (mse_nf, mse_i4)
    # relative RMS error in the nf4 ballpark (~5-10% for gaussian weights)
    rel = (mse_nf ** 0.5) / float(jnp.std(w))
    assert rel < 0.12, rel


def test_nf4_double_quant_close_and_smaller():
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.normal(size=(2, 128, 512)) * 0.05, jnp.float32)
    plain = quant.quantize_array_nf4(w, double_quant=False)
    dq = quant.quantize_array_nf4(w, double_quant=True)
    b_plain = quant.dequantize_array(plain, jnp.float32)
    b_dq = quant.dequantize_array(dq, jnp.float32)
    # nested absmax quantization adds only a small extra error
    extra = float(jnp.abs(b_dq - b_plain).max())
    scale = float(jnp.abs(w).max())
    assert extra < 0.02 * scale, (extra, scale)
    # and stores absmax in ~1/4 the bytes (int8 vs fp32, plus tiny scales)
    def absmax_bytes(p):
        return sum(v.size * v.dtype.itemsize for k, v in p.items()
                   if k != "nf4")
    assert absmax_bytes(dq) < 0.5 * absmax_bytes(plain)


def test_nf4_stacked_matches_per_layer():
    """The [L, K, D] layer-scan layout must quantize each layer exactly as
    the unstacked [K, D] tensor would (scan-sliced dequant correctness)."""
    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.normal(size=(3, 64, 128)), jnp.float32)
    stacked = quant.quantize_array_nf4(w, double_quant=True)
    for l in range(3):
        single = quant.quantize_array_nf4(w[l], double_quant=True)
        sliced = {k: v[l] for k, v in stacked.items()}
        np.testing.assert_array_equal(np.asarray(sliced["nf4"]),
                                      np.asarray(single["nf4"]))
        np.testing.assert_allclose(
            np.asarray(quant.dequantize_array(sliced, jnp.float32)),
            np.asarray(quant.dequantize_array(single, jnp.float32)),
            rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_nf4_teacher_forward_close_to_fp():
    cfg = qwen3_tiny(128)
    cfg = type(cfg)(**{**cfg.__dict__, "dtype": "float32", "remat": False})
    params = qwen3.init_params(jax.random.PRNGKey(0), cfg)
    qparams = quant.quantize_params(params, bits=4)   # auto -> nf4

    ids = jnp.asarray(np.random.default_rng(2).integers(0, 128, (2, 10)))
    full = qwen3.forward(params, ids, cfg)
    quantized = qwen3.forward(qparams, ids, cfg)
    lp_f = jax.nn.log_softmax(full, axis=-1)
    lp_q = jax.nn.log_softmax(quantized, axis=-1)
    assert float(jnp.abs(lp_f - lp_q).mean()) < 0.25


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


def test_int4_fused_matmul_matches_dequant():
    """Pallas fused dequant-matmul (interpret mode on CPU) == XLA
    dequantize-then-matmul, across M padding and leading batch dims."""
    from speech_distill_tpu.ops.quant_matmul import (int4_matmul,
                                                     quantized_matmul)
    rng = np.random.default_rng(3)
    K, N = 1024, 512
    w = rng.normal(size=(K, N)).astype(np.float32)
    leaf = quant.quantize_array_int4(jnp.asarray(w))
    deq = quant.dequantize_array(leaf, jnp.float32)

    # fp32 reference: the kernel's only rounding is the bf16 cast of x
    # (the unpacked int grid and the fp32 scale are exact in the kernel,
    # unlike the XLA path's lossy bf16 weight materialization)
    deq32 = np.asarray(deq, np.float32)

    for M in (1, 3, 16, 33):
        x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
        want = np.asarray(x.astype(jnp.bfloat16), np.float32) @ deq32
        got = np.asarray(int4_matmul(x, leaf["q4"],
                                     leaf["scale"].reshape(1, N),
                                     interpret=True))
        np.testing.assert_allclose(got, want, atol=0.5, rtol=2e-2)

    # leading batch dims through quantized_matmul
    x3 = jnp.asarray(rng.normal(size=(2, 5, K)), jnp.float32)
    got = np.asarray(quantized_matmul(x3, leaf, interpret=True))
    want = (np.asarray(x3.astype(jnp.bfloat16), np.float32).reshape(-1, K)
            @ deq32).reshape(2, 5, N)
    np.testing.assert_allclose(got, want, atol=0.5, rtol=2e-2)
