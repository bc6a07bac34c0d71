"""Fused int4 dequantize-matmul: unpack nibbles in-register on the way
into the MXU.

Why: XLA fuses the int8 convert into its dot (int8 serving beats bf16,
393 vs 311 tok/s single-stream), but the int4 unpack chain
(shift/mask/concat) defeats that fusion — XLA materializes the full bf16
weight per layer per decode step, so int4 decode paid ~4.5x bf16-weight
traffic instead of 0.5x and ran 3x SLOWER than bf16 (round-2 measurement,
the exact failure mode bnb's fused 4-bit CUDA kernels avoid; reference
usage train.py:144-153).

This kernel streams the PACKED uint8 weight (0.5 byte/param, the minimum
possible traffic) into VMEM, splits nibbles in-register, and feeds two
half-contraction dots per tile. The split-halves packing layout
(ops/quant.quantize_array_int4: high nibble = contraction row r, low =
row K/2 + r) is what makes the unpack interleave-free — the two nibble
planes are contiguous half-matrices, matched by two half-slices of x.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hi_ref, x_lo_ref, p_ref, scale_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # widen to i32 BEFORE the shift/mask: Mosaic has no i8 vector shrui
    p = p_ref[:].astype(jnp.int32)                   # [bk2, bn] from uint8
    hi = ((p >> 4) - 8).astype(jnp.bfloat16)
    lo = ((p & 0xF) - 8).astype(jnp.bfloat16)
    acc_ref[:] += (
        jnp.dot(x_hi_ref[:], hi, preferred_element_type=jnp.float32)
        + jnp.dot(x_lo_ref[:], lo, preferred_element_type=jnp.float32))

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:] * scale_ref[:]


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk2", "interpret"))
def int4_matmul(x: jax.Array, packed: jax.Array, scale: jax.Array,
                bm: int = 16, bn: int = 512, bk2: int = 256,
                interpret: bool = False) -> jax.Array:
    """y = x @ dequant_int4(packed, scale).

    x [M, K] (any float dtype; computed in bf16 operands / fp32 acc),
    packed [K/2, N] uint8 split-halves nibbles, scale [1, N] fp32
    per-output-channel. Returns [M, N] in x.dtype.

    Requires K/2 % bk2 == 0 and N % bn == 0 (true for every Qwen3
    projection at the default tiles); M is padded to the tile.
    """
    M, K = x.shape
    K2, N = packed.shape
    assert K == 2 * K2, (x.shape, packed.shape)
    assert K2 % bk2 == 0 and N % bn == 0, (K2, N, bk2, bn)
    bm = min(bm, max(16, M))
    pad_m = -M % bm
    xb = x.astype(jnp.bfloat16)
    if pad_m:
        xb = jnp.pad(xb, ((0, pad_m), (0, 0)))
    Mp = xb.shape[0]
    x_hi = xb[:, :K2]
    x_lo = xb[:, K2:]
    grid = (Mp // bm, N // bn, K2 // bk2)

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk2), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bk2), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk2, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * K * 2 + K2 * N + Mp * N * 4,
            transcendentals=0),
        interpret=interpret,
    )(x_hi, x_lo, packed, scale.astype(jnp.float32))
    return out[:M].astype(x.dtype)


def quantized_matmul(x: jax.Array, leaf: Dict[str, jax.Array],
                     interpret: bool = False) -> jax.Array:
    """``x @ dequant(leaf)`` with the fused int4 kernel when the leaf is a
    packed-int4 dict of kernel-compatible shape; otherwise falls back to
    dequantize-then-matmul. x may carry leading batch dims."""
    if "q4" in leaf and leaf["q4"].ndim == 2:
        K2, N = leaf["q4"].shape
        if K2 % 256 == 0 and N % 512 == 0:
            lead = x.shape[:-1]
            y = int4_matmul(x.reshape(-1, x.shape[-1]), leaf["q4"],
                            leaf["scale"].reshape(1, N),
                            interpret=interpret)
            return y.reshape(lead + (N,))
    from speech_distill_tpu.ops.quant import dequantize_array
    return x @ dequantize_array(leaf, x.dtype)
