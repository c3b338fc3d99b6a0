"""Fused dequant-matmul Pallas kernel: y = x @ unpack(W)^T.

The hot op of the framework (SURVEY.md §3.1: the fake-quant round trip runs
on every operand of every quantized op; here packed int8 codes + per-block
f32 scales stay in HBM, dequantization happens on the VPU inside the same
kernel that feeds the MXU — no materialized fp32 weights, ~4x less HBM
traffic on the weight stream).

Numerics: BFP codes have <= 7 mantissa bits, so code*scale is EXACTLY
representable in bfloat16 — casting the dequantized tile to bf16 for the MXU
loses nothing vs the fp32 fake-quant oracle; only f32 accumulation order
differs. Parity test: kernel vs (unpack + jnp matmul) on the same operands.

Tiling: grid (M/bm, N/bn, K/bk), K innermost with accumulation into the
output tile; the scale tile [bn, bk/block] is broadcast across its block via
reshape-multiply (pure VPU). bk is a multiple of the quant block (16), 128
by default — MXU-aligned.

Fallback: on non-TPU backends (or shapes too small to tile) the same math
runs as unpack + jnp.matmul, so every config also runs on CPU
(SURVEY.md §7 layer 3 contract).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .packing import PackedBFP, unpack_block_fp


def _dequant_matmul_kernel(x_ref, codes_ref, scales_ref, o_ref, *, block: int,
                           n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    codes = codes_ref[:].astype(jnp.float32)  # [bn, bk]
    scales = scales_ref[:]  # [bn, bk // block]
    bn, bk = codes.shape
    w = (codes.reshape(bn, bk // block, block) * scales[:, :, None]).reshape(bn, bk)
    w = w.astype(jnp.bfloat16)
    x = x_ref[:].astype(jnp.bfloat16)
    o_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "interpret"))
def bfp_matmul_pallas(
    x: jax.Array,
    packed: PackedBFP,
    bm: int = 128,
    bn: int = 128,
    bk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """x [M, K] @ unpack(packed)[N, K]^T -> [M, N] (f32).

    K must equal packed.in_features and be padded to the packed stride.
    """
    m, k_dim = x.shape
    codes, scales = packed.codes, packed.scales
    n, k_padded = codes.shape
    block = packed.block_size
    if k_padded != k_dim:
        x = jnp.pad(x, ((0, 0), (0, k_padded - k_dim)))
    # shrink tiles to fit small problems (tests); keep multiples of block
    bm = min(bm, max(8, m))
    bn = min(bn, n)
    bk = min(bk, k_padded)
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), pl.cdiv(k_padded, bk))
    kernel = functools.partial(
        _dequant_matmul_kernel, block=block, n_k=grid[2]
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bn, bk), lambda i, j, k: (j, k)),
            pl.BlockSpec((bn, bk // block), lambda i, j, k: (j, k)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=interpret,
    )(x, codes, scales)


def bfp_matmul(x: jax.Array, packed: PackedBFP, use_pallas: bool | None = None,
               interpret: bool = False) -> jax.Array:
    """Dispatch: Pallas on TPU, unpack+matmul elsewhere. x: [..., K]."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    lead_shape = x.shape[:-1]
    k_dim = x.shape[-1]
    x2 = x.reshape(-1, k_dim)
    if use_pallas or interpret:
        out = bfp_matmul_pallas(x2, packed, interpret=interpret)
    else:
        w = unpack_block_fp(packed)
        out = jax.lax.dot_general(
            x2, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
    return out.reshape(*lead_shape, packed.out_features).astype(x.dtype)
