"""Packed block-floating-point (BFP/MSFP) weight storage.

The reference only SIMULATES quantization (fp32 quantize->dequantize round
trips, reference block_fp.py:21-153). This module stores the real thing:

- ``codes``: int8 signed mantissa integers, one per element
  (sign * mantissa_int, |code| <= 2^(width-1) - 1)
- ``scales``: float32 per block, scale = 2^(shared_exponent - mantissa_bits)

so ``w = codes * scales`` reconstructs exactly the fake-quant value. HBM
footprint: 1 + 4/block_size bytes per element (4.25x smaller than fp32 at
block 16; sub-byte bit-packing is the next step down).

Pack math mirrors ``_block_fp_qdq`` bit-for-bit: per-block abs max with the
zero-block fix, exponent = clamp(ceil(log2(max))), mantissa round
half-to-even, saturation. One deliberate deviation: the fake path passes
|x| <= 1e-8 through UNquantized (reference block_fp.py:92-94's
zero-preserving STE trick); packed storage cannot represent off-grid values,
so such elements land on the nearest grid point (~0). Weights that tiny are
numerically irrelevant; the parity test pins this.

Blocking: along the LAST axis of the [out, in] weight — i.e. the reference's
``[1, bs]`` 2-D weight tiles, which is what every shipped config uses. Other
tile shapes fall back to the fake-quant path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class PackedBFP(NamedTuple):
    """Packed BFP tensor. Registered as a pytree (codes/scales are leaves)."""

    codes: jax.Array  # int8 [out, in_padded]
    scales: jax.Array  # float32 [out, in_padded // block]
    width: int  # sign + mantissa bits (static)
    block_size: int  # elements per shared exponent (static)
    out_features: int
    in_features: int  # un-padded

    @property
    def mantissa_bits(self) -> int:
        return self.width - 1


jax.tree_util.register_pytree_node(
    PackedBFP,
    lambda p: (
        (p.codes, p.scales),
        (p.width, p.block_size, p.out_features, p.in_features),
    ),
    lambda aux, leaves: PackedBFP(*leaves, *aux),
)


def effective_block_len(block_size, in_features: int) -> int | None:
    """Reference block-shape inference for a [1, bs]-style weight block.

    Returns the along-in-features block length, or None if the block shape
    is a genuine 2-D tile (unsupported by the packed path).
    """
    if isinstance(block_size, int):
        bs = [block_size]
    else:
        bs = list(block_size)
    if len(bs) >= 2 and bs[-2] not in (1, -1):
        return None
    return min(bs[-1], in_features) if bs[-1] != -1 else in_features


def pack_block_fp(
    w: jax.Array,
    width: int,
    exponent_width: int = 8,
    exponent_bias=None,
    block_size=16,
) -> PackedBFP:
    """Quantize+pack a [out, in] weight. Same grid as ``_block_fp_qdq``."""
    out_features, in_features = w.shape
    bs = effective_block_len(block_size, in_features)
    assert bs is not None, f"unsupported 2-D tile block for packing: {block_size}"

    if exponent_bias in (None, "none", "None"):
        exponent_bias = 2 ** (exponent_width - 1) - 1
    exponent_max = 2**exponent_width - 1 - exponent_bias
    exponent_min = -exponent_bias
    mantissa_bits = width - 1
    mantissa_max = 2**mantissa_bits - 1

    pad = (-in_features) % bs
    if pad:
        w = jnp.pad(w, ((0, 0), (0, pad)))
    in_padded = w.shape[1]
    nb = in_padded // bs

    blocked = w.reshape(out_features, nb, bs)
    pbm = jnp.max(jnp.abs(blocked), axis=2)
    # zero-block fix (reference block_fp.py:54-58)
    is_zero = pbm == 0
    nonzero_min = jnp.min(jnp.where(is_zero, jnp.inf, pbm))
    fill = jnp.where(jnp.isinf(nonzero_min), jnp.ones((), pbm.dtype), nonzero_min)
    pbm = jnp.where(is_zero, fill, pbm)

    exponent = jnp.clip(jnp.ceil(jnp.log2(pbm)), exponent_min, exponent_max)
    scales = jnp.exp2(exponent - mantissa_bits).astype(jnp.float32)

    sign = jnp.sign(blocked + 1e-9)
    value = jnp.abs(blocked) + 1e-9
    mant_int = jnp.clip(
        jnp.round(value / jnp.exp2(exponent)[:, :, None] * (2**mantissa_bits)),
        0,
        mantissa_max,
    )
    codes = (sign * mant_int).astype(jnp.int8).reshape(out_features, in_padded)
    return PackedBFP(codes, scales, width, bs, out_features, in_features)


def unpack_block_fp(p: PackedBFP, dtype=jnp.float32) -> jax.Array:
    """Reference dequant: w = codes * scales, sliced to the un-padded shape."""
    nb = p.codes.shape[1] // p.block_size
    w = (
        p.codes.astype(jnp.float32).reshape(p.out_features, nb, p.block_size)
        * p.scales[:, :, None]
    ).reshape(p.out_features, -1)[:, : p.in_features]
    return w.astype(dtype)


def packed_nbytes(p: PackedBFP) -> int:
    return int(np.prod(p.codes.shape)) + 4 * int(np.prod(p.scales.shape))
