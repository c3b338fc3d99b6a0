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

from ..ops.quantizers.exact import exact_exp2


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


def _bfp_encode_blocked(blocked: jax.Array, width: int, exponent_width: int,
                        exponent_bias):
    """Shared blocked-encode core: [..., nb, bs] -> (codes int8 [..., nb, bs],
    scales f32 [..., nb]). Same grid as ``_block_fp_qdq``: per-block abs max
    with the zero-block fix, exponent = clamp(ceil(log2(max))), mantissa
    round half-to-even, saturation. Tiny-value policy (ONE policy for both
    the weight and KV-cache packers): elements with |x| <= 1e-8 store code 0 —
    the packed format cannot pass off-grid values through like the
    reference's zero-preserving STE trick (reference block_fp.py:92-94).

    int8 codes require width <= 8 (|code| <= 2^(width-1)-1 <= 127); wider
    block_fp configs must stay on the fake-quant path.
    """
    assert width <= 8, f"int8 code storage requires width <= 8, got {width}"
    if exponent_bias in (None, "none", "None"):
        exponent_bias = 2 ** (exponent_width - 1) - 1
    exponent_max = 2**exponent_width - 1 - exponent_bias
    exponent_min = -exponent_bias
    mantissa_bits = width - 1
    mantissa_max = 2**mantissa_bits - 1

    pbm = jnp.max(jnp.abs(blocked), axis=-1)
    # zero-block fix (reference block_fp.py:54-58)
    is_zero = pbm == 0
    nonzero_min = jnp.min(jnp.where(is_zero, jnp.inf, pbm))
    fill = jnp.where(jnp.isinf(nonzero_min), jnp.ones((), pbm.dtype), nonzero_min)
    pbm = jnp.where(is_zero, fill, pbm)

    exponent = jnp.clip(jnp.ceil(jnp.log2(pbm)), exponent_min, exponent_max)
    # exact powers of two (XLA's exp2 drifts at large |e|, exact.py)
    scales = exact_exp2(exponent - mantissa_bits).astype(jnp.float32)

    sign = jnp.sign(blocked + 1e-9)
    value = jnp.abs(blocked) + 1e-9
    mant_int = jnp.clip(
        jnp.round(value / exact_exp2(exponent)[..., None] * (2**mantissa_bits)),
        0,
        mantissa_max,
    )
    codes = jnp.where(jnp.abs(blocked) <= 1e-8, 0.0, sign * mant_int)
    return codes.astype(jnp.int8), scales


def pack_block_fp(
    w: jax.Array,
    width: int,
    exponent_width: int = 8,
    exponent_bias=None,
    block_size=16,
    k_stride: int | None = None,
) -> PackedBFP:
    """Quantize+pack a [out, in] weight. Same grid as ``_block_fp_qdq``.

    ``k_stride``: pad the packed K axis to this multiple (must be a
    multiple of the block). The fused kernel needs its K tile (bk, 1024 by
    default) to divide the padded K — without a stride, K = 11008 (the 7B
    down_proj) only admits bk <= 256 and ran at 0.31 of HBM peak
    (tools/ktune7.py round 4). Padding is zero codes + 2.3% extra bytes;
    ``unpack_block_fp`` still slices to ``in_features``."""
    out_features, in_features = w.shape
    bs = effective_block_len(block_size, in_features)
    assert bs is not None, f"unsupported 2-D tile block for packing: {block_size}"

    pad = (-in_features) % bs
    if k_stride:
        assert k_stride % bs == 0, (k_stride, bs)
        pad = (-in_features) % k_stride
    if pad:
        w = jnp.pad(w, ((0, 0), (0, pad)))
    in_padded = w.shape[1]
    nb = in_padded // bs

    codes, scales = _bfp_encode_blocked(
        w.reshape(out_features, nb, bs), width, exponent_width, exponent_bias
    )
    return PackedBFP(
        codes.reshape(out_features, in_padded), scales, width, bs,
        out_features, in_features,
    )


def unpack_block_fp(p: PackedBFP, dtype=jnp.float32) -> jax.Array:
    """Reference dequant: w = codes * scales, sliced to the un-padded shape."""
    nb = p.codes.shape[1] // p.block_size
    w = (
        p.codes.astype(jnp.float32).reshape(p.out_features, nb, p.block_size)
        * p.scales[:, :, None]
    ).reshape(p.out_features, -1)[:, : p.in_features]
    return w.astype(dtype)


def packed_nbytes(p) -> int:
    if isinstance(p, (PackedBFPSub, PackedBFPSubT)):
        return 4 * int(np.prod(p.words.shape)) + int(np.prod(p.scales.shape))
    return int(np.prod(p.codes.shape)) + 4 * int(np.prod(p.scales.shape))


# ------------------------------------------------------- last-axis encode

def bfp_encode_lastdim(
    x: jax.Array,
    width: int,
    exponent_width: int = 8,
    exponent_bias=None,
    block_size: int = 16,
):
    """Encode BFP along the LAST axis of an arbitrary-rank tensor.

    Returns ``(codes int8 x.shape, scales f32 x.shape[:-1] + (d // bs,))``
    with ``codes * scales`` (block-broadcast) == the fake-quant value of
    ``_block_fp_qdq`` with ``[1, bs]`` blocks. Requires ``d % bs == 0``
    (true for every head_dim/block pair in the shipped configs). Elements
    with |x| <= 1e-8 store code 0 (the packed format cannot pass off-grid
    values through like the reference's zero-preserving trick,
    block_fp.py:92-94 — same documented deviation as ``pack_block_fp``).

    This is the KV-cache storage primitive: K/V codes live in HBM at
    1 byte/element + 4/bs bytes of scale instead of 4 (3.2x less decode
    cache traffic at bs=16).
    """
    d = x.shape[-1]
    assert d % block_size == 0, (d, block_size)
    nb = d // block_size
    codes, scales = _bfp_encode_blocked(
        x.reshape(x.shape[:-1] + (nb, block_size)),
        width, exponent_width, exponent_bias,
    )
    return codes.reshape(x.shape), scales


def bfp_decode_lastdim(codes: jax.Array, scales: jax.Array, block_size: int,
                       dtype=jnp.float32) -> jax.Array:
    """Inverse of ``bfp_encode_lastdim``: codes * block-broadcast scales."""
    d = codes.shape[-1]
    nb = d // block_size
    out = (
        codes.astype(jnp.float32).reshape(codes.shape[:-1] + (nb, block_size))
        * scales[..., None]
    )
    return out.reshape(codes.shape).astype(dtype)


# --------------------------------------------------------------- sub-byte

# Sub-byte bit-packed BFP: codes live ``per_word = 32 // width`` to a uint32
# word (6-bit -> 6.4 bits/element, 4-bit -> 4.0). The reference only reports
# such densities from its analytical cost model (quantized_layer_profiler.py);
# here the bits are physically laid out in HBM and unpacked on the VPU inside
# the fused dequant-matmul kernel.
#
# Layout: K is padded to packing tiles of T = per_word * 128 codes. Within a
# tile, word g (g in [0, 128)) holds codes {j*128 + g : j < per_word}, i.e.
# shift j extracts the CONTIGUOUS K-slice [j*128, (j+1)*128) of the tile.
# This column-strided interleave is what makes the kernel lane-friendly: a
# shift+mask over the word tile yields a [N, 128] slice ready for the MXU,
# with no cross-lane shuffle.

_SLICE = 128  # codes per extracted K-slice (lane width)
_SCALE_E8_BIAS = 128  # uint8 scale byte: scale = 2^(u8 - 128)


def scale_to_e8(scales: jax.Array) -> jax.Array:
    """f32 power-of-two scales -> uint8 biased exponents (2^(u8-128)).

    log2 of an exact power of two is exact (incl. f32 subnormals); a scale
    flushed to 0 upstream (XLA subnormal flush — mirrored by the native
    packer) maps to -inf and clips to byte 0, identically on both paths."""
    e = jnp.round(jnp.log2(scales))
    return jnp.clip(e + _SCALE_E8_BIAS, 0, 255).astype(jnp.uint8)


def scale_from_e8(e8: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 biased exponents -> power-of-two scales (exact bit construct)."""
    return exact_exp2(
        e8.astype(jnp.float32) - _SCALE_E8_BIAS
    ).astype(dtype)


class PackedBFPSub(NamedTuple):
    """Bit-packed BFP tensor (sub-byte codes in uint32 words).

    ``scales`` is laid out per packing tile, [n_tiles, out, tile // block],
    so the kernel's scale block keeps the full trailing dim (Mosaic requires
    the last block dim be 128-divisible OR equal to the array dim).

    Scales are stored as uint8 BIASED EXPONENTS (e8m0-style: scale =
    2^(u8 - 128); every BFP scale is a power of two, so the exponent byte is
    lossless in the entire normal range) — 1/4 the scale HBM traffic of the
    f32 layout and 0.5 bits/element at block 16 instead of 2. Exponents
    outside [-128, 127] (possible only for |w| beyond ~1e38 or scales in the
    deep-subnormal regime, far outside any real weight) clamp."""

    words: jax.Array  # uint32 [out, K_padded // per_word]
    scales: jax.Array  # uint8 [n_tiles, out, tile // block]: 2^(u8-128)
    width: int
    block_size: int
    out_features: int
    in_features: int  # un-padded

    @property
    def mantissa_bits(self) -> int:
        return self.width - 1

    @property
    def per_word(self) -> int:
        return 32 // self.width

    @property
    def tile(self) -> int:
        return self.per_word * _SLICE


jax.tree_util.register_pytree_node(
    PackedBFPSub,
    lambda p: (
        (p.words, p.scales),
        (p.width, p.block_size, p.out_features, p.in_features),
    ),
    lambda aux, leaves: PackedBFPSub(*leaves, *aux),
)


def pack_block_fp_subbyte(
    w: jax.Array,
    width: int,
    exponent_width: int = 8,
    exponent_bias=None,
    block_size=16,
) -> PackedBFPSub:
    """Quantize + bit-pack a [out, in] weight (same grid as pack_block_fp)."""
    assert 2 <= width <= 8, f"sub-byte packing needs width in [2,8], got {width}"
    out_features, in_features = w.shape
    bs = effective_block_len(block_size, in_features)
    assert bs is not None and _SLICE % bs == 0, (
        f"sub-byte packing needs a [1, bs] block with bs | {_SLICE}: {block_size}"
    )

    per_word = 32 // width
    tile = per_word * _SLICE
    pad = (-in_features) % tile
    base = pack_block_fp(
        jnp.pad(w, ((0, 0), (0, pad))) if pad else w,
        width,
        exponent_width,
        exponent_bias,
        [1, bs],
    )
    k_padded = base.codes.shape[1]
    nt = k_padded // tile
    cmax = 2 ** (width - 1) - 1
    biased = (base.codes.astype(jnp.int32) + cmax).astype(jnp.uint32)
    # [out, nt, per_word, SLICE]: word g of tile t = sum_j biased[t, j, g] << (w*j)
    biased = biased.reshape(out_features, nt, per_word, _SLICE)
    shifts = (width * jnp.arange(per_word, dtype=jnp.uint32))[None, None, :, None]
    words = jnp.sum(biased << shifts, axis=2, dtype=jnp.uint32)
    scales = scale_to_e8(
        base.scales.reshape(out_features, nt, tile // bs).transpose(1, 0, 2)
    )
    return PackedBFPSub(
        words.reshape(out_features, nt * _SLICE),
        scales,
        width,
        bs,
        out_features,
        in_features,
    )


class PackedBFPSubT(NamedTuple):
    """Bit-packed BFP tensor, TRANSPOSED layout: K on SUBLANES (rows), out
    features on lanes (cols). The round-5 shipping weight format.

    Why: dequantizing the lane-major layout needs per-block scales expanded
    along the LANE axis, where Mosaic's only primitive is a one-hot MXU dot
    whose K=nb pads to a full MXU pass — measured ~42% of the big-N kernel
    time at decode M (tools/ksub.py: gate_up 250us vs 146us with the
    expansion knocked out). With K on sublanes the expansion is
    ``jnp.repeat(scales, block, axis=0)`` — effectively free
    (tools/kexp.py) — and the main dot is a standard A@B contraction
    (x lanes x w sublanes). gate_up measured 250 -> 172us (0.60 of HBM
    peak) on chip.

    ``words``: row r of packing tile t (rows t*SLICE..) packs per_word
    codes; shift j extracts K-slice rows [t*tile + j*SLICE, ...+SLICE).
    ``scales``: row t*(tile//block) + b = the [1, block] K-block b of tile
    t, as uint8 biased exponents (2^(u8-128), see PackedBFPSub)."""

    words: jax.Array  # uint32 [K_padded // per_word, out]
    scales: jax.Array  # uint8 [K_padded // block, out]: 2^(u8-128)
    width: int
    block_size: int
    out_features: int
    in_features: int  # un-padded

    @property
    def mantissa_bits(self) -> int:
        return self.width - 1

    @property
    def per_word(self) -> int:
        return 32 // self.width

    @property
    def tile(self) -> int:
        return self.per_word * _SLICE


jax.tree_util.register_pytree_with_keys(
    PackedBFPSubT,
    lambda p: (
        (("words_t", p.words), ("scales_t", p.scales)),
        (p.width, p.block_size, p.out_features, p.in_features),
    ),
    lambda aux, leaves: PackedBFPSubT(*leaves, *aux),
)


def transpose_subbyte(p: PackedBFPSub, xp=jnp) -> PackedBFPSubT:
    """PackedBFPSub -> the transposed layout (pure transposes, bit-identical
    content). ``xp=np`` keeps host-packed numpy leaves on the host."""
    words_t = xp.ascontiguousarray(p.words.T) if xp is not jnp else p.words.T
    nt, out, spb = p.scales.shape  # [n_tiles, out, tile // block]
    scales_t = p.scales.transpose(0, 2, 1).reshape(nt * spb, out)
    if xp is not jnp:
        scales_t = xp.ascontiguousarray(scales_t)
    return PackedBFPSubT(
        words_t, scales_t, p.width, p.block_size, p.out_features,
        p.in_features,
    )


def pack_block_fp_subbyte_t(
    w: jax.Array,
    width: int,
    exponent_width: int = 8,
    exponent_bias=None,
    block_size=16,
) -> PackedBFPSubT:
    """Quantize + bit-pack a [out, in] weight into the transposed layout."""
    return transpose_subbyte(
        pack_block_fp_subbyte(w, width, exponent_width, exponent_bias,
                              block_size)
    )


def unpack_block_fp_subbyte_t(p: PackedBFPSubT, dtype=jnp.float32) -> jax.Array:
    """Reference dequant of the transposed format (CPU/fallback path)."""
    nw, out = p.words.shape
    per_word, width = p.per_word, p.width
    nt = nw // _SLICE
    words = p.words.reshape(nt, 1, _SLICE, out)
    shifts = (width * jnp.arange(per_word, dtype=jnp.uint32))[
        None, :, None, None
    ]
    mask = jnp.uint32(2**width - 1)
    cmax = 2 ** (width - 1) - 1
    codes = ((words >> shifts) & mask).astype(jnp.int32) - cmax
    codes = codes.reshape(nt * per_word * _SLICE, out)  # [K_padded, out]
    nb = codes.shape[0] // p.block_size
    scales = scale_from_e8(p.scales)  # [nb, out]
    wt = (
        codes.astype(jnp.float32).reshape(nb, p.block_size, out)
        * scales[:, None, :]
    ).reshape(-1, out)[: p.in_features]
    return wt.T.astype(dtype)


def unpack_block_fp_subbyte(p: PackedBFPSub, dtype=jnp.float32) -> jax.Array:
    """Reference dequant of the bit-packed format (CPU/fallback path)."""
    out, nw = p.words.shape
    per_word, width = p.per_word, p.width
    nt = nw // _SLICE
    words = p.words.reshape(out, nt, 1, _SLICE)
    shifts = (width * jnp.arange(per_word, dtype=jnp.uint32))[None, None, :, None]
    mask = jnp.uint32(2**width - 1)
    cmax = 2 ** (width - 1) - 1
    codes = ((words >> shifts) & mask).astype(jnp.int32) - cmax
    codes = codes.reshape(out, nt * per_word * _SLICE)
    nb = codes.shape[1] // p.block_size
    scales = scale_from_e8(p.scales).transpose(1, 0, 2).reshape(out, nb)
    w = (
        codes.astype(jnp.float32).reshape(out, nb, p.block_size)
        * scales[:, :, None]
    ).reshape(out, -1)[:, : p.in_features]
    return w.astype(dtype)
