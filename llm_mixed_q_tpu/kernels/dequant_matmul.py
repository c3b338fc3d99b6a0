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
from jax.experimental.pallas import tpu as pltpu

from .packing import (
    _SLICE,
    PackedBFP,
    PackedBFPSub,
    PackedBFPSubT,
    unpack_block_fp,
    unpack_block_fp_subbyte,
    unpack_block_fp_subbyte_t,
)


def _expand_scales(scales, block: int, width: int = 0, dtype=jnp.float32):
    """[bn, nb] per-block scales -> [bn, nb*block] per-lane, via a one-hot
    expansion matmul (Mosaic rejects the lane-splitting reshape+broadcast;
    a [bn, nb] @ [nb, nb*block] dot is natively supported and cheap).

    ``dtype=bfloat16`` runs the one-hot dot at the MXU's bf16 rate — exact
    for power-of-two scales (1-bit mantissa) against a 0/1 matrix."""
    nb = scales.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, nb * block), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, nb * block), 1)
    expand = (cols // block == rows).astype(dtype)
    # acc must be 32-bit on the MXU (Mosaic rejects bf16 acc); the cast back
    # is exact — each output is a single scale x 1 product
    return jax.lax.dot_general(
        scales.astype(dtype), expand, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype)


def _qdq_lanes_signed(x, bs: int, width: int, exponent_width: int,
                      exponent_bias, interpret: bool):
    """block_fp qdq of x [rows, K] with [1, bs] blocks along the LANE axis —
    the data_in activation quantizer folded into the kernel (VERDICT r3 #1:
    it ran as XLA ops between pallas calls). Mirrors ``_block_fp_qdq``
    exactly: same epsilons, ceil-log2 exponent clip, round-half-even
    mantissa, |x| <= 1e-8 passthrough. The per-block abs max runs as an XOR
    butterfly over lanes (log2(bs) roll/max steps — no lane-splitting
    reshape); a zero block hits the passthrough so the zero-fill of the
    reference's block max is output-irrelevant here."""
    from jax.experimental.pallas import tpu as _pltpu

    if exponent_bias in (None, "none", "None"):
        exponent_bias = 2 ** (exponent_width - 1) - 1
    mantissa_bits = width - 1
    shift = float(2**mantissa_bits)
    mantissa_max = float(2**mantissa_bits - 1)
    emax = float(2**exponent_width - 1 - exponent_bias)
    emin = float(-exponent_bias)

    a = jnp.abs(x)
    pm = a
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < min(bs, x.shape[1]):
        if interpret:
            fwd = jnp.roll(pm, s, axis=1)
            bwd = jnp.roll(pm, -s, axis=1)
        else:
            fwd = _pltpu.roll(pm, s % x.shape[1], axis=1)
            bwd = _pltpu.roll(pm, (-s) % x.shape[1], axis=1)
        high = (lane // s) % 2 == 1
        pm = jnp.maximum(pm, jnp.where(high, fwd, bwd))
        s *= 2

    exponent = jnp.clip(jnp.ceil(jnp.log2(pm)), emin, emax)
    ei = jnp.clip(exponent.astype(jnp.int32), -126, 127)
    two_e = jax.lax.bitcast_convert_type((ei + 127) << 23, jnp.float32)
    sign = jnp.sign(x + 1e-9)
    # power-of-two divide as exact inverse multiplies (vector divide is
    # many-cycle on the VPU). -ei can reach -127 (subnormal, which the bit
    # construction cannot build), so split the exponent across two normal-
    # range multipliers; every step is an exact power-of-two scaling, and
    # underflow flushes match the division path's.
    e1 = ei // 2
    inv1 = jax.lax.bitcast_convert_type((127 - e1) << 23, jnp.float32)
    inv2 = jax.lax.bitcast_convert_type(
        (127 - (ei - e1)) << 23, jnp.float32
    )
    mant = jnp.clip(jnp.round(((a + 1e-9) * inv1) * (inv2 * shift)), 0.0,
                    mantissa_max)
    q = sign * two_e * (mant * (1.0 / shift))
    return jnp.where(a <= 1e-8, x, q)


def _dequant_matmul_kernel(x_ref, codes_ref, scales_ref, o_ref, *, block: int,
                           n_k: int, actq=None, interpret: bool = False):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    # bf16 dequant arithmetic: int8 code and power-of-2 scale are both exact
    # in bf16 (<= 7 mantissa bits), and so is their product — cheaper on the
    # VPU than the f32 path (tools/kvariants.py: bit-exact, ~8% faster)
    codes = codes_ref[:].astype(jnp.bfloat16)  # [bn, bk]
    scales = scales_ref[0]  # [bn, bk // block]
    # bf16 one-hot expand: BFP scales are powers of two (exact in bf16) and
    # the f32 expand dot ran ~6x the main dot's MXU passes at decode M
    w = codes * _expand_scales(
        scales.astype(jnp.bfloat16), block, dtype=jnp.bfloat16
    )
    x = x_ref[:]
    if actq is not None:
        x = _qdq_lanes_signed(x, *actq, interpret)
    o_ref[:] += jax.lax.dot_general(
        x.astype(jnp.bfloat16), w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _tpu_params(m, n, k_padded, weight_bytes, interpret):
    """Grid-dim semantics + cost estimate: lets Mosaic pipeline the
    (parallel, parallel, arbitrary) grid and schedule DMAs against the
    true bytes moved (on-chip tuning: tools/ktune.py rotation benchmark)."""
    if interpret:
        return {}
    return dict(
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k_padded,
            bytes_accessed=weight_bytes + m * k_padded * 4 + m * n * 4,
            transcendentals=0,
        ),
    )


@functools.partial(
    jax.jit, static_argnames=("bm", "bn", "bk", "interpret", "actq")
)
def bfp_matmul_pallas(
    x: jax.Array,
    packed: PackedBFP,
    bm: int = 128,
    bn: int = 1024,
    bk: int = 1024,
    interpret: bool = False,
    actq: tuple | None = None,
) -> jax.Array:
    """x [M, K] @ unpack(packed)[N, K]^T -> [M, N] (f32).

    K must equal packed.in_features and be padded to the packed stride.
    ``actq = (bs, width, exponent_width, exponent_bias)``: quantize the x
    tile in-kernel (block_fp [1, bs] data_in grid) instead of upstream.
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
    # bk must divide K (per-tile scale layout) and be lane-aligned (128) —
    # otherwise fall back to a single K step over the full dimension
    if k_padded % 128 or k_padded < 128:
        bk = k_padded
    else:
        bk = min(bk - bk % 128, k_padded)
        while k_padded % bk:
            bk -= 128
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), k_padded // bk)
    kernel = functools.partial(
        _dequant_matmul_kernel, block=block, n_k=grid[2], actq=actq,
        interpret=interpret,
    )
    # per-K-tile scale layout [n_k, N, bk // block]: Mosaic needs the block's
    # last dim 128-divisible or equal to the array dim; this makes it equal
    scales = scales.reshape(n, grid[2], bk // block).transpose(1, 0, 2)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bn, bk), lambda i, j, k: (j, k)),
            pl.BlockSpec((1, bn, bk // block), lambda i, j, k: (k, j, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=interpret,
        **_tpu_params(m, n, k_padded, codes.size + scales.size * 4, interpret),
    )(x, codes, scales)


def _subbyte_kernel(x_ref, words_ref, scales_ref, o_ref, *, width: int,
                    per_word: int, block: int, tps: int = 1, actq=None,
                    interpret: bool = False):
    """``tps`` packing tiles of K per grid step.

    Round-4 restructure (VERDICT r3 weak #5: the per-slice loop ran
    per_word expansion dots + per_word K=128 main dots and was
    VPU/MXU-dispatch-bound, 25% slower than int8):

    1. ONE scale decode: uint8 biased exponents -> bf16 powers of two via
       bit construction ((e+127)<<23 bitcast), no transcendentals.
    2. ONE one-hot expansion dot in bf16 over the whole tile
       ([bn, tile/block] @ [tile/block, tile]).
    3. per_word shift+mask extracts concatenated along lanes into a single
       [bn, tile] code plane (column-strided layout: slice j IS the
       contiguous K-range [j*128, (j+1)*128) — no cross-lane shuffle).
    4. ONE MXU dot with K = tile (640 at w6 vs 5 K=128 dots before).

    All dequant products are exact in bf16 (<= 7-bit codes x power-of-two
    scales); accumulation stays f32 on the MXU.

    Round-5 addition ``tps`` (tiles per grid step): the big-N 7B shapes
    (qkv N=12288, gate_up N=22016) measured ~0.4 of HBM peak with flat
    response to bn (VERDICT r4 weak #6) — per-grid-step cost, and the
    [bn, SLICE] word block is a STRIDED read (512-byte rows). Folding tps
    K-tiles into one step makes each word DMA tps x longer-rowed (tps=nt
    = fully contiguous rows) and amortizes the step overhead; the tps
    dequanted tiles concatenate along lanes into ONE MXU dot of
    K = tps*tile."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    words = words_ref[:]  # uint32 [bn, tps * SLICE]
    x = x_ref[:]  # [bm, tps * tile]
    mask = jnp.uint32(2**width - 1)
    cmax = 2 ** (width - 1) - 1
    parts = []
    for t in range(tps):
        e8 = scales_ref[t]  # uint8 [bn, tile // block] biased exponents
        # scale = 2^(e8 - 128): bit-construct the f32 (normal-range
        # exponents; clamp guards deep-subnormal / overflow bytes), cast
        # bf16 (exact)
        ei = jnp.clip(e8.astype(jnp.int32) - 128, -126, 127)
        s = jax.lax.bitcast_convert_type((ei + 127) << 23, jnp.float32)
        sexp = _expand_scales(
            s.astype(jnp.bfloat16), block, dtype=jnp.bfloat16
        )
        wslice = words[:, t * _SLICE : (t + 1) * _SLICE]
        codes = jnp.concatenate(
            [
                ((wslice >> jnp.uint32(width * j)) & mask).astype(jnp.int32)
                for j in range(per_word)
            ],
            axis=1,
        )  # int32 [bn, tile] in K order
        parts.append((codes - cmax).astype(jnp.bfloat16) * sexp)
    w = parts[0] if tps == 1 else jnp.concatenate(parts, axis=1)
    if actq is not None:
        x = _qdq_lanes_signed(x, *actq, interpret)
    o_ref[:] += jax.lax.dot_general(
        x.astype(jnp.bfloat16), w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(
    jax.jit, static_argnames=("bm", "bn", "tps", "interpret", "actq")
)
def bfp_matmul_subbyte_pallas(
    x: jax.Array,
    packed: PackedBFPSub,
    bm: int = 256,
    bn: int = 2048,
    tps: int = 1,
    interpret: bool = False,
    actq: tuple | None = None,
) -> jax.Array:
    """x [M, K] @ unpack(packed)[N, K]^T -> [M, N] (f32), bit-packed weights.

    ``tps``: packing tiles of K per grid step (see ``_subbyte_kernel``).
    The round-5 on-chip sweep (tools/ktune7.py, tools/ksub.py) found tps>1
    at best neutral — the big-N cost is the one-hot scale-expansion dot,
    not DMA contiguity — so the default stays 1; the transposed format
    (``bfp_matmul_subbyte_t_pallas``) is the actual fix."""
    m, k_dim = x.shape
    words, scales = packed.words, packed.scales
    n = words.shape[0]
    tile, per_word, block = packed.tile, packed.per_word, packed.block_size
    k_padded = (words.shape[1] // _SLICE) * tile
    if k_padded != k_dim:
        x = jnp.pad(x, ((0, 0), (0, k_padded - k_dim)))
    nt = k_padded // tile
    bm = min(bm, max(8, m))
    bn = min(bn, n)
    if nt % tps:
        tps = 1
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), nt // tps)
    kernel = functools.partial(
        _subbyte_kernel, width=packed.width, per_word=per_word, block=block,
        tps=tps, actq=actq, interpret=interpret,
    )
    kwargs = _tpu_params(
        m, n, k_padded, words.size * 4 + scales.size, interpret
    )
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, tps * tile), lambda i, j, k: (i, k)),
            pl.BlockSpec((bn, tps * _SLICE), lambda i, j, k: (j, k)),
            pl.BlockSpec((tps, bn, tile // block),
                         lambda i, j, k: (k, j, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(x, words, scales)


def _subbyte_t_kernel(x_ref, words_ref, scales_ref, o_ref, *, width: int,
                      per_word: int, block: int, actq=None,
                      interpret: bool = False):
    """Transposed-layout sub-byte kernel: K on SUBLANES (see
    packing.PackedBFPSubT). Scale expansion is a sublane ``jnp.repeat``
    (no MXU pass); extracted slices concatenate along sublanes; the main
    dot is x [bm, tile] @ w [tile, bn] — A@B, K on x's lanes and w's
    sublanes. On-chip at 7B decode shapes this lifts gate_up/qkv from
    ~0.40 to ~0.60 of HBM peak (tools/ksub.py round 5)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    words = words_ref[:]  # uint32 [SLICE, bn]
    x = x_ref[:]  # [bm, tile]
    e8 = scales_ref[:]  # uint8 [tile // block, bn]
    mask = jnp.uint32(2**width - 1)
    cmax = 2 ** (width - 1) - 1
    ei = jnp.clip(e8.astype(jnp.int32) - 128, -126, 127)
    s = jax.lax.bitcast_convert_type((ei + 127) << 23, jnp.float32)
    sexp = jnp.repeat(s, block, axis=0).astype(jnp.bfloat16)  # [tile, bn]
    codes = jnp.concatenate(
        [
            ((words >> jnp.uint32(width * j)) & mask).astype(jnp.int32)
            for j in range(per_word)
        ],
        axis=0,
    )  # int32 [tile, bn] in K row order
    w = (codes - cmax).astype(jnp.bfloat16) * sexp
    if actq is not None:
        x = _qdq_lanes_signed(x, *actq, interpret)
    o_ref[:] += jax.lax.dot_general(
        x.astype(jnp.bfloat16), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(
    jax.jit, static_argnames=("bm", "bn", "interpret", "actq")
)
def bfp_matmul_subbyte_t_pallas(
    x: jax.Array,
    packed,
    bm: int = 256,
    bn: int = 2048,
    interpret: bool = False,
    actq: tuple | None = None,
) -> jax.Array:
    """x [M, K] @ unpack(packed)[N, K]^T -> [M, N] (f32), transposed
    bit-packed weights (PackedBFPSubT)."""
    m, k_dim = x.shape
    words, scales = packed.words, packed.scales
    n = words.shape[1]
    tile, per_word, block = packed.tile, packed.per_word, packed.block_size
    k_padded = (words.shape[0] // _SLICE) * tile
    if k_padded != k_dim:
        x = jnp.pad(x, ((0, 0), (0, k_padded - k_dim)))
    nt = k_padded // tile
    bm = min(bm, max(8, m))
    bn = min(bn, n)
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), nt)
    kernel = functools.partial(
        _subbyte_t_kernel, width=packed.width, per_word=per_word,
        block=block, actq=actq, interpret=interpret,
    )
    kwargs = _tpu_params(
        m, n, k_padded, words.size * 4 + scales.size, interpret
    )
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, tile), lambda i, j, k: (i, k)),
            pl.BlockSpec((_SLICE, bn), lambda i, j, k: (k, j)),
            pl.BlockSpec((tile // block, bn), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(x, words, scales)


# Below this many rows the matmul is HBM-bound on the weight stream and the
# fused in-kernel dequant wins; above it the op is MXU-bound and a single
# unpack to bf16 + native XLA matmul is faster (the dequant is O(N*K), one
# M-tile's worth of FLOPs — amortized to nothing at large M, while the fused
# kernel would re-dequantize the weight tile for every M tile).
_FUSED_M_MAX = 256


def actq_spec(config: dict | None):
    """Static (bs, width, exponent_width, exponent_bias) for folding the
    data_in block_fp quantizer into the kernel prologue, or None when the
    config isn't kernel-eligible (non-block_fp arith, 2-D act tiles, or a
    block that doesn't divide the 128-lane grid)."""
    if (
        config is None
        or config.get("bypass", False)
        or config.get("name") != "block_fp"
    ):
        return None
    bs = config.get("data_in_block_size")
    if isinstance(bs, (list, tuple)):
        # bs[-2] == -1 is NOT eligible: the reference blocking
        # (infer_block_shape) expands -1 to the FULL second-to-last dim on
        # 3-D activations — one exponent shared across all sequence
        # positions — while the in-kernel quantizer is per-row [1, bs].
        # Such configs must take the external reference-quantizer path.
        if len(bs) >= 2 and bs[-2] != 1:
            return None
        bs = bs[-1]
    if not isinstance(bs, int) or bs < 1 or 128 % bs:
        return None
    eb = config.get("data_in_exponent_bias")
    if eb is not None and not isinstance(eb, (int, float)):
        return None
    return (
        bs,
        config["data_in_width"],
        config.get("data_in_exponent_width", 8),
        eb,
    )


def bfp_matmul(x: jax.Array, packed, use_pallas: bool | None = None,
               interpret: bool = False, actq: tuple | None = None) -> jax.Array:
    """Dispatch: fused Pallas kernel for small-M (decode) on TPU, unpack +
    native matmul for large-M (prefill) and non-TPU backends. x: [..., K].

    ``actq`` (from ``actq_spec``): the data_in quantizer to run INSIDE the
    kernel. On the non-fused paths the same quantizer is applied with the
    reference XLA expression — callers pass ``actq`` INSTEAD of
    pre-quantizing, never both."""
    lead_shape = x.shape[:-1]
    k_dim = x.shape[-1]
    x2 = x.reshape(-1, k_dim)
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu" and x2.shape[0] <= _FUSED_M_MAX
        )
    if actq is not None:
        # in-kernel quantize requires every [1, bs] block aligned inside the
        # padded K row: the circular lane roll in _qdq_lanes_signed wraps a
        # partial trailing block across the row boundary otherwise (the
        # external path pads to the activation block instead). bs divides
        # 128 (actq_spec), so only a non-128-padded K can violate this.
        if isinstance(packed, PackedBFPSubT):
            k_pad = (packed.words.shape[0] // _SLICE) * packed.tile
        elif isinstance(packed, PackedBFPSub):
            k_pad = (packed.words.shape[1] // _SLICE) * packed.tile
        else:
            k_pad = packed.codes.shape[1]
        if k_pad % actq[0]:
            from ..ops.quantizers.block_fp import _block_fp_qdq

            bs, width, ew, eb = actq
            x2 = _block_fp_qdq(x2, width, ew, eb, [1, bs],
                               skip_first_dim=True)
            actq = None
    if use_pallas or interpret:
        if isinstance(packed, PackedBFPSubT):
            out = bfp_matmul_subbyte_t_pallas(x2, packed,
                                              interpret=interpret, actq=actq)
        elif isinstance(packed, PackedBFPSub):
            out = bfp_matmul_subbyte_pallas(x2, packed, interpret=interpret,
                                            actq=actq)
        else:
            out = bfp_matmul_pallas(x2, packed, interpret=interpret,
                                    actq=actq)
    else:
        if actq is not None:
            from ..ops.quantizers.block_fp import _block_fp_qdq

            bs, width, ew, eb = actq
            x2 = _block_fp_qdq(x2, width, ew, eb, [1, bs],
                               skip_first_dim=True)
        if isinstance(packed, PackedBFPSubT):
            unpack = unpack_block_fp_subbyte_t
        elif isinstance(packed, PackedBFPSub):
            unpack = unpack_block_fp_subbyte
        else:
            unpack = unpack_block_fp
        if jax.default_backend() == "tpu":
            # code*scale is exact in bf16 (<= 7 mantissa bits x power-of-2),
            # as is the BFP-quantized activation -> full-speed MXU path
            w = unpack(packed, jnp.bfloat16)
            out = jax.lax.dot_general(
                x2.astype(jnp.bfloat16),
                w,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            w = unpack(packed)
            out = jax.lax.dot_general(
                x2, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    return out.reshape(*lead_shape, packed.out_features).astype(x.dtype)
