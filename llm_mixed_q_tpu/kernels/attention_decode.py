"""Pallas decode attention over the PACKED KV cache (codes read in-kernel).

The packed serving path stores K/V as int8 BFP codes + per-block f32 scales
(serving.py PackedKVCache). Until now decode dequantized the cache with XLA
ops (`bfp_decode_lastdim`) and trusted fusion to avoid materializing f32
K/V — VERDICT.md round-1 Weak #4 flagged that trust. This kernel removes
the question: HBM only ever streams codes + scales; dequantization happens
on the VPU in the same kernel that feeds the MXU, and the f32 K/V never
exists anywhere (SURVEY.md §7 kernel layer 3, "blockwise attention ...
dequantizes the block-quantized KV-cache in-kernel").

Semantics (bit-matching serving._attention_cached's XLA path — verified
bit-exact on a v5e chip, tools/hlo_check.py):
    scores  = q @ dequant(K)^T / sqrt(hd),  masked to iota <= position
    probs   = softmax_f32(scores)
    probs_q = block_fp qdq of probs along the kv axis (matmul_1 data_in),
              exact reference grid: ceil-log2 block exponent, round-half-
              even mantissa, +1e-9 epsilons, |x| <= 1e-8 passthrough
              (reference block_fp.py:44-57)
    ctx     = probs_q @ dequant(V)

Layout (v2 — the part that makes it fast): K is cached TRANSPOSED,
codes [hd, S], so the score matmul is a standard MXU op
[8, hd] x [hd, S] -> [8, S] with the kv axis on LANES. Every elementwise
op (mask, exp, normalize, quantize) then runs on [8, S] vregs at full lane
utilization — the v1 layout put the kv axis on sublanes ([S, rep]) and for
rep=1 used 1/128 lanes, which measured no faster than the XLA path. The
[1, bs] prob blocks live in 16-lane groups, reduced with an XOR-butterfly
(roll/select/max, log2(bs) steps) instead of a (forbidden) lane-splitting
reshape. V stays [S, hd]: the context matmul [8, S] x [S, hd] is again a
standard MXU op. Scale expansion is a one-hot MXU matmul on each side
(sublane-expand for K^T, lane-expand for V).

All dequantized values and quantized probs have <= 8 mantissa bits; the
kernel computes its two dots in f32 (lossless), so only f32 accumulation
order can differ from the XLA path (none observed on chip).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dequant_matmul import _expand_scales

NEG_INF = -1e9
_ATOL = 1e-8  # reference block_fp zero-preserving threshold
_REP_PAD = 8  # q rows padded to one f32 sublane tile


def _exp2_exact(e):
    """Bit-constructed 2.0**e for integer-valued f32 e (normals only — block
    exponents are clipped to [-bias, emax] upstream, far inside normal
    range). Mirrors ops/quantizers/exact.py without the subnormal branch."""
    ei = jnp.clip(e.astype(jnp.int32), -126, 127)
    return jax.lax.bitcast_convert_type((ei + 127) << 23, jnp.float32)


def _expand_scales_sublane(scales, block: int):
    """[nb, S] per-block scales -> [nb*block, S] over the SUBLANE axis.

    broadcast + merge-reshape: the lane dim is untouched, so the reshape is
    a layout no-op and the broadcast a native sublane op. Round 4 did this
    with a one-hot MXU dot ([nb*block, nb] @ [nb, S]) whose K=nb pads to a
    full MXU pass — measured ~1.3us per [128, 8192] expansion, which at
    2 expansions x 32 batch elements was ~45% of the whole decode-attention
    kernel (tools/ksub.py round-5 attribution; same disease as the weight
    kernels' lane-axis expand)."""
    nb, lanes = scales.shape
    return jax.lax.broadcast_in_dim(
        scales, (nb, block, lanes), (0, 2)
    ).reshape(nb * block, lanes)


def _dequant_sublane(codes, scales, block: int, dt):
    """codes [rows, L] x per-block scales [rows // block, L] -> [rows, L]
    dequantized, with the K/V quant blocks along SUBLANES.

    ``jnp.repeat`` along the sublane axis is the fast expansion primitive
    under Mosaic (tools/kexp.py shootout, on-chip: ~free vs ~1.3us for the
    round-4 one-hot expansion dot, whose K=nb pads to a full MXU pass; the
    3-D broadcast-multiply forms measured ~8-20us — avoid them)."""
    return codes.astype(dt) * jnp.repeat(scales.astype(dt), block, axis=0)


def _roll_lanes(x, shift: int, interpret: bool):
    if interpret:
        return jnp.roll(x, shift, axis=1)
    return pltpu.roll(x, shift % x.shape[1], axis=1)


def _quantize_probs_lanes(p, bs: int, width: int, exponent_width: int,
                          exponent_bias, interpret: bool):
    """block_fp qdq of probs p [8, S] with [1, bs] blocks along the LANE
    axis (kv positions), matching the XLA path's make_entry_quantizer grid
    (reference block_fp.py:44-57). Probs are >= 0: sign == 1.

    Per-lane block max without a lane-splitting reshape: XOR butterfly —
    lane i exchanges with lane i^s for s = 1, 2, ..., bs/2; both are always
    inside the same aligned bs-block, so after log2(bs) steps every lane
    holds its block's max."""
    if exponent_bias in (None, "none", "None"):
        exponent_bias = 2 ** (exponent_width - 1) - 1
    mantissa_bits = width - 1
    shift = float(2**mantissa_bits)
    mantissa_max = float(2**mantissa_bits - 1)
    emax = float(2**exponent_width - 1 - exponent_bias)
    emin = float(-exponent_bias)

    s_len = p.shape[1]
    if bs >= s_len:
        pm = jnp.max(p, axis=1, keepdims=True)
        pm = jnp.broadcast_to(pm, p.shape)
    else:
        pm = p
        lane = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        s = 1
        while s < bs:
            high = (lane // s) % 2 == 1  # partner lane is i - s, else i + s
            partner = jnp.where(
                high,
                _roll_lanes(pm, s, interpret),
                _roll_lanes(pm, -s, interpret),
            )
            pm = jnp.maximum(pm, partner)
            s *= 2

    # log2(0) -> -inf clips to emin; the |x|<=atol passthrough below makes
    # the all-zero-block (fully masked) value exact anyway
    exponent = jnp.clip(jnp.ceil(jnp.log2(pm)), emin, emax)
    two_e = _exp2_exact(exponent)
    # divide by 2^e as a multiply by the bit-constructed inverse (exact for
    # power-of-two scales; probs <= 1 keep e <= 0 so -e stays normal) — the
    # VPU's vector divide is many-cycle
    inv_e = _exp2_exact(-exponent)
    mant = jnp.clip(jnp.round((p + 1e-9) * (inv_e * shift)), 0.0,
                    mantissa_max)
    q = two_e * (mant * (1.0 / shift))
    return jnp.where(p <= _ATOL, p, q)


def _quantize_probs_strided(p, bs: int, width: int, exponent_width: int,
                            exponent_bias, stride: int, s_len: int,
                            interpret: bool):
    """block_fp qdq of probs p [rows, s_len*stride] laid out POS-MAJOR
    (lane = kv_pos * stride + head): a [1, bs] block covers bs consecutive
    kv positions of ONE head, i.e. lanes {(16*b0 + t)*stride + g}. The XOR
    butterfly therefore rolls by s*stride — partners share the head and the
    aligned bs-block. stride=1 reduces to ``_quantize_probs_lanes``."""
    if exponent_bias in (None, "none", "None"):
        exponent_bias = 2 ** (exponent_width - 1) - 1
    mantissa_bits = width - 1
    shift = float(2**mantissa_bits)
    mantissa_max = float(2**mantissa_bits - 1)
    emax = float(2**exponent_width - 1 - exponent_bias)
    emin = float(-exponent_bias)

    pm = p
    lane = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    pos = lane // stride
    s = 1
    # bs >= s_len collapses to a per-head max over the whole sequence —
    # the butterfly reaches it after log2(s_len) steps
    while s < min(bs, s_len):
        high = (pos // s) % 2 == 1
        partner = jnp.where(
            high,
            _roll_lanes(pm, s * stride, interpret),
            _roll_lanes(pm, -s * stride, interpret),
        )
        pm = jnp.maximum(pm, partner)
        s *= 2

    exponent = jnp.clip(jnp.ceil(jnp.log2(pm)), emin, emax)
    two_e = _exp2_exact(exponent)
    # power-of-two divide as exact inverse multiply (see
    # _quantize_probs_lanes)
    inv_e = _exp2_exact(-exponent)
    mant = jnp.clip(jnp.round((p + 1e-9) * (inv_e * shift)), 0.0,
                    mantissa_max)
    q = two_e * (mant * (1.0 / shift))
    return jnp.where(p <= _ATOL, p, q)


def _attn_kernel_batch(pos_ref, q_ref, kct_ref, kst_ref, vc_ref, vs_ref,
                       o_ref, *, bs_k: int, bs_v: int, sqrt_hd: float,
                       prob_q, nkv: int, rep: int, nh: int, s_len: int,
                       dt, interpret: bool):
    """ALL heads of one batch element in one program (grid (b,)).

    The r3 kernel ran one grid cell per (batch, kv head) — 256 cells at 7B
    decode shapes, each doing a [8, hd] x [hd, S] matmul: per-cell fixed
    cost dominated (measured ~446us/layer vs ~30us of data, tools/dprobe7).
    Here the caches are POS-MAJOR (lane = kv_pos * nkv + head) and the
    whole batch element is two big MXU ops: scores = Q [nh, hd] x
    Kall [hd, S*nkv] computes every (q-head, kv-head) pair, the mask keeps
    the diagonal blocks (lane % nkv == row // rep), and after softmax the
    off-diagonal probs are exactly 0 so ctx = P [nh, S*nkv] x
    Vall [S*nkv, hd] contracts each head against its own V only. The
    wasted off-diagonal FLOPs are trivial next to the removed per-cell
    overhead; HBM traffic is unchanged (codes + scales once).

    ``dt`` is the dot dtype: bfloat16 whenever every operand is bf16-exact
    (codes <= 8 bits x power-of-2 scales; q and probs block_fp-quantized
    with <= 8 mantissa bits) — products are then exact and only f32
    accumulation order can differ from the XLA path; f32 otherwise."""
    pos = pos_ref[pl.program_id(0)]

    kd = _dequant_sublane(kct_ref[0], kst_ref[0], bs_k, dt)  # [hd, L]
    q = q_ref[0].astype(dt)  # [nh_p, hd]
    st = jax.lax.dot_general(
        q, kd, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) / sqrt_hd  # [nh_p, S*nkv] f32
    lane = jax.lax.broadcasted_iota(jnp.int32, st.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
    valid = (
        (lane // nkv <= pos)
        & (lane % nkv == row // rep)
        & (row < nh)
    )
    st = jnp.where(valid, st, NEG_INF)
    m = jnp.max(st, axis=1, keepdims=True)
    e = jnp.exp(st - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)  # [nh_p, L] f32
    if prob_q is not None:
        p = _quantize_probs_strided(p, *prob_q, stride=nkv, s_len=s_len,
                                    interpret=interpret)

    # V is stored TRANSPOSED like K ([hd, L] — r4 layout fix: the natural
    # [L, nkv, hd/bs] scale layout tile-padded 16x in HBM and forced a
    # relayout copy per layer per step); dequant = sublane expand, and the
    # context matmul contracts the L axis of both operands (A @ B^T form,
    # native on the MXU — no transpose materializes)
    vdt = _dequant_sublane(vc_ref[0], vs_ref[0], bs_v, dt)  # [hd, L]
    o_ref[0] = jax.lax.dot_general(
        p.astype(dt), vdt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [nh_p, hd]


# lane budget for the batch-folded kernel: S*nkv lanes of bf16 K/V dequant
# (2 x 2 bytes x hd sublanes) + f32 score/prob rows must fit VMEM with
# double buffering; 8192 lanes x 128 hd ~= 10MB peak. Longer caches fall
# back to the per-(b, head) kernel below.
BATCH_KERNEL_MAX_LANES = 8192


@functools.partial(
    jax.jit,
    static_argnames=(
        "bs_k", "bs_v", "nkv", "rep", "prob_q", "exact_q", "interpret"
    ),
)
def packed_attention_decode_batch(
    q: jax.Array,  # [b, nh, hd] f32 (RoPE'd, data_in-quantized; rows grouped by kv head)
    k_codes: jax.Array,  # [b, hd, S*nkv] int8 (POS-MAJOR flat: lane = pos*nkv + head)
    k_scales: jax.Array,  # [b, hd // bs_k, S*nkv] f32
    v_codes: jax.Array,  # [b, hd, S*nkv] int8 (transposed like K — r4 layout)
    v_scales: jax.Array,  # [b, hd // bs_v, S*nkv] f32
    positions: jax.Array,  # [b] int32: last valid cache index (inclusive)
    bs_k: int,
    bs_v: int,
    nkv: int,
    rep: int = 1,
    prob_q: tuple | None = None,  # (bs, width, exp_width, exp_bias) | None
    exact_q: bool = True,  # q is block_fp-quantized with <= 8 mantissa bits
    interpret: bool = False,
) -> jax.Array:
    """Decode attention over the POS-MAJOR packed cache, one program per
    batch element -> ctx [b, nh, hd] f32. See ``_attn_kernel_batch``.

    All four cache operands are stored FLAT [b, rows, S*nkv]: every minor
    dim is the lane axis (multiple of 128 at any power-of-two max_len), so
    nothing tile-pads in HBM and the pallas_call consumes the stored arrays
    directly (the r3 4-D layouts padded up to 16x and cost a relayout copy
    per layer per step — the OOM'd batch-32 7B decode's biggest temps)."""
    b, nh, hd = q.shape
    lanes = k_codes.shape[2]
    s_len = lanes // nkv
    assert nh == nkv * rep, (nh, nkv, rep)
    nh_p = max(8, -(-nh // 8) * 8)  # pad rows to a sublane tile
    if nh_p != nh:
        q = jnp.pad(q, ((0, 0), (0, nh_p - nh), (0, 0)))
    # bf16 dots are exact only when BOTH sides carry <= 8 mantissa bits:
    # dequantized K/V always do (packed codes), q/probs only when quantized
    dt = jnp.bfloat16 if (prob_q is not None and exact_q) else jnp.float32
    kernel = functools.partial(
        _attn_kernel_batch,
        bs_k=bs_k,
        bs_v=bs_v,
        sqrt_hd=math.sqrt(hd),
        prob_q=prob_q,
        nkv=nkv,
        rep=rep,
        nh=nh,
        s_len=s_len,
        dt=dt,
        interpret=interpret,
    )
    kwargs = {}
    if not interpret:
        kwargs = dict(
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                # the full-slab intermediates (bf16 K/V dequant + f32
                # score/prob rows) exceed Mosaic's conservative 16MB scoped
                # default by ~100KB at the cap shape (nkv*S = 8192); v5e has
                # 128MB of physical VMEM
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * nh_p * lanes * hd,
                bytes_accessed=(
                    k_codes.size + v_codes.size
                    + 4 * (k_scales.size + v_scales.size + q.size)
                    + 4 * b * nh_p * hd
                ),
                transcendentals=b * nh_p * lanes,  # exp
            ),
        )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nh_p, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, hd, lanes), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, k_scales.shape[1], lanes), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, hd, lanes), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, v_scales.shape[1], lanes), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, nh_p, hd), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nh_p, hd), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(
        positions.astype(jnp.int32).reshape(b),
        q,
        k_codes,
        k_scales,
        v_codes,
        v_scales,
    )
    return out[:, :nh]


def _attn_kernel(pos_ref, q_ref, kct_ref, kst_ref, vc_ref, vs_ref, o_ref, *,
                 bs_k: int, bs_v: int, sqrt_hd: float, prob_q,
                 interpret: bool):
    pos = pos_ref[pl.program_id(0)]  # positions live unblocked in SMEM

    # K^T dequant: [hd, S] — codes stream from HBM, f32 K never exists
    kexp = _expand_scales_sublane(kst_ref[0, 0], bs_k)  # [hd, S] f32
    kd = kct_ref[0, 0].astype(jnp.float32) * kexp
    q8 = q_ref[0, 0]  # [8, hd] f32 (rows >= rep are zero padding)
    st = jax.lax.dot_general(
        q8, kd, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) / sqrt_hd  # [8, S] — kv axis on lanes
    lane = jax.lax.broadcasted_iota(jnp.int32, st.shape, 1)
    st = jnp.where(lane <= pos, st, NEG_INF)
    m = jnp.max(st, axis=1, keepdims=True)
    e = jnp.exp(st - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)  # [8, S] f32
    if prob_q is not None:
        p = _quantize_probs_lanes(p, *prob_q, interpret=interpret)

    vd = vc_ref[0, 0].astype(jnp.float32) * _expand_scales(
        vs_ref[0, 0], bs_v, 0
    )  # [S, hd] f32
    o_ref[0, 0] = jax.lax.dot_general(
        p, vd, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [8, hd]


@functools.partial(
    jax.jit,
    static_argnames=("bs_k", "bs_v", "prob_q", "interpret"),
)
def packed_attention_decode(
    q: jax.Array,  # [b, nkv, rep, hd] f32 (RoPE'd, data_in-quantized)
    k_codes_t: jax.Array,  # [b, nkv, hd, S] int8 (TRANSPOSED)
    k_scales_t: jax.Array,  # [b, nkv, hd // bs_k, S] f32 (TRANSPOSED)
    v_codes: jax.Array,  # [b, nkv, S, hd] int8
    v_scales: jax.Array,  # [b, nkv, S, hd // bs_v] f32
    positions: jax.Array,  # [b] int32: last valid cache index (inclusive)
    bs_k: int,
    bs_v: int,
    prob_q: tuple | None = None,  # (bs, width, exp_width, exp_bias) | None
    interpret: bool = False,
) -> jax.Array:
    """Decode attention reading the packed KV cache directly -> ctx
    [b, nkv, rep, hd] f32. See module docstring for layout/semantics."""
    b, nkv, rep, hd = q.shape
    s_len = v_codes.shape[2]
    assert rep <= _REP_PAD, f"GQA rep {rep} > {_REP_PAD} (gate via attention_kernel_ok)"
    if rep < _REP_PAD:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, _REP_PAD - rep), (0, 0)))
    grid = (b, nkv)
    pos1 = positions.astype(jnp.int32).reshape(b)

    kernel = functools.partial(
        _attn_kernel,
        bs_k=bs_k,
        bs_v=bs_v,
        sqrt_hd=math.sqrt(hd),
        prob_q=prob_q,
        interpret=interpret,
    )
    kwargs = {}
    if not interpret:
        kwargs = dict(
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * nkv * _REP_PAD * s_len * hd,
                bytes_accessed=(
                    k_codes_t.size + v_codes.size
                    + 4 * (k_scales_t.size + v_scales.size + q.size)
                    + 4 * b * nkv * _REP_PAD * hd
                ),
                transcendentals=b * nkv * _REP_PAD * s_len,  # exp
            ),
        )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, _REP_PAD, hd), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, hd, s_len), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, k_scales_t.shape[2], s_len),
                         lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, s_len, hd), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, s_len, v_scales.shape[3]),
                         lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, _REP_PAD, hd), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nkv, _REP_PAD, hd), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(pos1, q, k_codes_t, k_scales_t, v_codes, v_scales)
    return out[:, :, :rep]


# VMEM budget gate: per-cell buffers are ~S*hd*(2 int8 + 2 f32) plus scales
# and the [8, S] score/prob registers; 4096x128 keeps it under ~5MB with
# double buffering. Longer caches should chunk (not yet needed:
# chunked_quantized_attention covers long-context scoring; serving max_len
# targets <= 4k).
_MAX_S_HD = 4096 * 128


def prob_q_spec(mm1_cfg: dict, max_len: int):
    """Per-layer kernel eligibility: the (bs, width, exp_width, exp_bias)
    prob-quantization spec for one layer's matmul_1 config, or None for a
    bypass data_in. Raises ValueError when this layer cannot go through the
    fused kernel (non-block_fp probs, width > 9 — not bf16-exact — a block
    that does not tile max_len, or a non-power-of-two block, which the
    butterfly block-max cannot reduce)."""
    from .packing import effective_block_len

    if mm1_cfg.get("bypass", False):
        return None
    if mm1_cfg.get("name") != "block_fp" or mm1_cfg.get("data_in_width", 99) > 9:
        raise ValueError(f"matmul_1 data_in not kernel-eligible: {mm1_cfg}")
    bs = effective_block_len(mm1_cfg["data_in_block_size"], max_len)
    if bs is None or max_len % bs != 0:
        raise ValueError(
            f"prob block {mm1_cfg['data_in_block_size']} does not tile "
            f"max_len {max_len}"
        )
    if bs & (bs - 1):
        raise ValueError(f"prob block {bs} is not a power of two")
    return (
        bs,
        mm1_cfg["data_in_width"],
        mm1_cfg.get("data_in_exponent_width", 8),
        mm1_cfg.get("data_in_exponent_bias"),
    )


def attention_kernel_ok(config, max_len: int) -> bool:
    """True when EVERY layer of this config can decode through the fused
    packed-KV attention kernel at this cache length."""
    from ..models.llama.modeling import _node_cfg

    if max_len * config.head_dim > _MAX_S_HD:
        return False
    if config.num_attention_heads // config.num_key_value_heads > _REP_PAD:
        return False
    try:
        for i in range(config.num_hidden_layers):
            prob_q_spec(
                _node_cfg(config.quant_config, i, "self_attn", "matmul_1"),
                max_len,
            )
    except (ValueError, KeyError):
        return False
    return True
