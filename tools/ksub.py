"""Sub-byte dequant-matmul VPU attribution probe (run on the chip).

Round-5 hypothesis: the big-N shapes (gate_up 0.40 of HBM peak, qkv 0.43)
are VPU-BOUND on code extraction, not DMA- or per-step-overhead-bound:
~6 VPU ops/element (shift, and, concat copy, sub, cast, mul) over N*K
elements at ~4 Tops/s costs more than the HBM stream at 0.86 B/element.
Knockout variants at the 7B gate_up/qkv shapes attribute the per-step cost:

  ship      — current _subbyte_kernel (bn=2048, tps=1)
  stream    — dot on the raw word block only (DMA + MXU floor; no extract)
  extract   — extraction chain but no scale mul (sub+cast+concat kept)
  noconcat  — per-slice dots, no concatenated code plane (r3 design)
  shift2    — signed shl/sar extraction (no and, no sub) + scale mul:
              the candidate 4-op/elem chain (requires signed stored codes;
              speed measured on the same biased words — values don't
              matter for timing)

All timings are fori_loop slopes (tunnel dispatch cost cancels; see
tools/achain.py). Usage: python tools/ksub.py [--shape=gate_up] [--reps=3]
"""

import functools
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_mixed_q_tpu.kernels.dequant_matmul import _expand_scales
from llm_mixed_q_tpu.kernels.packing import (
    _SLICE,
    pack_block_fp_subbyte,
    packed_nbytes,
)

WIDTH, BLOCK = 6, 16
PER_WORD = 32 // WIDTH
TILE = PER_WORD * _SLICE


def arg(flag, default):
    for a in sys.argv[1:]:
        if a.startswith(f"--{flag}="):
            try:
                return int(a.split("=")[1])
            except ValueError:
                return a.split("=")[1]
    return default


SHAPES = {
    "qkv": (12288, 4096),
    "o": (4096, 4096),
    "gate_up": (22016, 4096),
    "down": (4096, 11008),
}
ONLY = arg("shape", "")
REPS = arg("reps", 3)
BN = arg("bn", 2048)
M = 8


def kernel(x_ref, words_ref, scales_ref, o_ref, *, variant: str):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    words = words_ref[:]  # u32 [bn, SLICE]
    x = x_ref[:]  # [m, tile]
    if variant == "stream":
        # no extraction: cast the words once and contract against one x
        # slice — pure DMA + one MXU dot (values meaningless)
        w = jax.lax.bitcast_convert_type(words, jnp.int32).astype(
            jnp.bfloat16)
        o_ref[:] += jax.lax.dot_general(
            x[:, :_SLICE].astype(jnp.bfloat16), w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return

    e8 = scales_ref[0]
    ei = jnp.clip(e8.astype(jnp.int32) - 128, -126, 127)
    s = jax.lax.bitcast_convert_type((ei + 127) << 23, jnp.float32)
    sexp = _expand_scales(s.astype(jnp.bfloat16), BLOCK, dtype=jnp.bfloat16)
    mask = jnp.uint32(2**WIDTH - 1)
    cmax = 2 ** (WIDTH - 1) - 1

    if variant == "noconcat":
        acc = jnp.zeros_like(o_ref)
        for j in range(PER_WORD):
            codes = ((words >> jnp.uint32(WIDTH * j)) & mask).astype(jnp.int32)
            w = (codes - cmax).astype(jnp.bfloat16) * sexp[
                :, j * _SLICE : (j + 1) * _SLICE]
            acc += jax.lax.dot_general(
                x[:, j * _SLICE : (j + 1) * _SLICE].astype(jnp.bfloat16), w,
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        o_ref[:] += acc
        return

    if variant == "shift2":
        iw = jax.lax.bitcast_convert_type(words, jnp.int32)
        codes = jnp.concatenate(
            [
                jax.lax.shift_right_arithmetic(
                    jax.lax.shift_left(iw, 32 - WIDTH * (j + 1)), 32 - WIDTH
                )
                for j in range(PER_WORD)
            ],
            axis=1,
        )
        w = codes.astype(jnp.bfloat16) * sexp
    else:
        codes = jnp.concatenate(
            [
                ((words >> jnp.uint32(WIDTH * j)) & mask).astype(jnp.int32)
                for j in range(PER_WORD)
            ],
            axis=1,
        )
        if variant == "extract":
            w = (codes - cmax).astype(jnp.bfloat16)
        elif variant == "lanerepeat":
            # lane-axis jnp.repeat expansion instead of the one-hot dot
            # (f32 repeat: Mosaic's minor-dim insertion needs 32-bit types)
            w = (codes - cmax).astype(jnp.bfloat16) * jnp.repeat(
                s, BLOCK, axis=1).astype(jnp.bfloat16)
        elif variant == "mulconst":
            # elementwise mul kept, expand dot dead: isolates the one-hot
            # expansion dot's cost from the multiply's
            w = (codes - cmax).astype(jnp.bfloat16) * jnp.bfloat16(1.0078125)
        elif variant == "muladd":
            # scale applied by integer-adding the biased exponent into the
            # f32 bits of float(code-cmax): |code-cmax| <= 31 so the f32
            # exponent field never carries into sign; zero codes fixed by a
            # select. Avoids a bf16 mul but needs the f32 bit path.
            cf = (codes - cmax).astype(jnp.float32)
            bits = jax.lax.bitcast_convert_type(cf, jnp.int32)
            eadd = _expand_scales(
                (e8.astype(jnp.int32) - 128).astype(jnp.float32), BLOCK
            ).astype(jnp.int32) << 23
            scaled = jax.lax.bitcast_convert_type(bits + eadd, jnp.float32)
            w = jnp.where(cf == 0.0, 0.0, scaled).astype(jnp.bfloat16)
        else:  # ship
            w = (codes - cmax).astype(jnp.bfloat16) * sexp
    o_ref[:] += jax.lax.dot_general(
        x.astype(jnp.bfloat16), w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def tkernel(x_ref, words_ref, scales_ref, o_ref):
    """Transposed-format candidate: K on SUBLANES. words [SLICE, bn_k? ->
    [_SLICE rows, bn cols]; scales [tile//block, bn]. Scale expansion =
    sublane jnp.repeat (the fast primitive, tools/kexp.py); main dot is
    x [m, tile] @ w [tile, bn] — standard A@B on the MXU."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    words = words_ref[:]  # u32 [_SLICE, bn]
    x = x_ref[:]  # [m, tile]
    e8 = scales_ref[:]  # u8 [tile // BLOCK, bn]
    mask = jnp.uint32(2**WIDTH - 1)
    cmax = 2 ** (WIDTH - 1) - 1
    ei = jnp.clip(e8.astype(jnp.int32) - 128, -126, 127)
    s = jax.lax.bitcast_convert_type((ei + 127) << 23, jnp.float32)
    sexp = jnp.repeat(s, BLOCK, axis=0).astype(jnp.bfloat16)  # [tile, bn]
    codes = jnp.concatenate(
        [
            ((words >> jnp.uint32(WIDTH * j)) & mask).astype(jnp.int32)
            for j in range(PER_WORD)
        ],
        axis=0,
    )  # int32 [tile, bn] in K order (rows)
    w = (codes - cmax).astype(jnp.bfloat16) * sexp
    o_ref[:] += jax.lax.dot_general(
        x.astype(jnp.bfloat16), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def tkernel2(x_ref, words_ref, scales_ref, o_ref):
    """Transposed, per-slice dots (no sublane concat)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    words = words_ref[:]
    x = x_ref[:]
    e8 = scales_ref[:]
    mask = jnp.uint32(2**WIDTH - 1)
    cmax = 2 ** (WIDTH - 1) - 1
    ei = jnp.clip(e8.astype(jnp.int32) - 128, -126, 127)
    s = jax.lax.bitcast_convert_type((ei + 127) << 23, jnp.float32)
    sexp = jnp.repeat(s, BLOCK, axis=0).astype(jnp.bfloat16)
    acc = jnp.zeros_like(o_ref)
    for j in range(PER_WORD):
        codes = ((words >> jnp.uint32(WIDTH * j)) & mask).astype(jnp.int32)
        w = (codes - cmax).astype(jnp.bfloat16) * sexp[
            j * _SLICE : (j + 1) * _SLICE]
        acc += jax.lax.dot_general(
            x[:, j * _SLICE : (j + 1) * _SLICE].astype(jnp.bfloat16), w,
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[:] += acc


def make_tcall(packed, bn, kfn=tkernel):
    words, scales = packed.words, packed.scales
    n = words.shape[0]
    k_padded = (words.shape[1] // _SLICE) * TILE
    nt = k_padded // TILE

    def call(x, words_t, scales_t):
        return pl.pallas_call(
            kfn,
            grid=(1, pl.cdiv(n, bn), nt),
            in_specs=[
                pl.BlockSpec((M, TILE), lambda i, j, k: (i, k)),
                pl.BlockSpec((_SLICE, bn), lambda i, j, k: (k, j)),
                pl.BlockSpec((TILE // BLOCK, bn), lambda i, j, k: (k, j)),
            ],
            out_specs=pl.BlockSpec((M, bn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * M * n * k_padded,
                bytes_accessed=words.size * 4 + scales.size,
                transcendentals=0,
            ),
        )(x, words_t, scales_t)

    return call


def transpose_pack(packed):
    """Host transpose of a PackedBFPSub into the candidate T layout."""
    words = np.asarray(packed.words)  # [n, nt*SLICE]
    scales = np.asarray(packed.scales)  # [nt, n, tile//block]
    words_t = np.ascontiguousarray(words.T)  # [nt*SLICE, n]
    nt = scales.shape[0]
    scales_t = np.ascontiguousarray(
        scales.transpose(0, 2, 1).reshape(nt * scales.shape[2],
                                          scales.shape[1])
    )  # [nt*(tile//block), n]
    return jnp.asarray(words_t), jnp.asarray(scales_t)


def make_call(packed, variant, bn):
    words, scales = packed.words, packed.scales
    n = words.shape[0]
    k_padded = (words.shape[1] // _SLICE) * TILE
    nt = k_padded // TILE
    kfn = functools.partial(kernel, variant=variant)

    def call(x, words, scales):
        return pl.pallas_call(
            kfn,
            grid=(1, pl.cdiv(n, bn), nt),
            in_specs=[
                pl.BlockSpec((M, TILE), lambda i, j, k: (i, k)),
                pl.BlockSpec((bn, _SLICE), lambda i, j, k: (j, k)),
                pl.BlockSpec((1, bn, TILE // BLOCK), lambda i, j, k: (k, j, 0)),
            ],
            out_specs=pl.BlockSpec((M, bn), lambda i, j, k: (i, j)),
            out_shape=jax.ShapeDtypeStruct((M, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * M * n * k_padded,
                bytes_accessed=words.size * 4 + scales.size,
                transcendentals=0,
            ),
        )(x, words, scales)

    return call


def chain(call, packs, x0, k_padded):
    @jax.jit
    def run(packs, x, niter):
        def body(i, x):
            for words, scales in packs:
                y = call(x, words, scales)
                if y.shape[1] < k_padded:  # N < K shapes: pad the feedback
                    y = jnp.pad(y, ((0, 0), (0, k_padded - y.shape[1])))
                x = jnp.tanh(y[:, :k_padded])
            return x
        return lax.fori_loop(0, niter, body, x).sum()

    nrot = len(packs)
    jax.block_until_ready(run(packs, x0, 1))

    def t_at(n):
        t0 = time.perf_counter()
        float(run(packs, x0, n))
        return time.perf_counter() - t0

    # hi must run long enough that total time dwarfs the ~25ms tunnel
    # dispatch jitter (round-5 finding)
    t_at(10)
    lo = min(t_at(10) for _ in range(REPS))
    hi = min(t_at(110) for _ in range(REPS))
    return (hi - lo) / (100 * nrot)


def main():
    assert jax.default_backend() != "cpu"
    rng = np.random.default_rng(0)
    for name, (n, k) in SHAPES.items():
        if ONLY and ONLY not in name:
            continue
        ws = [jnp.asarray(rng.standard_normal((n, k)) * 0.02, jnp.float32)
              for _ in range(3)]
        packs = [pack_block_fp_subbyte(w, WIDTH, 8, 127, [1, BLOCK])
                 for w in ws]
        nb = packed_nbytes(packs[0])
        k_padded = (packs[0].words.shape[1] // _SLICE) * TILE
        x0 = jnp.asarray(rng.standard_normal((M, k_padded)), jnp.float32)
        pairs = [(p.words, p.scales) for p in packs]
        print(f"{name}: N={n} K={k} bytes={nb/1e6:.1f}MB "
              f"floor@819={nb/819e9*1e6:.1f}us", flush=True)
        tpairs = [transpose_pack(p) for p in packs]
        for tname, tk in (("tship", tkernel), ("tsplit", tkernel2)):
            tcall = make_tcall(packs[0], min(BN, n), tk)
            try:
                t = chain(tcall, tpairs, x0, k_padded)
                print(f"  {tname:>9s}: {t*1e6:7.1f}us  "
                      f"({nb/t/1e9:5.0f} GB/s, {nb/t/1e9/819:.2f} of peak)",
                      flush=True)
            except Exception as e:
                print(f"  {tname} FAILED {type(e).__name__} {str(e)[:140]}",
                      flush=True)
        del tpairs
        for variant in ("ship", "stream", "extract", "mulconst", "muladd"):
            call = make_call(packs[0], variant, min(BN, n))
            t = chain(call, pairs, x0, k_padded)
            print(f"  {variant:>9s}: {t*1e6:7.1f}us  "
                  f"({nb/t/1e9:5.0f} GB/s, {nb/t/1e9/819:.2f} of peak)",
                  flush=True)
        del ws, packs, pairs


if __name__ == "__main__":
    main()
