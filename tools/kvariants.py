"""Fused dequant-matmul kernel VARIANTS, measured under rotation (true HBM
streaming). Winners graduate into kernels/dequant_matmul.py."""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from llm_mixed_q_tpu.kernels.dequant_matmul import (
    _expand_scales,
    bfp_matmul_subbyte_pallas,
)
from llm_mixed_q_tpu.kernels.packing import (
    _SLICE,
    pack_block_fp_subbyte,
    packed_nbytes,
)


def _kernel_v2(x_ref, words_ref, scales_ref, o_ref, *, width, per_word, block):
    """bf16 dequant arithmetic: int32 sub then straight to bf16 (skip f32)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    words = words_ref[:]
    scales = scales_ref[0]
    x = x_ref[:]
    mask = jnp.uint32(2**width - 1)
    cmax = 2 ** (width - 1) - 1
    spb = _SLICE // block
    acc = jnp.zeros_like(o_ref)
    for j in range(per_word):
        code = (
            ((words >> jnp.uint32(width * j)) & mask).astype(jnp.int32) - cmax
        ).astype(jnp.bfloat16)
        s = scales[:, j * spb : (j + 1) * spb]
        sexp = _expand_scales(s, block, width).astype(jnp.bfloat16)
        w = code * sexp
        xs = x[:, j * _SLICE : (j + 1) * _SLICE].astype(jnp.bfloat16)
        acc += lax.dot_general(
            xs, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[:] += acc


def _kernel_v3(x_ref, words_ref, scales_ref, o_ref, *, width, per_word, block):
    """Biased-code path: skip the per-element -cmax sub; correct with one
    small dot per grid step: y = x@(c_biased*s)^T - cmax * blocksum(x)@s^T."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    words = words_ref[:]
    scales = scales_ref[0]  # f32 [bn, tile // block]
    xb = x_ref[:].astype(jnp.bfloat16)  # [bm, tile] — ONE cast for both paths
    mask = jnp.uint32(2**width - 1)
    cmax = 2 ** (width - 1) - 1
    spb = _SLICE // block
    acc = jnp.zeros_like(o_ref)
    for j in range(per_word):
        code = ((words >> jnp.uint32(width * j)) & mask).astype(
            jnp.int32
        ).astype(jnp.bfloat16)
        s = scales[:, j * spb : (j + 1) * spb]
        sexp = _expand_scales(s, block, width).astype(jnp.bfloat16)
        w = code * sexp  # biased: (c + cmax_true) * s, exact in bf16
        acc += lax.dot_general(
            xb[:, j * _SLICE : (j + 1) * _SLICE], w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    # correction: cmax * sum_b (sum_{k in b} x_k) * s_nb — block sums via a
    # one-hot aggregation dot (lane-friendly; no 3D reshape in Mosaic)
    bm, tile = xb.shape
    nb = tile // block
    rows = lax.broadcasted_iota(jnp.int32, (tile, nb), 0)
    cols = lax.broadcasted_iota(jnp.int32, (tile, nb), 1)
    agg = (rows // block == cols).astype(jnp.bfloat16)
    xsum = lax.dot_general(
        xb, agg, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bm, nb]
    corr = lax.dot_general(
        xsum, scales, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bm, bn]
    o_ref[:] += acc - cmax * corr


def matmul_variant(x, packed, kernel, bn=1024, dimsem=True, cost=True):
    m, k_dim = x.shape
    words, scales = packed.words, packed.scales
    n = words.shape[0]
    tile, per_word, block = packed.tile, packed.per_word, packed.block_size
    k_padded = (words.shape[1] // _SLICE) * tile
    if k_padded != k_dim:
        x = jnp.pad(x, ((0, 0), (0, k_padded - k_dim)))
    nt = k_padded // tile
    bm = min(256, max(8, m))
    bn = min(bn, n)
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), nt)
    kern = functools.partial(
        kernel, width=packed.width, per_word=per_word, block=block
    )
    params = {}
    if dimsem:
        params["dimension_semantics"] = ("parallel", "parallel", "arbitrary")
    ce = None
    if cost:
        ce = pl.CostEstimate(
            flops=2 * m * n * k_padded,
            bytes_accessed=words.size * 4 + scales.size * 4 + x.size * 4
            + m * n * 4,
            transcendentals=0,
        )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, tile), lambda i, j, k: (i, k)),
            pl.BlockSpec((bn, _SLICE), lambda i, j, k: (j, k)),
            pl.BlockSpec((1, bn, tile // block), lambda i, j, k: (k, j, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(**params) if params else None,
        cost_estimate=ce,
    )(x, words, scales)


def timed(fn, *args):
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0


def slope(make_run, lo=4, hi=16, reps=2):
    run_lo, run_hi = make_run(lo), make_run(hi)
    timed(run_lo)
    timed(run_hi)
    ts_lo = [timed(run_lo) for _ in range(reps)]
    ts_hi = [timed(run_hi) for _ in range(reps)]
    return (min(ts_hi) - min(ts_lo)) / (hi - lo)


def main():
    which = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((8, 4096)), jnp.float32)
    packs = [
        pack_block_fp_subbyte(
            jnp.asarray(rng.standard_normal((4096, 4096)) * 0.02, jnp.float32),
            6, 8, 127, [1, 16],
        )
        for _ in range(8)
    ]
    nb = packed_nbytes(packs[0])

    def make_rot(fn):
        def mk(iters):
            @jax.jit
            def run(packs, x):
                def body(x, _):
                    s = jnp.float32(0)
                    for p in packs:
                        y = fn(x, p)
                        s += y.sum()
                        x = jnp.tanh(y[:, :4096])
                    return x, s
                xf, _ = lax.scan(body, x, None, length=iters)
                return xf.sum()
            return lambda: run(packs, x0)
        return mk

    from llm_mixed_q_tpu.kernels.dequant_matmul import _subbyte_kernel

    variants = {
        "v1_dimsem": lambda x, p: matmul_variant(
            x, p, _subbyte_kernel, bn=1024, dimsem=True, cost=False),
        "v2_bf16": lambda x, p: matmul_variant(
            x, p, _kernel_v2, bn=1024, dimsem=True, cost=True),
        "v3_corr": lambda x, p: matmul_variant(
            x, p, _kernel_v3, bn=1024, dimsem=True, cost=True),
        "v3_bn2048": lambda x, p: matmul_variant(
            x, p, _kernel_v3, bn=2048, dimsem=True, cost=True),
    }
    for name, fn in variants.items():
        if which and name not in which:
            continue
        try:
            # parity first
            print(f"{name}: compiling parity check…", flush=True)
            ref = bfp_matmul_subbyte_pallas(x0, packs[0], interpret=False)
            out = jax.jit(fn)(x0, packs[0])
            err = float(jnp.max(jnp.abs(ref - out)))
            print(f"{name}: parity max|diff| = {err:.2e}; timing…", flush=True)
            per = slope(make_rot(fn)) / 8
            print(f"{name}: {per*1e6:.1f} us/mm -> {nb/per/1e9:.0f} GB/s "
                  f"(max|diff| vs v1 = {err:.2e})")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
