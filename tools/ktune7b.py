"""Pipelining-variant sweep for the int8/sub-byte dequant-matmul at the 7B
qkv shape (12288 x 4096) — the big-N shapes stall at ~0.6 HBM util while
the 4096 x 4096 shape reaches 0.90 with the same tile config
(tools/ktune7.py, round 4). Variants probe grid order (k-innermost vs
j-innermost), cost estimate on/off, dimension semantics, and tile sizes.

Usage: python tools/ktune7b.py [N [K]]
"""

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_mixed_q_tpu.kernels.dequant_matmul import (
    _dequant_matmul_kernel,
    _subbyte_kernel,
)
from llm_mixed_q_tpu.kernels.packing import (
    _SLICE,
    pack_block_fp,
    pack_block_fp_subbyte,
    packed_nbytes,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 12288
K = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
M = 8
NROT = 4


def int8_call(x, packed, bn, bk, cost=True, dimsem=True, j_inner=False):
    m, k_dim = x.shape
    codes, scales = packed.codes, packed.scales
    n, k_padded = codes.shape
    block = packed.block_size
    bm = min(8, max(8, m))
    nk = k_padded // bk
    kern = functools.partial(_dequant_matmul_kernel, block=block, n_k=nk)
    scales = scales.reshape(n, nk, bk // block).transpose(1, 0, 2)
    kwargs = {}
    if cost:
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * m * n * k_padded,
            bytes_accessed=codes.size + scales.size * 4,
            transcendentals=0,
        )
    if j_inner:
        # grid (i, k, j): j innermost — output tiles revisited across the
        # OUTER k axis (total out [8, N] f32 lives in VMEM), codes DMA walks
        # row-blocks at fixed k band
        def kern_j(x_ref, c_ref, s_ref, o_ref, *, block, n_k):
            kk = pl.program_id(1)

            @pl.when(kk == 0)
            def _():
                o_ref[:] = jnp.zeros_like(o_ref)

            from llm_mixed_q_tpu.kernels.dequant_matmul import _expand_scales

            codes_t = c_ref[:].astype(jnp.bfloat16)
            w = codes_t * _expand_scales(
                s_ref[0], block, dtype=jnp.bfloat16
            )
            o_ref[:] += jax.lax.dot_general(
                x_ref[:].astype(jnp.bfloat16), w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        if dimsem:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "parallel")
            )
        return pl.pallas_call(
            functools.partial(kern_j, block=block, n_k=nk),
            grid=(pl.cdiv(m, bm), nk, pl.cdiv(n, bn)),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, k, j: (i, k)),
                pl.BlockSpec((bn, bk), lambda i, k, j: (j, k)),
                pl.BlockSpec((1, bn, bk // block), lambda i, k, j: (k, j, 0)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, k, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            **kwargs,
        )(x, codes, scales)
    if dimsem:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        )
    return pl.pallas_call(
        kern,
        grid=(pl.cdiv(m, bm), pl.cdiv(n, bn), nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bn, bk), lambda i, j, k: (j, k)),
            pl.BlockSpec((1, bn, bk // block), lambda i, j, k: (k, j, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        **kwargs,
    )(x, codes, scales)


def sub_call(x, packed, bn, ks=1, cost=True):
    """ks: packing tiles per grid step (longer codes DMA per step)."""
    m, k_dim = x.shape
    words, scales = packed.words, packed.scales
    n = words.shape[0]
    tile, per_word, block = packed.tile, packed.per_word, packed.block_size
    k_padded = (words.shape[1] // _SLICE) * tile
    if k_padded != k_dim:
        x = jnp.pad(x, ((0, 0), (0, k_padded - k_dim)))
    nt = k_padded // tile
    while nt % ks:
        ks -= 1
    tpb = tile // block
    bm = 8

    def kern(x_ref, w_ref, s_ref, o_ref):
        kk = pl.program_id(2)

        @pl.when(kk == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        from llm_mixed_q_tpu.kernels.dequant_matmul import _expand_scales

        mask = jnp.uint32(2**packed.width - 1)
        cmax = 2 ** (packed.width - 1) - 1
        codes = jnp.concatenate(
            [
                (
                    (w_ref[:, s * _SLICE : (s + 1) * _SLICE]
                     >> jnp.uint32(packed.width * j))
                    & mask
                ).astype(jnp.int32)
                for s in range(ks)
                for j in range(per_word)
            ],
            axis=1,
        )
        e8 = jnp.concatenate([s_ref[s] for s in range(ks)], axis=1)
        ei = jnp.clip(e8.astype(jnp.int32) - 128, -126, 127)
        s = jax.lax.bitcast_convert_type((ei + 127) << 23, jnp.float32)
        sexp = _expand_scales(s.astype(jnp.bfloat16), block,
                              dtype=jnp.bfloat16)
        w = (codes - cmax).astype(jnp.bfloat16) * sexp
        o_ref[:] += jax.lax.dot_general(
            x_ref[:].astype(jnp.bfloat16), w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    kwargs = {
        "compiler_params": pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        )
    }
    if cost:
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * m * n * k_padded,
            bytes_accessed=words.size * 4 + scales.size,
            transcendentals=0,
        )
    return pl.pallas_call(
        kern,
        grid=(pl.cdiv(m, bm), pl.cdiv(n, bn), nt // ks),
        in_specs=[
            pl.BlockSpec((bm, ks * tile), lambda i, j, k: (i, k)),
            pl.BlockSpec((bn, ks * _SLICE), lambda i, j, k: (j, k)),
            pl.BlockSpec((ks, bn, tpb), lambda i, j, k: (k, j, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        **kwargs,
    )(x, words, scales)


def probe(name, weights, call, nbytes):
    @functools.partial(jax.jit, static_argnums=(2,))
    def run(ws, x, iters):
        def body(x, _):
            s = jnp.float32(0)
            for w in ws:
                y = call(x, w)
                s += y.sum()
                x = x + 1e-30 * s
            return x, None

        xf, _ = lax.scan(body, x, None, length=iters)
        return xf.sum()

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)

    def t(iters):
        t0 = time.perf_counter()
        float(run(weights, x0, iters))
        return time.perf_counter() - t0

    try:
        t(4)
        t(16)
        lo, hi = min(t(4), t(4)), min(t(16), t(16))
        per = (hi - lo) / 12 / NROT
        print(f"{name}: {per*1e6:7.1f} us  {nbytes/per/1e9:6.0f} GB/s "
              f"({nbytes/per/1e9/819:.2f})", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__} {str(e)[:120]}", flush=True)


def main():
    rng = np.random.default_rng(0)
    ws = [jnp.asarray(rng.standard_normal((N, K)) * 0.02, jnp.float32)
          for _ in range(NROT)]
    p8s = [pack_block_fp(w, 6, 8, 127, [1, 16]) for w in ws]
    nb8 = packed_nbytes(p8s[0])
    for name, kw in [
        ("int8 bn1024 bk1024", dict(bn=1024, bk=1024)),
        ("int8 bn1024 bk1024 nocost", dict(bn=1024, bk=1024, cost=False)),
        ("int8 bn1024 bk1024 nodim", dict(bn=1024, bk=1024, dimsem=False)),
        ("int8 bn512 bk1024", dict(bn=512, bk=1024)),
        ("int8 bn1024 bk512", dict(bn=1024, bk=512)),
        ("int8 bn1024 bk1024 j_inner", dict(bn=1024, bk=1024, j_inner=True)),
        ("int8 bn2048 bk512", dict(bn=2048, bk=512)),
        ("int8 bn512 bk4096", dict(bn=512, bk=4096)),
        ("int8 bn256 bk4096", dict(bn=256, bk=4096)),
        ("int8 bn512 bk2048", dict(bn=512, bk=2048)),
    ]:
        probe(name, p8s, lambda x, p, kw=kw: int8_call(x, p, **kw), nb8)
    del p8s
    subs = [pack_block_fp_subbyte(w, 6, 8, 127, [1, 16]) for w in ws]
    nbs = packed_nbytes(subs[0])
    for name, kw in [
        ("sub bn2048 ks1", dict(bn=2048, ks=1)),
        ("sub bn2048 ks2", dict(bn=2048, ks=2)),
        ("sub bn1024 ks2", dict(bn=1024, ks=2)),
        ("sub bn1024 ks4", dict(bn=1024, ks=4)),
        ("sub bn4096 ks2", dict(bn=4096, ks=2)),
    ]:
        probe(name, subs, lambda x, p, kw=kw: sub_call(x, p, **kw), nbs)


if __name__ == "__main__":
    main()
