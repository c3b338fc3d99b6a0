"""Minimal-compile kernel probe: ONE jit per variant (iteration count is a
runtime arg via fori_loop), slope timing between two counts cancels the
tunnel RTT. Diagnoses the fused dequant-matmul's streaming rate against the
XLA bf16 dot (chip speed-of-light reference) under true weight rotation.

Usage: python tools/kprobe.py [variant,...]
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
    _subbyte_kernel,
    bfp_matmul_pallas,
)
from llm_mixed_q_tpu.kernels.packing import (
    _SLICE,
    pack_block_fp,
    pack_block_fp_subbyte,
    packed_nbytes,
)

N = K = 4096
M = 8
NROT = 8  # distinct weights per iteration (defeats VMEM residency)


def subbyte_call(x, packed, bn=2048, dimsem=True, cost=True, bm=256):
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
    grid = (pl.cdiv(m, bm), pl.cdiv(n, bn), nt)
    kern = functools.partial(
        _subbyte_kernel, width=packed.width, per_word=per_word, block=block
    )
    kwargs = {}
    if dimsem:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        )
    if cost:
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * m * n * k_padded,
            bytes_accessed=words.size * 4 + scales.size * 4,
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
        **kwargs,
    )(x, words, scales)


def probe(name, weights, call, nbytes):
    """call(x, w) -> y [M, N]. Times NROT calls/iter under rotation."""

    @jax.jit
    def run(ws, x, iters):
        def body(_, x):
            for w in ws:
                y = call(x, w)
                x = jnp.tanh(y[:, :K])
            return x
        return lax.fori_loop(0, iters, body, x).sum()

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    t0 = time.perf_counter()
    float(run(weights, x0, 1))
    t_compile = time.perf_counter() - t0

    def t(iters):
        t0 = time.perf_counter()
        float(run(weights, x0, iters))
        return time.perf_counter() - t0

    t(2)
    lo, hi = min(t(2), t(2)), min(t(10), t(10))
    per = (hi - lo) / 8 / NROT
    print(
        f"{name}: {per*1e6:7.1f} us/mm -> {nbytes/per/1e9:6.1f} GB/s weight "
        f"stream (compile {t_compile:.0f}s)",
        flush=True,
    )
    return per


def main():
    which = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else None
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)
    ws = [
        jnp.asarray(rng.standard_normal((N, K)) * 0.02, jnp.float32)
        for _ in range(NROT)
    ]

    variants = {
        # current shipped config
        "sub_bn2048_cost": (
            lambda subs: (subs, lambda x, p: subbyte_call(x, p, 2048, True, True))
        ),
        "sub_bn1024_cost": (
            lambda subs: (subs, lambda x, p: subbyte_call(x, p, 1024, True, True))
        ),
        "sub_bn1024_nocost": (
            lambda subs: (subs, lambda x, p: subbyte_call(x, p, 1024, True, False))
        ),
        "sub_bn512_nocost": (
            lambda subs: (subs, lambda x, p: subbyte_call(x, p, 512, True, False))
        ),
        "sub_bn4096_cost": (
            lambda subs: (subs, lambda x, p: subbyte_call(x, p, 4096, True, True))
        ),
    }

    subs = None
    p8s = None
    for name, make in variants.items():
        if which and name not in which:
            continue
        if subs is None:
            subs = [pack_block_fp_subbyte(w, 6, 8, 127, [1, 16]) for w in ws]
            nb_sub = packed_nbytes(subs[0])
        weights, call = make(subs)
        try:
            probe(name, weights, call, nb_sub)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

    if which is None or "int8" in which:
        p8s = [pack_block_fp(w, 6, 8, 127, [1, 16]) for w in ws]
        nb8 = packed_nbytes(p8s[0])
        try:
            probe("int8_default", p8s,
                  lambda x, p: bfp_matmul_pallas(x, p), nb8)
        except Exception as e:
            print(f"int8_default: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    if which is None or "bf16" in which:
        wbf = [w.astype(jnp.bfloat16) for w in ws]

        def bf16dot(x, w):
            return lax.dot_general(
                x.astype(jnp.bfloat16), w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        probe("bf16_xla_dot", wbf, bf16dot, 2 * N * K)


if __name__ == "__main__":
    main()
