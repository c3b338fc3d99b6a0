"""Dequant-matmul tuning at the REAL 7B linear shapes (run on the chip).

The decode decomposition (tools/dprobe7.py, round 4) shows the packed
linear chain at 45% of its weight-stream roofline even with attention and
lm_head excluded — this harness measures the kernel alone at each of the
four per-layer shapes (fused qkv, o, fused gate_up, down) under 4-weight
rotation (nothing VMEM-resident across calls), for both storage formats
and a tile-config sweep.

Usage: python tools/ktune7.py [int8,sub] [shape substr]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

from llm_mixed_q_tpu.kernels.dequant_matmul import (
    bfp_matmul_pallas,
    bfp_matmul_subbyte_pallas,
)
from llm_mixed_q_tpu.kernels.packing import (
    pack_block_fp,
    pack_block_fp_subbyte,
    packed_nbytes,
)

SHAPES = [  # (name, N, K) of the 7B per-layer linears
    ("qkv", 12288, 4096),
    ("o", 4096, 4096),
    ("gate_up", 22016, 4096),
    ("down", 4096, 11008),
]
NROT = 4
M = 8


def slope(make_run, lo=6, hi=24, reps=2):
    run_lo, run_hi = make_run(lo), make_run(hi)

    def timed(fn):
        t0 = time.perf_counter()
        float(fn())
        return time.perf_counter() - t0

    timed(run_lo)
    timed(run_hi)
    ts_lo = [timed(run_lo) for _ in range(reps)]
    ts_hi = [timed(run_hi) for _ in range(reps)]
    return (min(ts_hi) - min(ts_lo)) / ((hi - lo) * NROT)


def bench(name, n, k, fn, packs, nb, **kw):
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal((M, k)),
                     jnp.float32)

    def mk(iters):
        @jax.jit
        def run(packs, x):
            def body(x, _):
                s = jnp.float32(0)
                for p in packs:
                    y = fn(x, p, **kw)
                    # full-output feedback (sum) so nothing is sliced away
                    s += y.sum()
                    x = x + 1e-30 * s
                return x, s

            xf, _ = lax.scan(body, x, None, length=iters)
            return xf.sum()

        return lambda: run(packs, x0)

    try:
        per = slope(mk)
        print(f"{name}: {per*1e6:7.1f} us  {nb/per/1e9:6.0f} GB/s "
              f"({nb/per/1e9/819:.2f} of peak)", flush=True)
        return per
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
        return None


def main():
    which = set((sys.argv[1] if len(sys.argv) > 1 else "int8,sub").split(","))
    only = sys.argv[2] if len(sys.argv) > 2 else ""
    rng = np.random.default_rng(0)
    for sname, n, k in SHAPES:
        if only and only not in sname:
            continue
        ws = [jnp.asarray(rng.standard_normal((n, k)) * 0.02, jnp.float32)
              for _ in range(NROT)]
        if "int8" in which:
            packs = [pack_block_fp(w, 6, 8, 127, [1, 16], k_stride=1024)
                     for w in ws]
            nb = packed_nbytes(packs[0])
            for bn, bk in ((1024, 1024), (2048, 1024), (2048, 2048),
                           (4096, 1024), (1024, 2048)):
                if bn > n or bk > k:
                    continue
                bench(f"{sname:8s} int8 bn={bn} bk={bk}", n, k,
                      bfp_matmul_pallas, packs, nb, bn=bn, bk=bk)
            del packs
        if "sub" in which:
            subs = [pack_block_fp_subbyte(w, 6, 8, 127, [1, 16]) for w in ws]
            nb = packed_nbytes(subs[0])
            nt = subs[0].words.shape[1] // 128
            tps_opts = sorted(
                {t for t in (1, 2, 3, nt // 2, nt) if t and nt % t == 0}
            )
            for bn in (1024, 2048, 4096):
                if bn > n:
                    continue
                for tps in tps_opts:
                    bench(f"{sname:8s} sub  bn={bn} tps={tps}", n, k,
                          bfp_matmul_subbyte_pallas, subs, nb, bn=bn,
                          tps=tps)
            bench(f"{sname:8s} sub  AUTO", n, k,
                  bfp_matmul_subbyte_pallas, subs, nb)
            del subs
        del ws


if __name__ == "__main__":
    main()
