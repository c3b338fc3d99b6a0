"""Sublane scale-expansion primitive shootout (run on the chip).

Round-5: the one-hot expansion dot costs a full padded MXU pass per
[128, L] expansion (K=nb pads to 128); it is ~45% of the big-N weight
kernels and ~25% of the attention kernel. Candidate replacements must beat
it under Mosaic's actual lowering — the obvious 3-D broadcast-mul measured
SLOWER in-situ. This probe times one dequant (codes [128, L] * expanded
scales [8, L]) + a reduction dot inside a minimal kernel, per variant:

  dot       — one-hot [128, 8] @ [8, L] expansion matmul (shipping r4)
  bcast3d   — codes.reshape(8,16,L) * scales[:,None,:] fused broadcast
  bcastmat  — broadcast_in_dim to (8,16,L) -> reshape -> mul
  repeat    — jnp.repeat(scales, 16, axis=0) -> mul
  rollfill  — log2(16) sublane-roll max-fill from a strided placement
  none      — no dequant (floor)

Usage: python tools/kexp.py [--l=8192] [--b=32] [--reps=3]
"""

import functools
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


def arg(flag, default):
    for a in sys.argv[1:]:
        if a.startswith(f"--{flag}="):
            return int(a.split("=")[1])
    return default


L = arg("l", 8192)
B = arg("b", 32)
REPS = arg("reps", 3)
HD = 128
BS = 16
NB = HD // BS


def kernel(q_ref, c_ref, s_ref, o_ref, *, variant):
    c = c_ref[0]  # int8 [HD, L]
    s = s_ref[0]  # f32 [NB, L]
    dt = jnp.bfloat16
    if variant == "none":
        w = c.astype(dt)
    elif variant == "dot":
        rows = jax.lax.broadcasted_iota(jnp.int32, (HD, NB), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (HD, NB), 1)
        expand = (rows // BS == cols).astype(jnp.float32)
        sexp = jax.lax.dot_general(
            expand, s, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        w = c.astype(dt) * sexp.astype(dt)
    elif variant == "bcast3d":
        c3 = c.reshape(NB, BS, L).astype(dt)
        w = (c3 * s.astype(dt)[:, None, :]).reshape(HD, L)
    elif variant == "bcastmat":
        sexp = jax.lax.broadcast_in_dim(
            s.astype(dt), (NB, BS, L), (0, 2)).reshape(HD, L)
        w = c.astype(dt) * sexp
    elif variant == "repeat":
        w = c.astype(dt) * jnp.repeat(s.astype(dt), BS, axis=0)
    elif variant == "rollfill":
        # place s rows at sublanes 16b via an 8->128 sublane pad-concat,
        # then log-fill downward with sublane rolls + row-parity selects
        z = jnp.pad(s.astype(dt), ((0, HD - NB), (0, 0)))
        # spread rows b -> 16b: single gather-free trick: roll each row
        # group; 8 rows to strided places needs 8 selects — do the dumb
        # but vectorized version: iterative doubling of spacing
        # rows: [s0..s7, 0...]; step k doubles spacing from 2^k
        for step in (1, 2, 4):  # spacing 2 -> 4 -> 8 -> 16 after 4 steps
            pass
        # placement via 4 masked rolls: row r holds s_{r/16} iff r%16==0
        row = jax.lax.broadcasted_iota(jnp.int32, (HD, L), 0)
        z2 = jnp.zeros((HD, L), dt)
        for b in range(NB):
            z2 = jnp.where(row == 16 * b,
                           pltpu.roll(z, 16 * b - b, axis=0), z2)
        # fill: copy down 1,2,4,8
        for sft in (1, 2, 4, 8):
            z2 = jnp.where((row % 16) >= sft, pltpu.roll(z2, sft, axis=0),
                           z2)
        w = c.astype(dt) * z2
    q = q_ref[0].astype(dt)  # [8, HD]
    o_ref[0] = jax.lax.dot_general(
        q, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def make_call(variant):
    kfn = functools.partial(kernel, variant=variant)

    def call(q, c, s):
        return pl.pallas_call(
            kfn,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, 8, HD), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, HD, L), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, NB, L), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, L), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, 8, L), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * B * 8 * HD * L,
                bytes_accessed=B * (HD * L + 4 * NB * L),
                transcendentals=0,
            ),
        )(q, c, s)

    return call


def chain(call, q0, c, s):
    @jax.jit
    def run(q0, c, s, n):
        def body(i, q):
            o = call(q, c, s)
            return (q * 0.999 + 1e-6 * o[:, :, :HD]).astype(q.dtype)
        return lax.fori_loop(0, n, body, q0).sum()

    jax.block_until_ready(run(q0, c, s, 1))

    def t_at(n):
        t0 = time.perf_counter()
        float(run(q0, c, s, n))
        return time.perf_counter() - t0

    # hi*per-iter must dwarf the ~25ms tunnel dispatch jitter
    t_at(100)
    lo = min(t_at(100) for _ in range(REPS))
    hi = min(t_at(1100) for _ in range(REPS))
    return (hi - lo) / 1000


def main():
    assert jax.default_backend() != "cpu"
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.standard_normal((B, 8, HD)), jnp.float32)
    c = jnp.asarray(rng.integers(-31, 32, (B, HD, L)), jnp.int8)
    s = jnp.asarray(2.0 ** rng.integers(-8, 0, (B, NB, L)), jnp.float32)
    data = (c.size + 4 * s.size) / 1e6
    print(f"B={B} L={L} data={data:.1f}MB floor@819={data/819e3*1e6:.0f}us",
          flush=True)
    base = None
    for variant in ("none", "dot", "bcast3d", "bcastmat", "repeat",
                    "rollfill"):
        try:
            t = chain(make_call(variant), q0, c, s)
        except Exception as e:
            print(f"  {variant:>9s}: FAILED {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)
            continue
        if variant == "none":
            base = t
        print(f"  {variant:>9s}: {t*1e6:7.1f}us"
              + (f"  (+{(t-base)*1e6:6.1f}us dequant)" if base else ""),
              flush=True)


if __name__ == "__main__":
    main()
