"""Kernel ground-truth + tuning harness (run on the real chip).

Separates tunnel RTT from device time by timing scans of two lengths and
taking the slope: per_iter = (t(hi) - t(lo)) / (hi - lo).

Usage: python tools/ktune.py [base,kern,rot]   (stage selection)
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, *args):
    """Wall time of one call incl. scalar fetch."""
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0


def slope(make_run, lo=8, hi=40, reps=2):
    """Per-iteration device time, RTT cancelled."""
    run_lo, run_hi = make_run(lo), make_run(hi)
    timed(run_lo)  # compile
    timed(run_hi)
    ts_lo = [timed(run_lo) for _ in range(reps)]
    ts_hi = [timed(run_hi) for _ in range(reps)]
    return (min(ts_hi) - min(ts_lo)) / (hi - lo), min(ts_lo)


def _x0(rng, k=4096):
    return jnp.asarray(rng.standard_normal((8, k)), jnp.float32)


def _base_stage(rng):
    one = jax.jit(lambda: jnp.float32(1.0))
    float(one())
    rtts = [timed(one) for _ in range(5)]
    print(f"RTT (trivial fetch): min {min(rtts)*1e3:.2f}ms med {sorted(rtts)[2]*1e3:.2f}ms")

    big = jnp.ones((256, 1024, 1024), jnp.float32)  # 1GB
    jax.block_until_ready(big)

    def make_sum_run(iters):
        @jax.jit
        def run(x, s0):
            def body(s, _):
                # carry-dependent -> the 1GB read cannot be hoisted
                return (x + s).sum() * 1e-12, None
            s, _ = lax.scan(body, s0, None, length=iters)
            return s
        return lambda: run(big, jnp.float32(0.0))

    per, _ = slope(make_sum_run)
    print(f"1GB f32 sum: {per*1e3:.3f} ms/iter -> read BW {1.0737/per:.0f} GB/s")

    wbig = jnp.asarray(rng.standard_normal((8192, 8192)) * 0.02, jnp.bfloat16)
    x0b = jnp.asarray(rng.standard_normal((8, 8192)), jnp.bfloat16)

    def make_mmbig_run(iters):
        @jax.jit
        def run(w, x):
            def body(x, _):
                y = lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                return jnp.tanh(y).astype(jnp.bfloat16), None
            xf, _ = lax.scan(body, x, None, length=iters)
            return xf.sum()
        return lambda: run(wbig, x0b)

    per, _ = slope(make_mmbig_run)
    print(f"bf16 mm 8x8192x8192 (134MB>VMEM): {per*1e6:.1f} us/iter -> "
          f"{2*8192*8192/per/1e9:.0f} GB/s")


def _kern_stage(rng):
    """Single-weight fused-kernel variants (VMEM residency may flatter)."""
    from llm_mixed_q_tpu.kernels.dequant_matmul import (
        bfp_matmul_pallas,
        bfp_matmul_subbyte_pallas,
    )
    from llm_mixed_q_tpu.kernels.packing import (
        pack_block_fp,
        pack_block_fp_subbyte,
        packed_nbytes,
    )

    w = jnp.asarray(rng.standard_normal((4096, 4096)) * 0.02, jnp.float32)
    x0 = _x0(rng)
    sub = pack_block_fp_subbyte(w, 6, 8, 127, [1, 16])
    p8 = pack_block_fp(w, 6, 8, 127, [1, 16])
    nb_sub, nb_8 = packed_nbytes(sub), packed_nbytes(p8)

    def make_kernel_run(packed, fn, **kw):
        def mk(iters):
            @jax.jit
            def run(packed, x):
                def body(x, _):
                    y = fn(x, packed, **kw)
                    return jnp.tanh(y[:, :4096]), None
                xf, _ = lax.scan(body, x, None, length=iters)
                return xf.sum()
            return lambda: run(packed, x0)
        return mk

    for name, packed, fn, nb, kw in [
        ("subbyte bn=1024", sub, bfp_matmul_subbyte_pallas, nb_sub, {"bn": 1024}),
        ("subbyte bn=4096", sub, bfp_matmul_subbyte_pallas, nb_sub, {"bn": 4096}),
        ("int8 bn=1024 bk=1024", p8, bfp_matmul_pallas, nb_8,
         {"bn": 1024, "bk": 1024}),
    ]:
        try:
            per, _ = slope(make_kernel_run(packed, fn, **kw))
            print(f"{name}: {per*1e6:.1f} us/iter -> {nb/per/1e9:.0f} GB/s weight stream")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")
        sys.stdout.flush()


def _rot_stage(rng):
    """ROTATION: 8 distinct packed weights (~154MB > VMEM) per iteration —
    true HBM streaming like a real multi-layer decode step."""
    from llm_mixed_q_tpu.kernels.dequant_matmul import bfp_matmul_subbyte_pallas
    from llm_mixed_q_tpu.kernels.packing import (
        pack_block_fp_subbyte,
        packed_nbytes,
    )

    x0 = _x0(rng)
    packs = [
        pack_block_fp_subbyte(
            jnp.asarray(rng.standard_normal((4096, 4096)) * 0.02, jnp.float32),
            6, 8, 127, [1, 16],
        )
        for _ in range(8)
    ]
    nb_sub = packed_nbytes(packs[0])

    def make_rot_run(fn, **kw):
        def mk(iters):
            @jax.jit
            def run(packs, x):
                def body(x, _):
                    s = jnp.float32(0)
                    for p in packs:
                        y = fn(x, p, **kw)
                        s += y.sum()
                        x = jnp.tanh(y[:, :4096])
                    return x, s
                xf, _ = lax.scan(body, x, None, length=iters)
                return xf.sum()
            return lambda: run(packs, x0)
        return mk

    for name, kw in [
        ("rot8 subbyte bn=1024", {"bn": 1024}),
        ("rot8 subbyte bn=4096", {"bn": 4096}),
    ]:
        try:
            per, _ = slope(make_rot_run(bfp_matmul_subbyte_pallas, **kw),
                           lo=4, hi=16)
            per /= 8
            print(f"{name}: {per*1e6:.1f} us/mm -> {nb_sub/per/1e9:.0f} GB/s weight stream")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")
        sys.stdout.flush()

    wrot = [jnp.asarray(rng.standard_normal((4096, 4096)) * 0.02, jnp.bfloat16)
            for _ in range(8)]

    def make_rotb_run(iters):
        @jax.jit
        def run(ws, x):
            def body(x, _):
                s = jnp.float32(0)
                for w in ws:
                    y = lax.dot_general(x.astype(jnp.bfloat16), w,
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                    s += y.sum()
                    x = jnp.tanh(y)
                return x, s
            xf, _ = lax.scan(body, x, None, length=iters)
            return xf.sum()
        return lambda: run(wrot, x0)

    per, _ = slope(make_rotb_run, lo=4, hi=16)
    per /= 8
    print(f"rot8 bf16 XLA dot: {per*1e6:.1f} us/mm -> "
          f"{2*4096*4096/per/1e9:.0f} GB/s weight stream")


def main():
    stages = set((sys.argv[1] if len(sys.argv) > 1 else "base,kern,rot").split(","))
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    if "base" in stages:
        _base_stage(rng)
    if "kern" in stages:
        _kern_stage(rng)
    if "rot" in stages:
        _rot_stage(rng)


if __name__ == "__main__":
    main()
