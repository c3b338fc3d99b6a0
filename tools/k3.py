"""Attention kernel v3 experiments (chained-slope timing, run on chip).

Stage knockouts of the v2 batch kernel to attribute its 7.3us/elem VPU cost,
plus candidate v3 kernels with resident mask inputs and trimmed quantize
math. All timings are fori_loop slopes (see tools/achain.py docstring — the
tunnel's per-dispatch cost invalidates standalone timing).

Usage: python tools/k3.py [--batch=32] [--reps=5] [--only=name]
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

from llm_mixed_q_tpu.kernels.attention_decode import (
    _expand_scales_sublane,
    _exp2_exact,
    _quantize_probs_strided,
    packed_attention_decode_batch,
)

NEG_INF = -1e9
_ATOL = 1e-8


def arg(flag, default):
    for a in sys.argv[1:]:
        if a.startswith(f"--{flag}="):
            try:
                return int(a.split("=")[1])
            except ValueError:
                return a.split("=")[1]
    return default


B = arg("batch", 32)
REPS = arg("reps", 5)
ONLY = arg("only", "")
NH = NKV = 32
REP = 1
HD = 128
S = 256
BSK = BSV = 16
LANES = S * NKV
PROB_Q = (16, 6, 8, None)
WIDTH, EW = 6, 8


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, NH, HD)), jnp.float32)
    kc = jnp.asarray(rng.integers(-31, 32, (B, HD, LANES)), jnp.int8)
    ks = jnp.asarray(2.0 ** rng.integers(-8, 0, (B, HD // BSK, LANES)), jnp.float32)
    vc = jnp.asarray(rng.integers(-31, 32, (B, HD, LANES)), jnp.int8)
    vs = jnp.asarray(2.0 ** rng.integers(-8, 0, (B, HD // BSV, LANES)), jnp.float32)
    pos = jnp.full((B,), S - 1, jnp.int32)
    return q, kc, ks, vc, vs, pos


def chain(call, inputs):
    q0, kc, ks, vc, vs, pos = inputs

    @jax.jit
    def run(q0, kc, ks, vc, vs, pos, n):
        def body(i, q):
            ctx = call(pos, q, kc, ks, vc, vs)
            return q * 0.999 + 1e-3 * ctx
        return lax.fori_loop(0, n, body, q0).sum()

    jax.block_until_ready(run(q0, kc, ks, vc, vs, pos, 1))

    def t_at(n):
        t0 = time.perf_counter()
        float(run(q0, kc, ks, vc, vs, pos, n))
        return time.perf_counter() - t0

    # hi*per-iter must dwarf the ~25ms tunnel dispatch jitter or the
    # slope is noise (round-5 finding: 35% run-to-run swings at hi=64)
    t_at(40)
    lo = min(t_at(40) for _ in range(REPS))
    hi = min(t_at(360) for _ in range(REPS))
    return (hi - lo) / 320


# ---------------------------------------------------------------- v2 stages
def v2_kernel(pos_ref, q_ref, kct_ref, kst_ref, vc_ref, vs_ref, o_ref, *,
              stage: str):
    pos = pos_ref[pl.program_id(0)]
    dt = jnp.bfloat16
    kexp = _expand_scales_sublane(kst_ref[0], BSK).astype(dt)
    kd = kct_ref[0].astype(dt) * kexp
    vdt = vc_ref[0].astype(dt) * _expand_scales_sublane(vs_ref[0], BSV).astype(dt)
    q = q_ref[0].astype(dt)
    st = jax.lax.dot_general(
        q, kd, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) / math.sqrt(HD)
    if stage == "dots":
        o_ref[0] = jax.lax.dot_general(
            st.astype(dt), vdt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return
    lane = jax.lax.broadcasted_iota(jnp.int32, st.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
    valid = (lane // NKV <= pos) & (lane % NKV == row // REP) & (row < NH)
    st = jnp.where(valid, st, NEG_INF)
    m = jnp.max(st, axis=1, keepdims=True)
    e = jnp.exp(st - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)
    if stage == "qmax":
        # butterfly block-max only (no exponent/mantissa math)
        from llm_mixed_q_tpu.kernels.attention_decode import _roll_lanes
        pm = p
        lane = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        pos2 = lane // NKV
        s = 1
        while s < 16:
            high = (pos2 // s) % 2 == 1
            partner = jnp.where(high, _roll_lanes(pm, s * NKV, False),
                                _roll_lanes(pm, -s * NKV, False))
            pm = jnp.maximum(pm, partner)
            s *= 2
        p = pm
    elif stage == "qmath":
        # exponent/mantissa chain with a fake per-lane "block max" (= p)
        from llm_mixed_q_tpu.kernels.attention_decode import _exp2_exact
        pm = p
        exponent = jnp.clip(jnp.ceil(jnp.log2(pm)), -127.0, 128.0)
        two_e = _exp2_exact(exponent)
        inv_e = _exp2_exact(-exponent)
        mant = jnp.clip(jnp.round((p + 1e-9) * (inv_e * 32.0)), 0.0, 31.0)
        q = two_e * (mant * (1.0 / 32.0))
        p = jnp.where(p <= 1e-8, p, q)
    elif stage != "softmax":
        p = _quantize_probs_strided(p, *PROB_Q, stride=NKV, s_len=S,
                                    interpret=False)
    o_ref[0] = jax.lax.dot_general(
        p.astype(dt), vdt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def call_v2(stage):
    kernel = functools.partial(v2_kernel, stage=stage)

    def call(pos, q, kc, ks, vc, vs):
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, NH, HD), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, HD, LANES), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, HD // BSK, LANES), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, HD, LANES), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, HD // BSV, LANES), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, NH, HD), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, NH, HD), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * B * NH * LANES * HD,
                bytes_accessed=kc.size + vc.size + 4 * (ks.size + vs.size),
                transcendentals=B * NH * LANES,
            ),
        )(pos, q, kc, ks, vc, vs)

    return call


# ------------------------------------------------------- v3: resident masks
def v3_kernel(pos_ref, negb_ref, posi_ref, q_ref, kct_ref, kst_ref, vc_ref,
              vs_ref, o_ref, *, compact_quant: bool, gq_ref=None):
    pos = pos_ref[pl.program_id(0)]
    dt = jnp.bfloat16
    kexp = _expand_scales_sublane(kst_ref[0], BSK).astype(dt)
    kd = kct_ref[0].astype(dt) * kexp
    vdt = vc_ref[0].astype(dt) * _expand_scales_sublane(vs_ref[0], BSV).astype(dt)
    q = q_ref[0].astype(dt)
    st = jax.lax.dot_general(
        q, kd, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) / math.sqrt(HD)
    # resident masks: negb = 0 on this row's own-head lanes else -inf;
    # posi = lane // nkv (causal index), both loaded once (constant index_map)
    st = st + negb_ref[:]
    st = jnp.where(posi_ref[:] <= pos, st, NEG_INF)
    m = jnp.max(st, axis=1, keepdims=True)
    e = jnp.exp(st - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)
    p = _quantize_probs_strided(p, *PROB_Q, stride=NKV, s_len=S,
                                interpret=False)
    o_ref[0] = jax.lax.dot_general(
        p.astype(dt), vdt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def call_v3():
    # resident inputs
    lane = np.arange(LANES)
    row = np.arange(NH)
    negb = np.where(lane[None, :] % NKV == (row[:, None] // REP), 0.0,
                    NEG_INF).astype(np.float32)
    posi = np.broadcast_to((lane // NKV).astype(np.int32), (NH, LANES))
    negb = jnp.asarray(negb)
    posi = jnp.asarray(np.ascontiguousarray(posi))
    kernel = functools.partial(v3_kernel, compact_quant=False)

    def call(pos, q, kc, ks, vc, vs):
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((NH, LANES), lambda i: (0, 0)),
                pl.BlockSpec((NH, LANES), lambda i: (0, 0)),
                pl.BlockSpec((1, NH, HD), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, HD, LANES), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, HD // BSK, LANES), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, HD, LANES), lambda i: (i, 0, 0)),
                pl.BlockSpec((1, HD // BSV, LANES), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, NH, HD), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, NH, HD), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * B * NH * LANES * HD,
                bytes_accessed=kc.size + vc.size + 4 * (ks.size + vs.size),
                transcendentals=B * NH * LANES,
            ),
        )(pos, negb, posi, q, kc, ks, vc, vs)

    return call


def main():
    assert jax.default_backend() != "cpu"
    inputs = make_inputs()
    kc = inputs[1]
    data_mb = (inputs[1].size + inputs[3].size
               + 4 * (inputs[2].size + inputs[4].size)) / 1e6
    print(f"b={B} data={data_mb:.1f}MB floor@700={data_mb/700*1e3:.0f}us")

    runs = {}
    runs["ship"] = lambda: chain(
        lambda pos, q, kc, ks, vc, vs: packed_attention_decode_batch(
            q, kc, ks, vc, vs, pos, BSK, BSV, nkv=NKV, rep=REP,
            prob_q=PROB_Q, exact_q=True),
        inputs)
    runs["v2_dots"] = lambda: chain(call_v2("dots"), inputs)
    runs["v2_softmax"] = lambda: chain(call_v2("softmax"), inputs)
    runs["v2_qmax"] = lambda: chain(call_v2("qmax"), inputs)
    runs["v2_qmath"] = lambda: chain(call_v2("qmath"), inputs)
    runs["v2_full"] = lambda: chain(call_v2("full"), inputs)
    runs["v3_masks"] = lambda: chain(call_v3(), inputs)

    for name, fn in runs.items():
        if ONLY and ONLY not in name:
            continue
        t = fn()
        print(f"{name:>12s}: {t*1e6:7.1f}us/layer  ({t/B*1e6:.2f}us/elem)",
              flush=True)


if __name__ == "__main__":
    main()
