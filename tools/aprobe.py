"""Decode-attention kernel decomposition probe (run on the real chip).

VERDICT r4 #1: packed_attention_decode_batch costs ~14us/batch-element/layer
at 7B decode shapes vs ~3us of KV bytes. This probe times kernel VARIANTS at
the 7B shape (b x [nh=32, hd=128] q against [hd, S*nkv=8192] packed KV) to
attribute the gap: pure DMA floor, + dequant, + matmuls, + softmax/mask,
+ prob quantize. Variants are self-contained copies of the kernel with
stages knocked out — the library kernel is untouched.

Usage: python tools/aprobe.py [--batch=32] [--s=256] [--reps=30]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llm_mixed_q_tpu.kernels.attention_decode import (
    _attn_kernel_batch,
    _expand_scales_sublane,
    _quantize_probs_strided,
    packed_attention_decode_batch,
)

NEG_INF = -1e9


def arg(flag, default):
    for a in sys.argv[1:]:
        if a.startswith(f"--{flag}="):
            return int(a.split("=")[1])
    return default


B = arg("batch", 32)
NH = NKV = 32
REP = 1
HD = 128
S = arg("s", 256)
BSK = BSV = 16
REPS = arg("reps", 30)
LANES = S * NKV
PROB_Q = (16, 6, 8, None)


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, NH, HD)), jnp.float32)
    kc = jnp.asarray(rng.integers(-31, 32, (B, HD, LANES)), jnp.int8)
    ks = jnp.asarray(
        2.0 ** rng.integers(-8, 0, (B, HD // BSK, LANES)), jnp.float32)
    vc = jnp.asarray(rng.integers(-31, 32, (B, HD, LANES)), jnp.int8)
    vs = jnp.asarray(
        2.0 ** rng.integers(-8, 0, (B, HD // BSV, LANES)), jnp.float32)
    pos = jnp.full((B,), S - 1, jnp.int32)
    return q, kc, ks, vc, vs, pos


def variant_kernel(pos_ref, q_ref, kct_ref, kst_ref, vc_ref, vs_ref, o_ref, *,
                   stage: str, dt=jnp.float32):
    """stage: dma < dequant < matmul < softmax < quant < full"""
    if stage == "dma":
        # touch every input cheaply: sum a row of each
        o_ref[0] = (
            q_ref[0]
            + kct_ref[0, :32].astype(jnp.float32) @ jnp.ones((LANES, HD), jnp.float32) * 0
            + vc_ref[0, :32].astype(jnp.float32) @ jnp.ones((LANES, HD), jnp.float32) * 0
            + kst_ref[0, :1, :HD] * 0
            + vs_ref[0, :1, :HD] * 0
        )
        return
    pos = pos_ref[pl.program_id(0)]
    kexp = _expand_scales_sublane(kst_ref[0], BSK).astype(dt)
    kd = kct_ref[0].astype(dt) * kexp
    vdt = vc_ref[0].astype(dt) * _expand_scales_sublane(vs_ref[0], BSV).astype(dt)
    q = q_ref[0].astype(dt)
    if stage == "dequant":
        # reduce dequanted arrays to output shape without big matmuls
        o_ref[0] = q + jnp.sum(kd[:, :HD] + vdt[:, :HD], axis=0)[None] * 0
        return
    st = jax.lax.dot_general(
        q, kd, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) / math.sqrt(HD)
    if stage == "matmul":
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
    if stage == "softmax":
        o_ref[0] = jax.lax.dot_general(
            p.astype(dt), vdt, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return
    p = _quantize_probs_strided(p, *PROB_Q, stride=NKV, s_len=S,
                                interpret=False)
    o_ref[0] = jax.lax.dot_general(
        p.astype(dt), vdt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def run_variant(stage, dt=jnp.float32):
    kernel = functools.partial(variant_kernel, stage=stage, dt=dt)

    @jax.jit
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
                vmem_limit_bytes=64 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * B * NH * LANES * HD,
                bytes_accessed=kc.size + vc.size + 4 * (ks.size + vs.size),
                transcendentals=B * NH * LANES,
            ),
        )(pos, q, kc, ks, vc, vs)

    return call


def time_call(fn, inputs, reps=REPS):
    pos, q, kc, ks, vc, vs = inputs[5], *inputs[:5],
    out = fn(pos, q, kc, ks, vc, vs)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(pos, q, kc, ks, vc, vs))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    assert jax.default_backend() != "cpu"
    inputs = make_inputs()
    q, kc, ks, vc, vs, pos = inputs
    data_mb = (kc.size + vc.size + 4 * (ks.size + vs.size)) / 1e6
    print(f"shape: b={B} nh={NH} hd={HD} S={S} lanes={LANES} "
          f"data={data_mb:.1f}MB floor={data_mb/819e3*1e6:.1f}us")

    # shipping kernel via the public entry
    def ship(pos_, q_, kc_, ks_, vc_, vs_):
        return packed_attention_decode_batch(
            q_, kc_, ks_, vc_, vs_, pos_, BSK, BSV, nkv=NKV, rep=REP,
            prob_q=PROB_Q, exact_q=True)

    t = time_call(jax.jit(ship), inputs)
    print(f"shipping(bf16 dots): {t*1e6:8.1f}us  {t/B*1e6:6.2f}us/elem")

    for stage in ("dma", "dequant", "matmul", "softmax", "quant"):
        for dt in ((jnp.float32, jnp.bfloat16) if stage in ("matmul", "softmax", "quant") else (jnp.float32,)):
            if stage == "quant":
                # full variant kernel == quant stage
                pass
            t = time_call(run_variant(stage, dt), inputs)
            name = f"{stage}/{jnp.dtype(dt).name[:4]}"
            print(f"{name:>16s}: {t*1e6:8.1f}us  {t/B*1e6:6.2f}us/elem")


if __name__ == "__main__":
    main()
