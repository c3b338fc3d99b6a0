"""Chained-slope attention decomposition (dispatch-overhead-proof).

tools/aglue.py's standalone timings are invalid on this tunnel: certain
programs pay a fixed ~25ms dispatch cost (measured t4 == t64 for a 2us/iter
loop body). This probe times everything as per-iteration SLOPES of a
fori_loop inside ONE jit — the same methodology as tools/dprobe7.py — so
fixed dispatch cost cancels.

Pieces (per layer, batch B, 7B geometry):
  kernel    — packed_attention_decode_batch only (ctx fed back into q)
  glue      — rope + q-quant + encode + append (no kernel; ctx := q)
  attn      — glue + kernel (the full _attention_cached minus linears)

Usage: python tools/achain.py [--batch=32] [--reps=5]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from functools import partial

sys.argv = [a for a in sys.argv]

from __graft_entry__ import BFP6
from bench import llama_cfg
from llm_mixed_q_tpu.models.llama import serving as S
from llm_mixed_q_tpu.models.llama.modeling import _node_cfg, rope_tables
from llm_mixed_q_tpu.ops.functions import (
    make_entry_quantizer,
    quantized_apply_rotary_pos_emb,
)
from llm_mixed_q_tpu.kernels.attention_decode import (
    packed_attention_decode_batch,
    prob_q_spec,
)


def arg(flag, default):
    for a in sys.argv[1:]:
        if a.startswith(f"--{flag}="):
            return int(a.split("=")[1])
    return default


B = arg("batch", 32)
REPS = arg("reps", 5)
MAXLEN = 256
HIDDEN, INTER, VOCAB = 4096, 11008, 32000

config = llama_cfg(HIDDEN, INTER, 2, VOCAB, BFP6)
NH, NKV, HD = (config.num_attention_heads, config.num_key_value_heads,
               config.head_dim)
REP = NH // NKV
qc = partial(_node_cfg, config.quant_config, 0, "self_attn")
spec = S.kv_cache_pack_spec(config)
PROBQ = prob_q_spec(qc("matmul_1"), MAXLEN)


def slope(make_body, carry0, lo=8, hi=64):
    """Per-iteration seconds of body chained in a fori_loop."""

    @jax.jit
    def run(carry, n):
        out = lax.fori_loop(0, n, make_body, carry)
        return jax.tree.map(
            lambda x: x.astype(jnp.float32).sum()
            if isinstance(x, jax.Array) else x, out)

    jax.block_until_ready(run(carry0, 1))

    def t_at(n):
        t0 = time.perf_counter()
        jax.block_until_ready(run(carry0, n))
        return time.perf_counter() - t0

    t_at(lo)
    t_lo = min(t_at(lo) for _ in range(REPS))
    t_hi = min(t_at(hi) for _ in range(REPS))
    return (t_hi - t_lo) / (hi - lo)


def main():
    rng = np.random.default_rng(0)
    q4 = jnp.asarray(rng.standard_normal((B, NH, 1, HD)), jnp.float32)
    k4 = jnp.asarray(rng.standard_normal((B, NKV, 1, HD)), jnp.float32)
    v4 = jnp.asarray(rng.standard_normal((B, NKV, 1, HD)), jnp.float32)
    cos, sin = rope_tables(MAXLEN, HD, config.rope_theta, jnp.float32)
    pos_scalar = jnp.int32(MAXLEN // 2)

    cache = S.init_packed_kv_cache(config, B, MAXLEN, spec)
    layer0 = (cache.k_codes[0], cache.k_scales[0],
              cache.v_codes[0], cache.v_scales[0])
    # non-trivial cache contents (zero codes short-circuit nothing, but keep
    # the value paths realistic)
    kc0 = jnp.asarray(rng.integers(-31, 32, layer0[0].shape), jnp.int8)
    ks0 = jnp.asarray(2.0 ** rng.integers(-8, 0, layer0[1].shape), jnp.float32)
    vc0 = jnp.asarray(rng.integers(-31, 32, layer0[2].shape), jnp.int8)
    vs0 = jnp.asarray(2.0 ** rng.integers(-8, 0, layer0[3].shape), jnp.float32)
    layer0 = (kc0, ks0, vc0, vs0)

    data_mb = sum(x.size * x.dtype.itemsize for x in layer0) / 1e6
    print(f"b={B} S={MAXLEN} kv-bytes/layer={data_mb:.1f}MB "
          f"@1.5TB/s={data_mb/1.5e3*1e3:.0f}us @819GB/s={data_mb/819*1e3:.0f}us",
          flush=True)

    positions_b = jnp.broadcast_to(pos_scalar, (B,))

    # --- kernel only
    def body_kernel(i, carry):
        q, layer = carry
        kc, ks, vc, vs = layer
        ctx = packed_attention_decode_batch(
            q.reshape(B, NH, HD), kc, ks, vc, vs, positions_b,
            spec[0], spec[1], nkv=NKV, rep=REP, prob_q=PROBQ, exact_q=True)
        q2 = q * 0.999 + 1e-3 * ctx.reshape(B, NH, 1, HD)
        return (q2, layer)

    t = slope(body_kernel, (q4, layer0))
    print(f"kernel : {t*1e6:7.1f}us/layer  ({t/B*1e6:.2f}us/elem)", flush=True)

    # --- glue only (rope + qquant + encode + append, no kernel)
    def glue(q, k, v, layer):
        pos_ids = positions_b[:, None].astype(jnp.int32)
        q2, k2 = quantized_apply_rotary_pos_emb(
            q, k, cos, sin, pos_ids, qc("rotary_positional_encoding"))
        mm0 = qc("matmul_0")
        qq = make_entry_quantizer(mm0, "data_in", skip_first_dim=True)
        q2 = qq(q2.reshape(B * NH, 1, HD)).reshape(B, NH, 1, HD)
        layer, _, _ = S._append_and_read(
            layer, k2, v, pos_scalar, qc("matmul_0"), qc("matmul_1"), spec,
            keep_packed=True, pos_major=True)
        return q2, layer

    def body_glue(i, carry):
        q, layer = carry
        q2, layer = glue(q, q[:, :NKV], q[:, :NKV], layer)
        q3 = q * 0.999 + 1e-3 * q2
        return (q3, layer)

    t = slope(body_glue, (q4, layer0))
    print(f"glue   : {t*1e6:7.1f}us/layer", flush=True)

    # --- glue + kernel
    def body_attn(i, carry):
        q, layer = carry
        q2, layer = glue(q, q[:, :NKV], q[:, :NKV], layer)
        kc, ks, vc, vs = layer
        ctx = packed_attention_decode_batch(
            q2.reshape(B, NH, HD), kc, ks, vc, vs, positions_b,
            spec[0], spec[1], nkv=NKV, rep=REP, prob_q=PROBQ, exact_q=True)
        q3 = q * 0.999 + 1e-3 * ctx.reshape(B, NH, 1, HD)
        return (q3, layer)

    t = slope(body_attn, (q4, layer0))
    print(f"attn   : {t*1e6:7.1f}us/layer", flush=True)

    # --- sub-glue: rope+qquant only
    def body_rope(i, carry):
        q, layer = carry
        pos_ids = positions_b[:, None].astype(jnp.int32)
        q2, k2 = quantized_apply_rotary_pos_emb(
            q, q[:, :NKV], cos, sin, pos_ids,
            qc("rotary_positional_encoding"))
        mm0 = qc("matmul_0")
        qq = make_entry_quantizer(mm0, "data_in", skip_first_dim=True)
        q2 = qq(q2.reshape(B * NH, 1, HD)).reshape(B, NH, 1, HD)
        q3 = q * 0.999 + 1e-3 * q2 + 1e-6 * k2.sum()
        return (q3, layer)

    t = slope(body_rope, (q4, layer0))
    print(f"ropeqq : {t*1e6:7.1f}us/layer", flush=True)

    # --- sub-glue: encode+append only
    def body_app(i, carry):
        q, layer = carry
        layer, _, _ = S._append_and_read(
            layer, q[:, :NKV], q[:, :NKV], pos_scalar,
            qc("matmul_0"), qc("matmul_1"), spec,
            keep_packed=True, pos_major=True)
        q3 = q * 0.999 + 1e-9 * layer[1][:, :1, :1].sum()
        return (q3, layer)

    t = slope(body_app, (q4, layer0))
    print(f"encapp : {t*1e6:7.1f}us/layer", flush=True)


if __name__ == "__main__":
    main()
