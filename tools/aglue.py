"""Attention GLUE decomposition: the fused kernel measures ~50us for a full
batch-32 7B layer (tools/aprobe.py) yet in-situ attention costs ~458us/layer
(tools/dprobe7.py full - noattn). This times the pieces BETWEEN the linears
and the kernel as separate jitted fns with a donated cache:

  rope+qquant   — quantized RoPE on q,k + matmul_0 data_in quantize of q
  encode        — per-token block_fp encode of k,v (cache write operands)
  append        — 4x dynamic_update_slice into the flat pos-major cache
  attnlayer     — the whole _attention_cached minus the two linears
  attnlayer_x   — same but positions as [b] (ragged/scatter append path)

Usage: python tools/aglue.py [--batch=32]
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from __graft_entry__ import BFP6
from bench import llama_cfg
from llm_mixed_q_tpu.models.llama import serving as S
from llm_mixed_q_tpu.models.llama.modeling import _node_cfg, rope_tables
from llm_mixed_q_tpu.ops.functions import quantized_apply_rotary_pos_emb
from llm_mixed_q_tpu.ops.functions import make_entry_quantizer
from functools import partial


def arg(flag, default):
    for a in sys.argv[1:]:
        if a.startswith(f"--{flag}="):
            return int(a.split("=")[1])
    return default


B = arg("batch", 32)
MAXLEN = 256
HIDDEN, INTER, VOCAB = 4096, 11008, 32000

config = llama_cfg(HIDDEN, INTER, 2, VOCAB, BFP6)
NH = config.num_attention_heads
NKV = config.num_key_value_heads
HD = config.head_dim
qc = partial(_node_cfg, config.quant_config, 0, "self_attn")
spec = S.kv_cache_pack_spec(config)


def timed(fn, *args, donate=None, reps=30):
    jfn = jax.jit(fn, donate_argnums=donate or ())

    def fresh():
        if not donate:
            return args
        a2 = list(args)
        for i in donate:
            a2[i] = jax.tree.map(lambda x: x + jnp.zeros((), x.dtype), args[i])
        jax.block_until_ready(a2)
        return a2

    jax.block_until_ready(jfn(*fresh()))
    ts = []
    for _ in range(reps):
        a2 = fresh()
        t0 = time.perf_counter()
        jax.block_until_ready(jfn(*a2))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    pos_scalar = jnp.int32(MAXLEN // 2)
    pos_vec = jnp.full((B,), MAXLEN // 2, jnp.int32)
    cos, sin = rope_tables(MAXLEN, HD, config.rope_theta, jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, NH, 1, HD)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, NKV, 1, HD)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, NKV, 1, HD)), jnp.float32)
    hidden = jnp.asarray(rng.standard_normal((B, 1, HIDDEN)), jnp.float32)

    cache = S.init_packed_kv_cache(config, B, MAXLEN, spec)
    layer0 = (cache.k_codes[0], cache.k_scales[0],
              cache.v_codes[0], cache.v_scales[0])

    # --- rope + q quantize
    def rope_qq(q, k):
        pos_ids = pos_vec[:, None].astype(jnp.int32)
        q2, k2 = quantized_apply_rotary_pos_emb(
            q, k, cos, sin, pos_ids, qc("rotary_positional_encoding"))
        mm0 = qc("matmul_0")
        qq = make_entry_quantizer(mm0, "data_in", skip_first_dim=True)
        q2 = qq(q2.reshape(B * NH, 1, HD)).reshape(B, NH, 1, HD)
        return q2, k2

    t = timed(rope_qq, q, k)
    print(f"rope+qquant : {t*1e6:8.1f}us")

    # --- encode k,v
    def enc(k, v):
        kc, ks = S._encode_kv(k, qc("matmul_0"), spec[0])
        vc, vs = S._encode_kv(v, qc("matmul_1"), spec[1])
        return kc, ks, vc, vs

    t = timed(enc, k, v)
    print(f"encode      : {t*1e6:8.1f}us")

    kc, ks, vc, vs = jax.jit(enc)(k, v)

    # --- append only (scalar pos, donated cache)
    def app(layer, kc, ks, vc, vs, pos):
        nkv = NKV
        k_new = kc[:, :, 0, :].transpose(0, 2, 1)
        ks_new = ks[:, :, 0, :].transpose(0, 2, 1)
        v_new = vc[:, :, 0, :].transpose(0, 2, 1)
        vs_new = vs[:, :, 0, :].transpose(0, 2, 1)
        lane0 = pos * nkv
        a, b_, c, d = layer
        a = jax.lax.dynamic_update_slice(a, k_new, (0, 0, lane0))
        b_ = jax.lax.dynamic_update_slice(b_, ks_new, (0, 0, lane0))
        c = jax.lax.dynamic_update_slice(c, v_new, (0, 0, lane0))
        d = jax.lax.dynamic_update_slice(d, vs_new, (0, 0, lane0))
        return (a, b_, c, d)

    t = timed(app, layer0, kc, ks, vc, vs, pos_scalar, donate=(0,))
    print(f"append(dus) : {t*1e6:8.1f}us   (scalar pos, donated)")
    layer0 = (cache.k_codes[0], cache.k_scales[0],
              cache.v_codes[0], cache.v_scales[0])
    t = timed(app, layer0, kc, ks, vc, vs, pos_scalar)
    print(f"append(copy): {t*1e6:8.1f}us   (scalar pos, NOT donated)")

    # --- full attention block minus linears: feed q,k,v directly
    def attn_block(layer, q, k, v, pos):
        positions_b = jnp.broadcast_to(pos, (B,))
        pos_ids = positions_b[:, None].astype(jnp.int32)
        q2, k2 = quantized_apply_rotary_pos_emb(
            q, k, cos, sin, pos_ids, qc("rotary_positional_encoding"))
        mm0 = qc("matmul_0")
        qq = make_entry_quantizer(mm0, "data_in", skip_first_dim=True)
        q2 = qq(q2.reshape(B * NH, 1, HD)).reshape(B, NH, 1, HD)
        layer, _, _ = S._append_and_read(
            layer, k2, v, pos, qc("matmul_0"), qc("matmul_1"), spec,
            keep_packed=True, pos_major=True)
        kc, ks, vc, vs = layer
        from llm_mixed_q_tpu.kernels.attention_decode import (
            packed_attention_decode_batch, prob_q_spec)
        ctx = packed_attention_decode_batch(
            q2.reshape(B, NH, HD), kc, ks, vc, vs, positions_b,
            spec[0], spec[1], nkv=NKV, rep=NH // NKV,
            prob_q=prob_q_spec(qc("matmul_1"), MAXLEN), exact_q=True)
        return ctx, layer

    layer0 = (cache.k_codes[0], cache.k_scales[0],
              cache.v_codes[0], cache.v_scales[0])
    t = timed(attn_block, layer0, q, k, v, pos_scalar, donate=(0,))
    print(f"attnlayer   : {t*1e6:8.1f}us   (scalar pos, donated)")

    layer0 = (cache.k_codes[0], cache.k_scales[0],
              cache.v_codes[0], cache.v_scales[0])
    t = timed(attn_block, layer0, q, k, v, pos_vec, donate=(0,))
    print(f"attnlayer_x : {t*1e6:8.1f}us   ([b] pos / scatter append, donated)")


if __name__ == "__main__":
    main()
