"""7B decode-step decomposition probe (run on the real chip).

VERDICT r3 #1: the 7B decode runs at 28% of its own roofline while the
dequant-matmul kernel alone runs at 62% — ~2.2x is lost OUTSIDE the matmul.
This probe times the decode step with components knocked out, at the 7B
per-layer shape (hidden 4096 / inter 11008) with a reduced layer count so
host packing stays fast, plus the lm_head separately:

  full      — the shipping decode_step (packed weights + packed KV + kernels)
  nolm      — decode_step minus the lm_head matmul
  noattn    — linears only (attention block skipped entirely)
  noactq    — full but data_in activation quantizers bypassed
  linears   — just the packed qkv/o/gateup/down matmuls chained per layer
  lmhead    — just the [8,4096] @ [4096,32000] logits matmul (fp32 vs bf16)

Per-layer slope = (t(L_hi) - t(L_lo)) / (L_hi - L_lo) removes the fixed
per-step cost; the fixed residue is reported too.

Usage: python tools/dprobe7.py [--layers 8] [--batch 8] [--maxlen 256]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from __graft_entry__ import BFP6
from bench import llama_cfg
from llm_mixed_q_tpu.models.hf_loader import init_llama_params
from llm_mixed_q_tpu.models.llama.pack import pack_llama_params_host
from llm_mixed_q_tpu.models.llama.serving import (
    decode_step,
    init_packed_kv_cache,
    kv_cache_pack_spec,
)
from llm_mixed_q_tpu.kernels.dequant_matmul import bfp_matmul
from llm_mixed_q_tpu.kernels.packing import (packed_nbytes, PackedBFP,
                                              PackedBFPSub, PackedBFPSubT)


def arg(flag, default):
    for a in sys.argv[1:]:
        if a.startswith(f"--{flag}="):
            return int(a.split("=")[1])
    return default


HIDDEN, INTER, VOCAB = 4096, 11008, 32000
BATCH = arg("batch", 8)
MAXLEN = arg("maxlen", 256)
LAYERS = arg("layers", 8)
STEPS = arg("steps", 16)


def chain_steps(step_fn, params, cache, batch=BATCH):
    """Per-decode-step seconds via a 2-length fori_loop slope."""

    @jax.jit
    def run(p, t, c, n):
        def body(pos, carry):
            t, c = carry
            out, c = step_fn(p, t, c, pos)
            return out, c

        t, _ = lax.fori_loop(0, n, body, (t, cache))
        return t.sum()

    tok0 = jnp.ones((batch, 1), jnp.int32)
    float(run(params, tok0, cache, 1))
    lo, hi = max(2, STEPS // 8), STEPS

    def t_at(n):
        t0 = time.perf_counter()
        float(run(params, tok0, cache, n))
        return time.perf_counter() - t0

    t_at(lo)
    t_lo = min(t_at(lo) for _ in range(3))
    t_hi = min(t_at(hi) for _ in range(3))
    return (t_hi - t_lo) / (hi - lo)


def weight_bytes(packed):
    total = 0
    for leaf in jax.tree.leaves(
        packed, is_leaf=lambda x: isinstance(x, (PackedBFP, PackedBFPSub, PackedBFPSubT))
    ):
        if isinstance(leaf, (PackedBFP, PackedBFPSub, PackedBFPSubT)):
            total += packed_nbytes(leaf)
    return total


def make_variant(config, variant):
    """A decode-step-like fn (params, tok, cache, pos) -> (tok, cache)."""
    from functools import partial
    from llm_mixed_q_tpu.models.llama.modeling import _node_cfg, mlp, rms_norm, rope_tables
    from llm_mixed_q_tpu.models.llama import serving as S

    def step(p, tok, cache, pos, *, lm=True, attn=True, actq=True):
        packed = isinstance(cache, S.PackedKVCache)
        pack_spec = (cache.bs_k, cache.bs_v) if packed else None
        positions = jnp.asarray(pos, dtype=jnp.int32)
        hidden = p["embed_tokens"]["weight"][tok].astype(jnp.float32)
        max_len = cache.max_len
        cos, sin = rope_tables(max_len, config.head_dim, config.rope_theta, hidden.dtype)
        new_cache = []
        for i, lp in enumerate(p["layers"]):
            residual = hidden
            h = rms_norm(hidden, lp["input_layernorm"]["weight"], config.rms_norm_eps)
            layer_cache_in = (
                cache.k_codes[i], cache.k_scales[i], cache.v_codes[i], cache.v_scales[i]
            )
            if attn:
                h, layer_cache = S._attention_cached(
                    lp["self_attn"], h, layer_cache_in, positions, cos, sin,
                    config, i, False, pack_spec, True,
                    pos_major=cache.pos_major,
                )
            else:
                # linears only: qkv + o with no attention in between
                qc = partial(_node_cfg, config.quant_config, i, "self_attn")
                node = lp["self_attn"]["qkv_proj"]
                from llm_mixed_q_tpu.ops.linear import quantized_linear
                fused = quantized_linear(h, node["weight"], node.get("bias"),
                                         qc("q_proj"), False)
                ctx = fused[..., : config.hidden_size]
                h = quantized_linear(ctx, lp["self_attn"]["o_proj"]["weight"],
                                     None, qc("o_proj"), False)
                layer_cache = layer_cache_in
            hidden = residual + h
            residual = hidden
            h = rms_norm(hidden, lp["post_attention_layernorm"]["weight"],
                         config.rms_norm_eps)
            h = mlp(lp["mlp"], h, config, i, False)
            hidden = residual + h
            new_cache.append(layer_cache)
        hidden = rms_norm(hidden, p["norm"]["weight"], config.rms_norm_eps)
        if lm:
            lm_w = p.get("lm_head", p["embed_tokens"])["weight"]
            logits = jax.lax.dot_general(
                hidden[:, 0].astype(lm_w.dtype), lm_w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
        else:
            out = (jnp.sum(hidden[:, 0], axis=-1) > 0)[:, None].astype(jnp.int32)
        out_cache = cache._replace(
            **{
                f: tuple(lc[j] for lc in new_cache)
                for j, f in enumerate(
                    ("k_codes", "k_scales", "v_codes", "v_scales")
                )
            }
        )
        return out, out_cache

    if variant == "full":
        return lambda p, t, c, pos: (
            lambda lg_c: (jnp.argmax(lg_c[0], -1)[:, None].astype(jnp.int32), lg_c[1])
        )(decode_step(p, t, c, pos, config, False, True))
    if variant == "xlaattn":
        return lambda p, t, c, pos: (
            lambda lg_c: (jnp.argmax(lg_c[0], -1)[:, None].astype(jnp.int32), lg_c[1])
        )(decode_step(p, t, c, pos, config, False, False))
    if variant == "nolm":
        return lambda p, t, c, pos: step(p, t, c, pos, lm=False)
    if variant == "noattn":
        return lambda p, t, c, pos: step(p, t, c, pos, attn=False)
    raise ValueError(variant)


def main():
    assert jax.default_backend() != "cpu", "run on the TPU"
    results = {}

    # --- lm_head alone (fp32 vs bf16 stream), with weight rotation
    rng = np.random.default_rng(0)
    ws = [jnp.asarray(rng.standard_normal((VOCAB, HIDDEN)) * 0.02, jnp.float32)
          for _ in range(3)]
    x0 = jnp.asarray(rng.standard_normal((BATCH, HIDDEN)), jnp.float32)

    def probe_mm(weights, cast):
        wl = [w.astype(cast) for w in weights]

        @jax.jit
        def run(ws_, x, n):
            def body(_, x):
                for w_ in ws_:
                    lg = jax.lax.dot_general(
                        x.astype(w_.dtype), w_, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    # fold the FULL logits row into the feedback: without it
                    # XLA slices the dot to the first HIDDEN output columns
                    # and reads 4096/32000 of the weight (measured 13.6TB/s
                    # "fp32" — dead-code elimination, not bandwidth)
                    x = jnp.tanh(lg[:, :HIDDEN]
                                 + 1e-30 * lg.sum(axis=1, keepdims=True))
                return x
            return lax.fori_loop(0, n, body, x).sum()

        float(run(wl, x0, 1))

        def t_at(n):
            t0 = time.perf_counter()
            float(run(wl, x0, n))
            return time.perf_counter() - t0

        t_at(2)
        lo, hi = 4, 24
        return (min(t_at(hi), t_at(hi)) - min(t_at(lo), t_at(lo))) / ((hi - lo) * len(wl))

    t32 = probe_mm(ws, jnp.float32)
    t16 = probe_mm(ws, jnp.bfloat16)
    results["lmhead_fp32_us"] = round(t32 * 1e6, 1)
    results["lmhead_fp32_gbs"] = round(4 * VOCAB * HIDDEN / t32 / 1e9, 1)
    results["lmhead_bf16_us"] = round(t16 * 1e6, 1)
    results["lmhead_bf16_gbs"] = round(2 * VOCAB * HIDDEN / t16 / 1e9, 1)
    print("lmhead:", {k: v for k, v in results.items()}, flush=True)
    del ws

    # --- model variants at two layer counts; pack ONCE at max layers and
    # slice the per-layer pytrees down for the smaller count
    config_hi = llama_cfg(HIDDEN, INTER, LAYERS, VOCAB, BFP6)
    print("init + pack params…", flush=True)
    params = init_llama_params(config_hi, task="lm", seed=0)
    packed_hi = jax.device_put(pack_llama_params_host(params, config_hi))
    del params
    jax.block_until_ready(packed_hi)
    results["weight_bytes_per_layer"] = weight_bytes(packed_hi) // LAYERS
    L_lo = max(2, LAYERS // 2)
    packed_lo = dict(packed_hi)
    packed_lo["layers"] = packed_hi["layers"][:L_lo]
    spec = kv_cache_pack_spec(config_hi)
    setups = {
        LAYERS: (config_hi, packed_hi),
        L_lo: (llama_cfg(HIDDEN, INTER, L_lo, VOCAB, BFP6), packed_lo),
    }

    per_layer = {}
    for variant in ("full", "xlaattn", "nolm", "noattn"):
        ts = {}
        for L, (config, packed) in setups.items():
            cache = init_packed_kv_cache(config, BATCH, MAXLEN, spec)
            fn = make_variant(config, variant)
            ts[L] = chain_steps(fn, packed, cache)
            del cache
        Ls = sorted(ts)
        slope = (ts[Ls[1]] - ts[Ls[0]]) / (Ls[1] - Ls[0])
        fixed = ts[Ls[0]] - slope * Ls[0]
        per_layer[variant] = (slope, fixed)
        results[f"{variant}_per_layer_us"] = round(slope * 1e6, 1)
        results[f"{variant}_fixed_us"] = round(fixed * 1e6, 1)
        print(variant, {k: results[k] for k in results if variant in k}, flush=True)

    # derived attribution
    sl_full = per_layer["full"][0]
    sl_noattn = per_layer["noattn"][0]
    results["attn_per_layer_us"] = round((sl_full - sl_noattn) * 1e6, 1)
    wbpl = results["weight_bytes_per_layer"]
    results["linears_roofline_us"] = round(wbpl / 819e9 * 1e6, 1)
    results["linears_per_layer_us"] = results["noattn_per_layer_us"]
    # noattn variant only streams qkv+o+mlp minus... it streams all linears
    print("\nSUMMARY")
    for k, v in results.items():
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
