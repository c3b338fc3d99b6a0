"""Evidence for the packed-KV bandwidth claim (VERDICT.md round-1 Weak #4).

Compiles one packed decode step for the TPU and reports, for both attention
paths (XLA dequant+einsum vs fused Pallas kernel):
  - compiled temp-buffer bytes (``memory_analysis``) — a materialized f32
    K/V copy of the cache shows up here as ~4 bytes/elem of cache,
  - occurrences of f32 cache-shaped buffers in the optimized HLO,
  - measured per-step wall time at a KV-bound shape (long cache, so the
    packed-KV stream dominates the weight stream).

Usage: python tools/hlo_check.py [max_len] [layers]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    max_len = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    layers = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from __graft_entry__ import BFP6
    from llm_mixed_q_tpu.models.hf_loader import init_llama_params
    from llm_mixed_q_tpu.models.llama import LlamaQuantizedConfig
    from llm_mixed_q_tpu.models.llama.pack import pack_llama_params
    from llm_mixed_q_tpu.models.llama.serving import (
        decode_step,
        init_packed_kv_cache,
        kv_cache_pack_spec,
    )

    config = LlamaQuantizedConfig(
        vocab_size=32000,
        hidden_size=2048,
        intermediate_size=5632,
        num_hidden_layers=layers,
        num_attention_heads=16,
        max_position_embeddings=max_len,
        quant_config=BFP6,
    )
    b = 8
    params = jax.device_put(
        pack_llama_params(init_llama_params(config, task="lm", seed=0), config)
    )
    spec = kv_cache_pack_spec(config)
    cache = init_packed_kv_cache(config, b, max_len, spec)
    cache_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(cache[:4])
    )
    tok = jnp.ones((b, 1), jnp.int32)
    print(f"cache: {cache_bytes/2**20:.0f} MiB packed "
          f"({layers} layers, max_len {max_len}, b {b})", flush=True)

    for name, attn_kernel, pos in (
        ("xla+scatter   ", False, jnp.full((b,), max_len - 2, jnp.int32)),
        ("xla+dus       ", False, jnp.int32(max_len - 2)),
        ("pallas+scatter", True, jnp.full((b,), max_len - 2, jnp.int32)),
        ("pallas+dus    ", True, jnp.int32(max_len - 2)),
    ):

        def step_fn(p, t, c, q):
            return decode_step(p, t, c, q, config, False, attn_kernel)

        fn = jax.jit(step_fn)
        lowered = fn.lower(params, tok, cache, pos)
        compiled = lowered.compile()
        mem = compiled.memory_analysis()
        hlo = compiled.as_text()
        # f32 buffers shaped like the full cache (materialized dequant)
        kv_f32 = hlo.count(f"f32[{b},{config.num_key_value_heads},{max_len}")

        # timing: ONE compile, runtime-variable chained steps (the cache and
        # token thread through, so nothing can be elided or overlapped)
        @jax.jit
        def chain(p, t, c, q, iters):
            def body(_, carry):
                t, c = carry
                logits, c = decode_step(p, t, c, q, config, False, attn_kernel)
                t = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
                return (t, c)
            t, c = jax.lax.fori_loop(0, iters, body, (t, c))
            return t.sum()

        float(chain(params, tok, cache, pos, 1))  # compile + warmup
        def t_at(n):
            t0 = time.perf_counter()
            float(chain(params, tok, cache, pos, n))
            return time.perf_counter() - t0
        t_at(2)
        dt = (min(t_at(18), t_at(18)) - min(t_at(2), t_at(2))) / 16
        print(
            f"{name}: temp={mem.temp_size_in_bytes/2**20:.0f} MiB "
            f"argument={mem.argument_size_in_bytes/2**20:.0f} MiB "
            f"f32-cache-shaped-bufs={kv_f32} step={dt*1e3:.2f} ms",
            flush=True,
        )

    # on-chip parity: both attention paths must produce the same logits
    pos = jnp.full((b,), max_len - 2, jnp.int32)
    l_xla, _ = jax.jit(
        lambda p, t, c, q: decode_step(p, t, c, q, config, False, False)
    )(params, tok, cache, pos)
    l_ker, _ = jax.jit(
        lambda p, t, c, q: decode_step(p, t, c, q, config, False, True)
    )(params, tok, cache, pos)
    l_xla, l_ker = np.asarray(l_xla), np.asarray(l_ker)
    rel = np.max(np.abs(l_xla - l_ker)) / (np.max(np.abs(l_xla)) + 1e-9)
    same_argmax = (l_xla.argmax(-1) == l_ker.argmax(-1)).all()
    print(f"parity: max rel diff {rel:.2e}, argmax equal: {same_argmax}",
          flush=True)


if __name__ == "__main__":
    main()
