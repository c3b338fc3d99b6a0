"""Benchmark: quantized-Llama decode/prefill throughput on the local chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Primary metric (BASELINE.json): tokens/sec/chip at Llama W6A6 BFP. One real
TPU v5e chip is available; the model is sized to fit its HBM with fp32
residual + packed 6-bit weights (a ~1.1B-param Llama shape; the 7B scale
point needs the multi-chip mesh the driver dry-runs separately).

vs_baseline: ratio of the packed fused-kernel path to the reference-style
fake-quant (quantize-dequantize every forward) path measured on the SAME
hardware — i.e. the speedup this framework's packed storage + fused Pallas
dequant-matmul delivers over what the reference simulates.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def build(hidden=2048, inter=5632, layers=8, heads=16, vocab=32000, seq=1024,
          batch=4):
    from llm_mixed_q_tpu.models.hf_loader import init_llama_params
    from llm_mixed_q_tpu.models.llama import LlamaQuantizedConfig
    from __graft_entry__ import BFP6

    config = LlamaQuantizedConfig(
        vocab_size=vocab,
        hidden_size=hidden,
        intermediate_size=inter,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        max_position_embeddings=max(seq, 2048),
        quant_config=BFP6,
    )
    params = init_llama_params(config, task="lm", seed=0)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, vocab, size=(batch, seq)), dtype=jnp.int32)
    mask = jnp.ones_like(ids)
    return config, params, ids, mask


def bench_fn(fn, *args, iters=10, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    on_tpu = jax.default_backend() != "cpu"
    if on_tpu:
        hidden, inter, layers, seq, batch = 2048, 5632, 8, 1024, 4
    else:  # CPU smoke fallback
        hidden, inter, layers, seq, batch = 256, 704, 2, 128, 2

    config, params, ids, mask = build(hidden, inter, layers, hidden // 128,
                                      32000 if on_tpu else 1024, seq, batch)
    from llm_mixed_q_tpu.models.llama import llama_for_causal_lm
    from llm_mixed_q_tpu.models.llama.pack import pack_llama_params

    def fwd(p, i, m, qw):
        return llama_for_causal_lm(
            p, i, m, config=config, quantize_weights=qw
        )["logits"]

    # reference-style fake-quant path: qdq on weights+acts every forward
    fake = jax.jit(lambda p, i, m: fwd(p, i, m, True))
    t_fake = bench_fn(fake, params, ids, mask)

    # packed path: int8 codes + scales in HBM, fused Pallas dequant-matmul
    packed_params = pack_llama_params(params, config)
    packed = jax.jit(lambda p, i, m: fwd(p, i, m, False))
    t_packed = bench_fn(packed, packed_params, ids, mask)

    tokens = ids.size
    tokens_per_s = tokens / t_packed
    print(
        json.dumps(
            {
                "metric": "prefill_tokens_per_sec_per_chip_w6a6_bfp",
                "value": round(tokens_per_s, 1),
                "unit": "tokens/s",
                "vs_baseline": round(t_fake / t_packed, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
