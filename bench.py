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
    # commit params to the device ONCE — host-side leaves would otherwise be
    # re-transferred on every call (catastrophic through a tunneled chip)
    params = jax.device_put(params)
    jax.block_until_ready(params)
    rng = np.random.default_rng(0)
    # several DISTINCT device-staged batches: identical repeated calls can be
    # deduped/cached by the runtime, which falsifies timing
    batches = []
    for i in range(4):
        ids = jnp.asarray(
            rng.integers(0, vocab, size=(batch, seq)), dtype=jnp.int32
        )
        batches.append((jax.device_put(ids), jnp.ones_like(ids)))
    jax.block_until_ready(batches)
    return config, params, batches


def bench_fn(fn, params, batches, iters=12, warmup=3):
    """fn must return a SCALAR (e.g. logits.sum()): fetching it each
    iteration forces real remote execution — block_until_ready alone does
    not through a tunneled device, and repeated identical calls can be
    deduped, both of which falsify timing."""
    for i in range(warmup):
        ids, mask = batches[i % len(batches)]
        float(fn(params, ids, mask))
    t0 = time.perf_counter()
    for i in range(iters):
        ids, mask = batches[i % len(batches)]
        float(fn(params, ids, mask))
    return (time.perf_counter() - t0) / iters


def bench_decode(config, params, quantize_weights, batch=8, steps=64,
                 max_len=256, reps=4):
    """Decode throughput: ``steps`` incremental tokens chained in one
    lax.scan (single jitted program, no per-step dispatch), timed by fetching
    a scalar per rep. This is the HBM-bound regime where packed sub-byte
    weights pay off."""
    from jax import lax

    from llm_mixed_q_tpu.models.llama.serving import decode_step, init_kv_cache

    cache = init_kv_cache(config, batch, max_len)

    def body(carry, pos):
        tok, cache = carry
        logits, cache = decode_step(
            params, tok, cache, pos, config, quantize_weights
        )
        nxt = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
        return (nxt, cache), logits.max()

    @jax.jit
    def run(tok0, cache):
        (_, _), outs = lax.scan(
            body, (tok0, cache), jnp.arange(steps, dtype=jnp.int32)
        )
        return outs.sum()

    times = []
    for r in range(reps + 1):
        tok0 = jnp.full((batch, 1), r + 1, dtype=jnp.int32)  # distinct inputs
        t0 = time.perf_counter()
        float(run(tok0, cache))
        if r > 0:  # first rep is compile+warmup
            times.append(time.perf_counter() - t0)
    return batch * steps / (sum(times) / len(times))


def main():
    on_tpu = jax.default_backend() != "cpu"
    if on_tpu:
        hidden, inter, layers, seq, batch = 2048, 5632, 8, 1024, 4
    else:  # CPU smoke fallback
        hidden, inter, layers, seq, batch = 256, 704, 2, 128, 2

    config, params, batches = build(hidden, inter, layers, hidden // 128,
                                    32000 if on_tpu else 1024, seq, batch)
    from llm_mixed_q_tpu.models.llama import llama_for_causal_lm
    from llm_mixed_q_tpu.models.llama.pack import pack_llama_params

    def fwd(p, i, m, qw):
        return llama_for_causal_lm(
            p, i, m, config=config, quantize_weights=qw
        )["logits"].sum()

    # reference-style fake-quant path: qdq on weights+acts every forward
    fake = jax.jit(lambda p, i, m: fwd(p, i, m, True))
    t_fake = bench_fn(fake, params, batches)

    # packed path: bit-packed codes + scales in HBM, fused Pallas kernel
    packed_params = jax.device_put(pack_llama_params(params, config))
    jax.block_until_ready(packed_params)
    packed = jax.jit(lambda p, i, m: fwd(p, i, m, False))
    t_packed = bench_fn(packed, packed_params, batches)

    prefill_packed = batch * seq / t_packed
    prefill_fake = batch * seq / t_fake

    # decode throughput (the serving metric): packed fused kernel vs the
    # reference's serving mode (is_ptq: weights quantized ONCE, stored and
    # streamed as fp32 — reference linear.py:63-71) on identical hardware
    from llm_mixed_q_tpu.models import get_ptq_preparer

    ptq_params = jax.device_put(get_ptq_preparer("llama")(params, config))
    jax.block_until_ready(ptq_params)
    dec_batch, dec_steps = (8, 64) if on_tpu else (2, 4)
    decode_fake = bench_decode(
        config, ptq_params, False, batch=dec_batch, steps=dec_steps,
        reps=4 if on_tpu else 1,
    )
    decode_packed = bench_decode(
        config, packed_params, False, batch=dec_batch, steps=dec_steps,
        reps=4 if on_tpu else 1,
    )

    result = {
        "metric": "decode_tokens_per_sec_per_chip_w6a6_bfp",
        "value": round(decode_packed, 1),
        "unit": "tokens/s",
        # speedup of packed bit-packed storage + fused Pallas dequant-matmul
        # over the reference's fake-quant execution model, same hardware
        "vs_baseline": round(decode_packed / decode_fake, 3),
        "extra": {
            "decode_tok_s_fake_quant": round(decode_fake, 1),
            "prefill_tok_s_packed": round(prefill_packed, 1),
            "prefill_tok_s_fake_quant": round(prefill_fake, 1),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
