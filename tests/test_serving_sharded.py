"""TP/DP-sharded serving: prefill + incremental decode over a device mesh.

BASELINE.md's serving target is multi-chip tokens/s scaling; real multi-chip
hardware is not available in CI, so this validates that the full serving
path (quantized prefill into the fixed KV cache + jitted decode steps)
compiles and runs correctly under real shardings on the 8-virtual-device CPU
mesh, and matches the unsharded path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from llm_mixed_q_tpu.models.hf_loader import init_llama_params
from llm_mixed_q_tpu.models.llama import LlamaQuantizedConfig
from llm_mixed_q_tpu.models.llama.serving import (
    decode_step,
    generate_greedy,
    init_kv_cache,
    prefill_into_cache,
)
from llm_mixed_q_tpu.parallel import make_mesh, shard_params

TINY = dict(
    vocab_size=96,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    max_position_embeddings=128,
)

BFP6 = {
    "default": {
        "name": "block_fp",
        "bypass": False,
        "is_ptq": True,
        "bias_block_size": [16],
        "bias_exponent_bias": 127,
        "bias_exponent_width": 8,
        "bias_width": 6,
        "data_in_block_size": [1, 16],
        "data_in_exponent_bias": 127,
        "data_in_exponent_width": 8,
        "data_in_width": 6,
        "weight_block_size": [1, 16],
        "weight_exponent_bias": 127,
        "weight_exponent_width": 8,
        "weight_width": 6,
    },
    "rotary_positional_encoding": {
        "bypass": False,
        "name": "integer",
        "data_in_width": 8,
        "data_in_frac_width": 7,
    },
}


def test_sharded_generate_matches_unsharded():
    assert len(jax.devices()) >= 8
    config = LlamaQuantizedConfig(**TINY, quant_config=BFP6)
    params = init_llama_params(config, task="lm", seed=0)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 96, size=(4, 16))

    ref_tokens = generate_greedy(
        params, config, prompt, max_new_tokens=6, quantize_weights=True
    )

    mesh = make_mesh(data=2, model=4)
    sharded = shard_params(params, mesh)
    # batch on "data", kv heads on "model":
    # cache [L, 2, b, nkv, max_len, hd]
    prompt_sharded = jax.device_put(
        jnp.asarray(prompt, dtype=jnp.int32), NamedSharding(mesh, P("data"))
    )
    out_tokens = generate_greedy(
        sharded, config, prompt_sharded, max_new_tokens=6, quantize_weights=True
    )
    np.testing.assert_array_equal(out_tokens, ref_tokens)


def test_sharded_decode_step_cache_spec():
    assert len(jax.devices()) >= 8
    config = LlamaQuantizedConfig(**TINY, quant_config=BFP6)
    params = init_llama_params(config, task="lm", seed=0)
    mesh = make_mesh(data=2, model=4)
    sharded = shard_params(params, mesh)
    b, max_len = 4, 32
    cache = init_kv_cache(config, b, max_len)
    cache = jax.device_put(
        cache, NamedSharding(mesh, P(None, None, "data", "model", None, None))
    )
    rng = np.random.default_rng(1)
    ids = jax.device_put(
        jnp.asarray(rng.integers(0, 96, size=(b, 8)), dtype=jnp.int32),
        NamedSharding(mesh, P("data")),
    )
    mask = jnp.ones_like(ids)
    logits, cache, lengths = jax.jit(
        lambda p, i, m, c: prefill_into_cache(p, i, m, c, config, True)
    )(sharded, ids, mask, cache)
    step = jax.jit(lambda p, t, c, pos: decode_step(p, t, c, pos, config, True))
    tok = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
    logits2, cache = step(sharded, tok, cache, jnp.int32(8))
    assert logits2.shape == (b, TINY["vocab_size"])
    assert np.isfinite(np.asarray(logits2)).all()
