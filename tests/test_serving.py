"""Serving path: fixed-cache decode parity and greedy generation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llm_mixed_q_tpu.models.api import make_forward
from llm_mixed_q_tpu.models.hf_loader import init_llama_params
from llm_mixed_q_tpu.models.llama import LlamaQuantizedConfig
from llm_mixed_q_tpu.models.llama.serving import (
    decode_step,
    generate_greedy,
    init_kv_cache,
    prefill_into_cache,
)

TINY = dict(
    vocab_size=96,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
)


@pytest.fixture(scope="module")
def setup():
    config = LlamaQuantizedConfig(**TINY, quant_config=None)
    params = init_llama_params(config, task="lm", seed=0)
    return config, params


def test_fixed_cache_decode_matches_full_forward(setup):
    config, params = setup
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 96, size=(2, 12)).astype(np.int32)
    full_fwd = make_forward("llama", "lm", config)
    full = np.asarray(full_fwd(params, jnp.asarray(ids), None)["logits"])

    max_len = 16
    cache = init_kv_cache(config, 2, max_len)
    logits, cache, lengths = prefill_into_cache(
        params, jnp.asarray(ids[:, :8]), jnp.ones((2, 8), jnp.int32), cache, config
    )
    np.testing.assert_allclose(np.asarray(logits), full[:, 7], rtol=2e-4, atol=2e-4)
    for t in range(8, 12):
        logits, cache = decode_step(
            params, jnp.asarray(ids[:, t : t + 1]), cache, jnp.int32(t), config
        )
        np.testing.assert_allclose(
            np.asarray(logits), full[:, t], rtol=2e-4, atol=2e-4
        )


def test_generate_greedy_matches_argmax_rollout(setup):
    config, params = setup
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, 96, size=(1, 6)).astype(np.int32)
    out = generate_greedy(params, config, prompt, max_new_tokens=5)
    assert out.shape == (1, 5)

    # oracle: repeated full forwards with argmax
    full_fwd = make_forward("llama", "lm", config, jit=False)
    seq = prompt.copy()
    expected = []
    for _ in range(5):
        logits = np.asarray(full_fwd(params, jnp.asarray(seq), None)["logits"])
        nxt = int(np.argmax(logits[0, -1]))
        expected.append(nxt)
        seq = np.concatenate([seq, [[nxt]]], axis=1)
    assert out[0].tolist() == expected


def test_quantized_generation_runs():
    from __graft_entry__ import BFP6

    config = LlamaQuantizedConfig(**TINY, quant_config=BFP6)
    params = init_llama_params(config, task="lm", seed=0)
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, 96, size=(2, 4)).astype(np.int32)
    out = generate_greedy(params, config, prompt, max_new_tokens=4)
    assert out.shape == (2, 4)
    assert (out >= 0).all() and (out < 96).all()
