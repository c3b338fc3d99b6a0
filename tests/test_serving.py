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


def test_bfp_encode_lastdim_matches_fake_quant():
    """codes * scales must equal the fake-quant oracle bit-for-bit."""
    from llm_mixed_q_tpu.kernels.packing import (
        bfp_decode_lastdim,
        bfp_encode_lastdim,
    )
    from llm_mixed_q_tpu.ops.quantizers.block_fp import _block_fp_qdq

    rng = np.random.default_rng(3)
    x = jnp.asarray(
        (rng.standard_normal((2, 3, 5, 64)) * 4.0).astype(np.float32)
    )
    for width in (4, 6, 8):
        codes, scales = bfp_encode_lastdim(x, width, 8, None, 16)
        got = bfp_decode_lastdim(codes, scales, 16)
        want = _block_fp_qdq(
            x.reshape(-1, 64), width, 8, None, [1, 16], skip_first_dim=True
        ).reshape(x.shape)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        assert codes.dtype == jnp.int8
        assert scales.shape == (2, 3, 5, 4)


def test_packed_kv_cache_matches_fake_cache():
    """Packed (codes+scales) KV storage decodes identically to the
    fake-quant f32 cache: same quantized values, 3.2x less HBM."""
    from __graft_entry__ import BFP6
    from llm_mixed_q_tpu.models.llama.serving import kv_cache_pack_spec

    config = LlamaQuantizedConfig(**TINY, quant_config=BFP6)
    assert kv_cache_pack_spec(config) is not None
    params = init_llama_params(config, task="lm", seed=0)
    rng = np.random.default_rng(4)
    prompt = rng.integers(0, 96, size=(2, 6)).astype(np.int32)
    fake = generate_greedy(
        params, config, prompt, max_new_tokens=6, packed_kv=False
    )
    packed = generate_greedy(
        params, config, prompt, max_new_tokens=6, packed_kv=True
    )
    np.testing.assert_array_equal(fake, packed)


def test_packed_cache_unsupported_config_falls_back():
    from llm_mixed_q_tpu.models.llama.serving import kv_cache_pack_spec

    config = LlamaQuantizedConfig(**TINY, quant_config=None)
    assert kv_cache_pack_spec(config) is None
    with pytest.raises(ValueError):
        generate_greedy(
            init_llama_params(config, task="lm", seed=0),
            config,
            np.zeros((1, 4), np.int32),
            max_new_tokens=2,
            packed_kv=True,
        )
