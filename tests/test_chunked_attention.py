"""Chunked two-pass quantized attention vs the naive full-matrix path.

The chunked path (ops/attention.py) must reproduce the reference attention
semantics — quantized matmul_0, fp32 softmax, quantized probs, matmul_1 —
while never materializing the [S, K] matrix for all heads at once.
"""

import math

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from llm_mixed_q_tpu.models.hf_loader import init_llama_params
from llm_mixed_q_tpu.models.llama import LlamaQuantizedConfig
from llm_mixed_q_tpu.models.api import make_forward
from llm_mixed_q_tpu.ops.attention import chunked_quantized_attention
from llm_mixed_q_tpu.ops.functions import quantized_matmul

RNG = np.random.default_rng(3)

BFP_MM = {
    "name": "block_fp",
    "bypass": False,
    "data_in_width": 6, "data_in_exponent_width": 8,
    "data_in_exponent_bias": 127, "data_in_block_size": [1, 16],
    "weight_width": 6, "weight_exponent_width": 8,
    "weight_exponent_bias": 127, "weight_block_size": [1, 16],
}
BYPASS_MM = {"name": "block_fp", "bypass": True}
INT_MM = {
    "name": "integer",
    "bypass": False,
    "data_in_width": 8, "data_in_frac_width": 6,
    "weight_width": 8, "weight_frac_width": 6,
}


def naive(q, k, v, mask, mm0, mm1, sqrt_hd):
    s = quantized_matmul(q, k.transpose(0, 1, 3, 2), mm0) / sqrt_hd
    if mask is not None:
        s = jnp.maximum(s + mask, -1e9)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return quantized_matmul(p, v, mm1)


def _causal_mask(b, S):
    m = np.triu(np.full((S, S), -1e9, dtype=np.float32), k=1)
    return jnp.asarray(np.broadcast_to(m, (b, 1, S, S)))


@pytest.mark.parametrize("mm_cfg", [BFP_MM, BYPASS_MM, INT_MM])
@pytest.mark.parametrize("S,chunk", [(64, 32), (96, 32), (40, 16)])
def test_chunked_matches_naive(mm_cfg, S, chunk):
    b, h, d = 2, 2, 32
    q = jnp.asarray(RNG.standard_normal((b, h, S, d)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((b, h, S, d)).astype(np.float32))
    v = jnp.asarray(RNG.standard_normal((b, h, S, d)).astype(np.float32))
    mask = _causal_mask(b, S)
    ref = naive(q, k, v, mask, mm_cfg, mm_cfg, math.sqrt(d))
    out = chunked_quantized_attention(
        q, k, v, mask, mm_cfg, mm_cfg, sqrt_hd=math.sqrt(d), chunk=chunk
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_chunked_no_mask_cross_attention_shape():
    b, h, S, K, d = 1, 2, 16, 48, 32
    q = jnp.asarray(RNG.standard_normal((b, h, S, d)).astype(np.float32))
    k = jnp.asarray(RNG.standard_normal((b, h, K, d)).astype(np.float32))
    v = jnp.asarray(RNG.standard_normal((b, h, K, d)).astype(np.float32))
    ref = naive(q, k, v, None, BFP_MM, BFP_MM, math.sqrt(d))
    out = chunked_quantized_attention(
        q, k, v, None, BFP_MM, BFP_MM, sqrt_hd=math.sqrt(d), chunk=16
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_model_forward_with_chunked_attention():
    TINY = dict(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=128,
    )
    cfg_naive = LlamaQuantizedConfig(
        **TINY, quant_config="/root/repo/configs/quantization/bfp_6bit.toml"
    )
    cfg_chunk = LlamaQuantizedConfig(
        **TINY, quant_config="/root/repo/configs/quantization/bfp_6bit.toml",
        attention_chunk=32,
    )
    params = init_llama_params(cfg_naive, task="lm", seed=0)
    ids = jnp.asarray(RNG.integers(0, 96, size=(2, 64)), dtype=jnp.int32)
    out_naive = make_forward("llama", "lm", cfg_naive)(params, ids, None)
    out_chunk = make_forward("llama", "lm", cfg_chunk)(params, ids, None)
    np.testing.assert_allclose(
        np.asarray(out_chunk["logits"]),
        np.asarray(out_naive["logits"]),
        rtol=1e-4, atol=1e-4,
    )
