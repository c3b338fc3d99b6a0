"""Fused packed-KV decode attention kernel (kernels/attention_decode.py).

Parity target: serving's XLA packed path (dequant + einsum + softmax +
block_fp prob quantization) — the kernel must produce the same decode
logits on the same packed cache, including ragged per-sequence positions
and GQA. Run in interpret mode on CPU (tests/conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llm_mixed_q_tpu.kernels.attention_decode import (
    _quantize_probs_lanes,
    attention_kernel_ok,
    packed_attention_decode,
    prob_q_spec,
)
from llm_mixed_q_tpu.models.llama import LlamaQuantizedConfig
from llm_mixed_q_tpu.models.hf_loader import init_llama_params
from llm_mixed_q_tpu.models.llama.serving import (
    decode_step,
    init_packed_kv_cache,
    kv_cache_pack_spec,
    prefill_into_cache,
)
from llm_mixed_q_tpu.ops.functions import make_entry_quantizer


def _bfp(width):
    return {
        "name": "block_fp",
        "bypass": False,
        "is_ptq": True,
        "bias_block_size": [16],
        **{
            f"{e}_{k}": v
            for e in ("weight", "data_in", "bias")
            for k, v in (
                ("width", width),
                ("exponent_width", 8),
                ("exponent_bias", 127),
                ("block_size", [1, 16]),
            )
        },
        "bias_block_size": [16],
    }


def _config(width=6, nkv=None):
    node = _bfp(width)
    return LlamaQuantizedConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=nkv,
        max_position_embeddings=64,
        quant_config={"default": node},
    )


def test_prob_quantizer_matches_entry_quantizer():
    """In-kernel block_fp prob qdq (lane blocks, butterfly block max) ==
    make_entry_quantizer bit-for-bit."""
    rng = np.random.default_rng(0)
    p = rng.random((4, 64)).astype(np.float32)
    p[0, :16] = 0.0  # all-zero block (fully masked positions)
    p[1, 3] = 5e-9  # |x| <= atol passthrough
    spec = (16, 6, 8, None)
    got = np.asarray(
        _quantize_probs_lanes(jnp.asarray(p), *spec, interpret=True)
    )

    cfg = _bfp(6)
    q = make_entry_quantizer(cfg, "data_in", skip_first_dim=True)
    # entry quantizer blocks the LAST axis — same axis as the kernel's lanes
    want = np.asarray(q(jnp.asarray(p)[:, None, :])[:, 0, :])
    np.testing.assert_array_equal(got, want)


def test_prob_quantizer_full_row_block():
    """bs == S: block max degenerates to the row max."""
    rng = np.random.default_rng(2)
    p = rng.random((4, 32)).astype(np.float32)
    got = np.asarray(
        _quantize_probs_lanes(jnp.asarray(p), 32, 6, 8, None, interpret=True)
    )
    cfg = dict(_bfp(6), data_in_block_size=[1, 32])
    q = make_entry_quantizer(cfg, "data_in", skip_first_dim=True)
    want = np.asarray(q(jnp.asarray(p)[:, None, :])[:, 0, :])
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("nkv", [None, 2])
def test_kernel_matches_xla_packed_path(nkv):
    config = _config(nkv=nkv)
    params = init_llama_params(config, task="lm", seed=0)
    b, prompt = 2, 11
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 128, size=(b, prompt)), jnp.int32)
    # ragged: row 1 has 4 pad positions
    mask = jnp.asarray([[1] * prompt, [1] * (prompt - 4) + [0] * 4], jnp.int32)
    spec = kv_cache_pack_spec(config)
    assert spec is not None

    def run(attn_kernel):
        cache = init_packed_kv_cache(config, b, 32, spec)
        logits, cache, lengths = jax.jit(
            lambda p, i, m, c: prefill_into_cache(p, i, m, c, config, True)
        )(params, ids, mask, cache)
        tok = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
        outs = []
        for t in range(3):
            logits, cache = jax.jit(
                lambda p, tk, c, pos: decode_step(
                    p, tk, c, pos, config, True, attn_kernel
                )
            )(params, tok, cache, lengths + t)
            outs.append(np.asarray(logits))
            tok = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
        return outs

    fast = run(True)
    ref = run(False)
    for got, want in zip(fast, ref):
        # identical quantized values; only f32 accumulation order differs
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
        assert np.argmax(got, -1).tolist() == np.argmax(want, -1).tolist()


def test_kernel_eligibility_gates():
    config = _config(width=6)
    assert attention_kernel_ok(config, 64)
    assert not attention_kernel_ok(config, 24)  # 16 does not tile 24
    assert not attention_kernel_ok(config, 64 * 4096)  # VMEM gate

    wide_node = dict(_bfp(6), data_in_width=12)  # probs not bf16-exact
    wide = LlamaQuantizedConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=64,
        quant_config={"default": wide_node},
    )
    assert not attention_kernel_ok(wide, 64)
    with pytest.raises(ValueError):
        prob_q_spec(wide_node, 64)


def test_kernel_requires_packed_cache():
    from llm_mixed_q_tpu.models.llama.serving import init_kv_cache

    config = _config()
    params = init_llama_params(config, task="lm", seed=0)
    cache = init_kv_cache(config, 1, 16)
    tok = jnp.zeros((1, 1), jnp.int32)
    with pytest.raises(ValueError):
        decode_step(params, tok, cache, jnp.zeros((1,), jnp.int32), config,
                    True, attn_kernel=True)
