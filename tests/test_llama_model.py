"""Llama model integration tests (SURVEY.md §4 item 4).

1. bypass config must match HF transformers fp32 logits on the same weights
2. full-quantized forward must match the reference's LlamaQuantizedForCausalLM
   (torch) bit-for-bit-ish on the same weights + same TOML config
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from llm_mixed_q_tpu.models.api import make_forward, make_prefill_and_decode
from llm_mixed_q_tpu.models.hf_loader import llama_params_from_flat
from llm_mixed_q_tpu.models.llama import (
    LlamaQuantizedConfig,
    llama_for_causal_lm,
    llama_for_sequence_classification,
    parse_llama_quantized_config,
    quantize_llama_params_ptq,
)

TINY = dict(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=172,
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


@pytest.fixture(scope="module")
def hf_model():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(
        **TINY, num_key_value_heads=4, attn_implementation="eager", use_cache=False
    )
    model = LlamaForCausalLM(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(1)
    input_ids = rng.integers(0, TINY["vocab_size"], size=(2, 33))
    attention_mask = np.ones_like(input_ids)
    attention_mask[1, 25:] = 0
    return input_ids.astype(np.int64), attention_mask.astype(np.int64)


def test_bypass_matches_hf(hf_model, batch):
    import torch

    input_ids, attention_mask = batch
    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(attention_mask),
        ).logits.numpy()

    config = LlamaQuantizedConfig(**TINY, quant_config=None)
    params = llama_params_from_flat(hf_model.state_dict(), config, task="lm")
    fwd = make_forward("llama", "lm", config)
    out = fwd(params, jnp.asarray(input_ids), jnp.asarray(attention_mask))
    ours = np.asarray(out["logits"])
    # rows past the padding boundary diverge arbitrarily (HF masks them too);
    # compare only attended positions
    mask = attention_mask.astype(bool)
    np.testing.assert_allclose(ours[mask], ref[mask], rtol=2e-4, atol=2e-4)


def _load_reference_quantized_model(hf_model, quant_config):
    """Instantiate the reference torch LlamaQuantizedForCausalLM."""
    from reference_loader import shim_reference_deps

    shim_reference_deps()
    from llm_mixed_q.models.llama_quantized import (
        LlamaQuantizedConfig as RefConfig,
        LlamaQuantizedForCausalLM as RefModel,
    )

    ref_cfg = RefConfig(**TINY, use_cache=False)
    ref_cfg.quant_config = quant_config  # __setattr__ hook parses/expands
    ref_model = RefModel(ref_cfg)
    missing, unexpected = ref_model.load_state_dict(hf_model.state_dict(), strict=False)
    assert not [k for k in missing if "rotary_emb" not in k], missing
    ref_model.eval()
    return ref_model


@pytest.mark.parametrize("qc", [BFP6], ids=["bfp6"])
def test_quantized_matches_reference(hf_model, batch, qc):
    import torch

    input_ids, attention_mask = batch
    ref_model = _load_reference_quantized_model(hf_model, qc)
    with torch.no_grad():
        ref = ref_model(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(attention_mask),
        ).logits.numpy()

    config = LlamaQuantizedConfig(**TINY, quant_config=qc)
    params = llama_params_from_flat(hf_model.state_dict(), config, task="lm")
    fwd = make_forward("llama", "lm", config, quantize_weights=True)
    out = fwd(params, jnp.asarray(input_ids), jnp.asarray(attention_mask))
    ours = np.asarray(out["logits"])
    mask = attention_mask.astype(bool)
    # quant rounding boundaries amplify 1-ulp fp noise: a single mantissa
    # flip in matmul_1 contaminates a whole output row at ~one-quant-step
    # magnitude. Structural bugs shift the BULK of elements, so assert on
    # median/mean, not worst case.
    d = np.abs(ours[mask] - ref[mask])
    assert np.median(d) < 1e-5, f"median {np.median(d)}"
    assert d.mean() < 2e-4, f"mean {d.mean()}"
    assert d.max() < 0.05, f"max diff {d.max()}"

    # PTQ prepare path must agree with quantize-on-the-fly
    params_q = quantize_llama_params_ptq(params, config)
    fwd_ptq = make_forward("llama", "lm", config, quantize_weights=False)
    out2 = fwd_ptq(params_q, jnp.asarray(input_ids), jnp.asarray(attention_mask))
    np.testing.assert_allclose(
        np.asarray(out2["logits"]), ours, rtol=1e-5, atol=1e-5
    )


def test_sequence_classification_runs(hf_model):
    config = LlamaQuantizedConfig(**TINY, quant_config=BFP6, pad_token_id=0)
    params = llama_params_from_flat(hf_model.state_dict(), config, task="cls")
    ids = np.array([[5, 6, 7, 0, 0], [8, 9, 10, 11, 12]], dtype=np.int64)
    msk = (ids != 0).astype(np.int64)
    fwd = make_forward("llama", "cls", config, with_labels=True)
    out = fwd(params, jnp.asarray(ids), jnp.asarray(msk), jnp.asarray([0, 1]))
    assert out["logits"].shape == (2, 2)
    assert np.isfinite(float(out["loss"]))


def test_kv_cache_decode_matches_full_forward(hf_model, batch):
    config = LlamaQuantizedConfig(**TINY, quant_config=None)
    params = llama_params_from_flat(hf_model.state_dict(), config, task="lm")
    input_ids, attention_mask = batch
    fwd = make_forward("llama", "lm", config)
    full = fwd(params, jnp.asarray(input_ids), jnp.asarray(attention_mask))["logits"]

    prefill, decode_step = make_prefill_and_decode("llama", "lm", config)
    prefill_len = 20
    logits0, kvs = prefill(
        params,
        jnp.asarray(input_ids[:, :prefill_len]),
        jnp.asarray(attention_mask[:, :prefill_len]),
    )
    logits_steps = [np.asarray(logits0)]
    for t in range(prefill_len, input_ids.shape[1]):
        step_logits, kvs = decode_step(
            params,
            jnp.asarray(input_ids[:, t : t + 1]),
            jnp.asarray(attention_mask[:, : t + 1]),
            kvs,
        )
        logits_steps.append(np.asarray(step_logits))
    stitched = np.concatenate(logits_steps, axis=1)
    mask = attention_mask.astype(bool)
    np.testing.assert_allclose(
        stitched[mask], np.asarray(full)[mask], rtol=2e-4, atol=2e-4
    )
