"""OPT model integration tests: bypass vs HF, quantized vs reference."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from llm_mixed_q_tpu.models.api import make_forward
from llm_mixed_q_tpu.models.hf_loader import opt_params_from_flat
from llm_mixed_q_tpu.models.opt import (
    OPTQuantizedConfig,
    opt_for_causal_lm,
    opt_for_sequence_classification,
    quantize_opt_params_ptq,
)

TINY = dict(
    vocab_size=120,
    hidden_size=64,
    num_hidden_layers=2,
    ffn_dim=160,
    num_attention_heads=4,
    max_position_embeddings=128,
    word_embed_proj_dim=48,
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
}


@pytest.fixture(scope="module")
def hf_model():
    import torch
    from transformers import OPTConfig, OPTForCausalLM

    torch.manual_seed(0)
    cfg = OPTConfig(
        **TINY, attn_implementation="eager", use_cache=False, dropout=0.0
    )
    model = OPTForCausalLM(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(2)
    input_ids = rng.integers(2, TINY["vocab_size"], size=(2, 21))
    attention_mask = np.ones_like(input_ids)
    attention_mask[1, 15:] = 0
    return input_ids.astype(np.int64), attention_mask.astype(np.int64)


def test_bypass_matches_hf(hf_model, batch):
    import torch

    input_ids, attention_mask = batch
    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(attention_mask),
        ).logits.numpy()

    config = OPTQuantizedConfig(**TINY, quant_config=None)
    params = opt_params_from_flat(hf_model.state_dict(), config, task="lm")
    fwd = make_forward("opt", "lm", config)
    out = fwd(params, jnp.asarray(input_ids), jnp.asarray(attention_mask))
    ours = np.asarray(out["logits"])
    mask = attention_mask.astype(bool)
    np.testing.assert_allclose(ours[mask], ref[mask], rtol=2e-4, atol=2e-4)


def test_quantized_matches_reference(hf_model, batch):
    import torch

    from reference_loader import shim_reference_deps

    shim_reference_deps()
    from llm_mixed_q.models.opt_quantized import (
        OPTQuantizedConfig as RefConfig,
        OPTQuantizedForCausalLM as RefModel,
    )

    input_ids, attention_mask = batch
    ref_cfg = RefConfig(**TINY, use_cache=False, dropout=0.0)
    ref_cfg.quant_config = BFP6
    ref_model = RefModel(ref_cfg)
    ref_model.load_state_dict(hf_model.state_dict(), strict=False)
    ref_model.eval()
    with torch.no_grad():
        ref = ref_model(
            input_ids=torch.tensor(input_ids),
            attention_mask=torch.tensor(attention_mask),
        ).logits.numpy()

    config = OPTQuantizedConfig(**TINY, quant_config=BFP6)
    params = opt_params_from_flat(hf_model.state_dict(), config, task="lm")
    fwd = make_forward("opt", "lm", config, quantize_weights=True)
    out = fwd(params, jnp.asarray(input_ids), jnp.asarray(attention_mask))
    ours = np.asarray(out["logits"])
    mask = attention_mask.astype(bool)
    d = np.abs(ours[mask] - ref[mask])
    assert np.median(d) < 1e-5, f"median {np.median(d)}"
    assert d.mean() < 2e-4, f"mean {d.mean()}"
    assert d.max() < 0.05, f"max diff {d.max()}"

    params_q = quantize_opt_params_ptq(params, config)
    fwd_ptq = make_forward("opt", "lm", config, quantize_weights=False)
    out2 = fwd_ptq(params_q, jnp.asarray(input_ids), jnp.asarray(attention_mask))
    np.testing.assert_allclose(np.asarray(out2["logits"]), ours, rtol=1e-5, atol=1e-5)


def test_packed_opt_matches_fake_quant(hf_model, batch):
    from llm_mixed_q_tpu.models.opt.pack import pack_opt_params

    input_ids, attention_mask = batch
    config = OPTQuantizedConfig(**TINY, quant_config=BFP6)
    params = opt_params_from_flat(hf_model.state_dict(), config, task="lm")
    fake = make_forward("opt", "lm", config, quantize_weights=True)
    ref = np.asarray(
        fake(params, jnp.asarray(input_ids), jnp.asarray(attention_mask))["logits"]
    )
    packed = pack_opt_params(params, config)
    fwd = make_forward("opt", "lm", config, quantize_weights=False)
    out = np.asarray(
        fwd(packed, jnp.asarray(input_ids), jnp.asarray(attention_mask))["logits"]
    )
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=5e-4)


def test_sequence_classification_runs(hf_model):
    config = OPTQuantizedConfig(**TINY, quant_config=BFP6)
    params = opt_params_from_flat(hf_model.state_dict(), config, task="cls")
    ids = np.array([[5, 6, 7, 1, 1], [8, 9, 10, 11, 12]], dtype=np.int64)
    msk = (ids != 1).astype(np.int64)
    fwd = make_forward("opt", "cls", config, with_labels=True)
    out = fwd(params, jnp.asarray(ids), jnp.asarray(msk), jnp.asarray([0, 1]))
    assert out["logits"].shape == (2, 2)
    assert np.isfinite(float(out["loss"]))
