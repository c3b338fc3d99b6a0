"""BERT model integration tests: bypass vs HF, quantized vs reference."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from llm_mixed_q_tpu.models.bert import (
    BertQuantizedConfig,
    bert_for_sequence_classification,
    quantize_bert_params_ptq,
)
from llm_mixed_q_tpu.models.api import make_forward
from llm_mixed_q_tpu.models.hf_loader import bert_params_from_flat

TINY = dict(
    vocab_size=120,
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=160,
    max_position_embeddings=64,
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
    from transformers import BertConfig, BertForSequenceClassification

    torch.manual_seed(0)
    cfg = BertConfig(
        **TINY,
        attn_implementation="eager",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    model = BertForSequenceClassification(cfg)
    model.eval()
    return model


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(3)
    ids = rng.integers(1, TINY["vocab_size"], size=(2, 19))
    mask = np.ones_like(ids)
    mask[1, 13:] = 0
    ids[1, 13:] = 0
    return ids.astype(np.int64), mask.astype(np.int64)


def test_bypass_matches_hf(hf_model, batch):
    import torch

    ids, mask = batch
    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()
    config = BertQuantizedConfig(**TINY, quant_config=None)
    params = bert_params_from_flat(hf_model.state_dict(), config, task="cls")
    fwd = make_forward("bert", "cls", config)
    out = fwd(params, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(out["logits"]), ref, rtol=2e-4, atol=2e-4
    )


def test_quantized_matches_reference(hf_model, batch):
    import torch

    from reference_loader import shim_reference_deps

    shim_reference_deps()
    from llm_mixed_q.models.bert_quantized import (
        BertQuantizedConfig as RefConfig,
        BertQuantizedForSequenceClassification as RefModel,
    )

    ids, mask = batch
    ref_cfg = RefConfig(
        **TINY, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0
    )
    ref_cfg.quant_config = BFP6
    ref_model = RefModel(ref_cfg)
    ref_model.load_state_dict(hf_model.state_dict(), strict=False)
    ref_model.eval()
    with torch.no_grad():
        ref = ref_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).logits.numpy()

    config = BertQuantizedConfig(**TINY, quant_config=BFP6)
    params = bert_params_from_flat(hf_model.state_dict(), config, task="cls")
    fwd = make_forward("bert", "cls", config)
    out = fwd(params, jnp.asarray(ids), jnp.asarray(mask))
    d = np.abs(np.asarray(out["logits"]) - ref)
    assert np.median(d) < 5e-5, f"median {np.median(d)}"
    assert d.mean() < 5e-4, f"mean {d.mean()}"
    assert d.max() < 0.05, f"max diff {d.max()}"

    params_q = quantize_bert_params_ptq(params, config)
    fwd_ptq = make_forward("bert", "cls", config, quantize_weights=False)
    out2 = fwd_ptq(params_q, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(out2["logits"]), np.asarray(out["logits"]), rtol=1e-5, atol=1e-5
    )


def test_packed_bert_matches_fake_quant(hf_model, batch):
    from llm_mixed_q_tpu.models.bert.pack import pack_bert_params

    ids, mask = batch
    config = BertQuantizedConfig(**TINY, quant_config=BFP6)
    params = bert_params_from_flat(hf_model.state_dict(), config, task="cls")
    fake = make_forward("bert", "cls", config, quantize_weights=True)
    ref = np.asarray(fake(params, jnp.asarray(ids), jnp.asarray(mask))["logits"])
    packed = pack_bert_params(params, config)
    fwd = make_forward("bert", "cls", config, quantize_weights=False)
    out = np.asarray(fwd(packed, jnp.asarray(ids), jnp.asarray(mask))["logits"])
    np.testing.assert_allclose(out, ref, rtol=5e-4, atol=5e-4)
