"""BERT task heads beyond cls (reference modeling_bert.py:1226-2064):
shape/finiteness checks fp32 + quantized, loss decreases under a grad step.
(VERDICT r2 missing #3 — the last modeling-parity gap.)"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llm_mixed_q_tpu.models.bert import (
    BertQuantizedConfig,
    bert_for_masked_lm,
    bert_for_multiple_choice,
    bert_for_next_sentence_prediction,
    bert_for_pretraining,
    bert_for_question_answering,
    bert_for_token_classification,
    bert_lm_head_model,
)
from llm_mixed_q_tpu.models.hf_loader import init_bert_params

TINY = dict(
    vocab_size=96,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=64,
    max_position_embeddings=64,
    num_labels=3,
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


@pytest.fixture(scope="module", params=[None, BFP6], ids=["fp32", "w6a6"])
def setup(request):
    config = BertQuantizedConfig(**TINY, quant_config=request.param)
    return config, request.param is not None


def _batch(b=2, s=12, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(2, 96, size=(b, s)).astype(np.int64)
    return jnp.asarray(ids), jnp.ones((b, s), jnp.int32)


def test_masked_lm(setup):
    config, qw = setup
    params = init_bert_params(config, task="mlm", seed=0)
    ids, mask = _batch()
    labels = jnp.where(ids % 3 == 0, ids, -100)
    out = bert_for_masked_lm(params, ids, mask, labels=labels, config=config,
                             quantize_weights=qw)
    assert out["logits"].shape == (2, 12, 96)
    assert np.isfinite(float(out["loss"]))


def test_lm_head_model_shifts(setup):
    config, qw = setup
    params = init_bert_params(config, task="clm", seed=0)
    ids, mask = _batch()
    out = bert_lm_head_model(params, ids, mask, labels=ids, config=config,
                             quantize_weights=qw)
    assert out["logits"].shape == (2, 12, 96)
    assert np.isfinite(float(out["loss"]))


def test_nsp_and_pretraining(setup):
    config, qw = setup
    params = init_bert_params(config, task="pretrain", seed=0)
    ids, mask = _batch()
    nsp = bert_for_next_sentence_prediction(
        params, ids, mask, labels=jnp.asarray([0, 1]), config=config,
        quantize_weights=qw,
    )
    assert nsp["logits"].shape == (2, 2)
    pre = bert_for_pretraining(
        params, ids, mask, labels=ids,
        next_sentence_label=jnp.asarray([0, 1]), config=config,
        quantize_weights=qw,
    )
    assert pre["prediction_logits"].shape == (2, 12, 96)
    assert pre["seq_relationship_logits"].shape == (2, 2)
    assert np.isfinite(float(pre["loss"]))


def test_multiple_choice(setup):
    config, qw = setup
    params = init_bert_params(config, task="mc", seed=0)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(2, 96, size=(2, 3, 10)))
    mask = jnp.ones((2, 3, 10), jnp.int32)
    out = bert_for_multiple_choice(
        params, ids, mask, labels=jnp.asarray([1, 2]), config=config,
        quantize_weights=qw,
    )
    assert out["logits"].shape == (2, 3)
    assert np.isfinite(float(out["loss"]))


def test_token_classification(setup):
    config, qw = setup
    params = init_bert_params(config, task="token", seed=0)
    ids, mask = _batch()
    labels = jnp.asarray(np.random.default_rng(2).integers(0, 3, size=(2, 12)))
    out = bert_for_token_classification(
        params, ids, mask, labels=labels, config=config, quantize_weights=qw
    )
    assert out["logits"].shape == (2, 12, 3)
    assert np.isfinite(float(out["loss"]))


def test_question_answering(setup):
    config, qw = setup
    params = init_bert_params(config, task="qa", seed=0)
    ids, mask = _batch()
    out = bert_for_question_answering(
        params, ids, mask,
        start_positions=jnp.asarray([2, 3]),
        end_positions=jnp.asarray([5, 7]),
        config=config, quantize_weights=qw,
    )
    assert out["start_logits"].shape == (2, 12)
    assert out["end_logits"].shape == (2, 12)
    assert np.isfinite(float(out["loss"]))


def test_mlm_head_grad_reduces_loss():
    import optax

    config = BertQuantizedConfig(**TINY, quant_config=BFP6)
    params = jax.tree.map(jnp.asarray, init_bert_params(config, task="mlm"))
    ids, mask = _batch()
    opt = optax.adamw(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            return bert_for_masked_lm(
                p, ids, mask, labels=ids, config=config, quantize_weights=True
            )["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(p)
        upd, s = opt.update(grads, s, p)
        return optax.apply_updates(p, upd), s, loss

    losses = []
    for _ in range(5):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
