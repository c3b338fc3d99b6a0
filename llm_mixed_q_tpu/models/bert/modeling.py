"""Functional quantized BERT in JAX.

Reference: src/llm_mixed_q/models/bert_quantized/modeling_bert.py (2161 LoC).
Numerics mirrored:
- embeddings: word + absolute position + token_type, LayerNorm
- self-attention: quantized query/key/value linears (modeling_bert.py:281-287),
  quantized matmul_0 = q @ k^T THEN / sqrt(head_dim) (modeling_bert.py:366-421),
  additive extended mask, softmax, quantized matmul_1 (modeling_bert.py:433)
- post-LN blocks: SelfOutput/Output dense -> LayerNorm(residual)
  (modeling_bert.py:454,536,557)
- pooler: tanh(dense(first token)); classifier head
Only ForSequenceClassification is exercised by the reference experiments; the
backbone here also powers the stat profiler hooks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.functions import quantized_matmul
from ...ops.linear import quantized_linear
from ..opt.modeling import layer_norm
from .configuration import BertQuantizedConfig

_BYPASS = {"bypass": True, "name": "integer"}

ACT2FN = {
    "gelu": partial(jax.nn.gelu, approximate=False),
    "gelu_new": partial(jax.nn.gelu, approximate=True),
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
}


def _node_cfg(quant_config, layer_idx: int, *path) -> dict:
    if quant_config is None:
        return _BYPASS
    node = quant_config[f"model_layer_{layer_idx}"]
    for p in path:
        node = node[p]
    return node


def bert_embeddings(params, input_ids, token_type_ids, config):
    seq_len = input_ids.shape[1]
    pos_ids = jnp.arange(seq_len)[None, :]
    h = (
        params["word_embeddings"]["weight"][input_ids]
        + params["position_embeddings"]["weight"][pos_ids]
        + params["token_type_embeddings"]["weight"][token_type_ids]
    )
    return layer_norm(
        h,
        params["LayerNorm"]["weight"],
        params["LayerNorm"]["bias"],
        config.layer_norm_eps,
    )


def bert_self_attention(params, hidden, ext_mask, config, layer_idx, quantize_weights):
    b, s, _ = hidden.shape
    nh, hd = config.num_attention_heads, config.head_dim
    qc = partial(_node_cfg, config.quant_config, layer_idx, "attention")

    def proj(name):
        out = quantized_linear(
            hidden,
            params[name]["weight"],
            params[name].get("bias"),
            qc(name),
            quantize_weights,
            node_name=f"model_layer_{layer_idx}:attention:{name}",
        )
        return out.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)

    q, k, v = proj("query"), proj("key"), proj("value")
    scores = quantized_matmul(q, k.transpose(0, 1, 3, 2), qc("matmul_0"))
    scores = scores / jnp.sqrt(jnp.asarray(hd, scores.dtype))
    if ext_mask is not None:
        scores = scores + ext_mask
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    ctx = quantized_matmul(probs, v, qc("matmul_1"))
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, nh * hd)
    return ctx


def bert_layer(params, hidden, ext_mask, config, layer_idx, quantize_weights):
    ctx = bert_self_attention(
        params["attention"], hidden, ext_mask, config, layer_idx, quantize_weights
    )
    # SelfOutput: dense -> LayerNorm(residual)
    so = params["attention"]["output"]
    attn_out = quantized_linear(
        ctx,
        so["dense"]["weight"],
        so["dense"].get("bias"),
        _node_cfg(config.quant_config, layer_idx, "attention", "output", "dense"),
        quantize_weights,
        node_name=f"model_layer_{layer_idx}:attention:output:dense",
    )
    hidden = layer_norm(
        attn_out + hidden,
        so["LayerNorm"]["weight"],
        so["LayerNorm"]["bias"],
        config.layer_norm_eps,
    )
    # Intermediate -> Output
    inter = quantized_linear(
        hidden,
        params["intermediate"]["dense"]["weight"],
        params["intermediate"]["dense"].get("bias"),
        _node_cfg(config.quant_config, layer_idx, "intermediate", "dense"),
        quantize_weights,
        node_name=f"model_layer_{layer_idx}:intermediate:dense",
    )
    inter = ACT2FN[config.hidden_act](inter)
    out = quantized_linear(
        inter,
        params["output"]["dense"]["weight"],
        params["output"]["dense"].get("bias"),
        _node_cfg(config.quant_config, layer_idx, "output", "dense"),
        quantize_weights,
        node_name=f"model_layer_{layer_idx}:output:dense",
    )
    hidden = layer_norm(
        out + hidden,
        params["output"]["LayerNorm"]["weight"],
        params["output"]["LayerNorm"]["bias"],
        config.layer_norm_eps,
    )
    return hidden


def bert_model(
    params,
    input_ids,
    attention_mask=None,
    token_type_ids=None,
    config: BertQuantizedConfig = None,
    quantize_weights: bool = True,
):
    """Returns (sequence_output [b,s,h], pooled_output [b,h] or None)."""
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    if attention_mask is None:
        attention_mask = jnp.ones_like(input_ids)
    hidden = bert_embeddings(params["embeddings"], input_ids, token_type_ids, config)
    # extended additive mask [b,1,1,s]
    ext_mask = (1.0 - attention_mask[:, None, None, :].astype(hidden.dtype)) * float(
        np.finfo(np.float32).min
    )
    for i, layer_params in enumerate(params["layers"]):
        hidden = bert_layer(
            layer_params, hidden, ext_mask, config, i, quantize_weights
        )
    pooled = None
    if "pooler" in params:
        pooled = jnp.tanh(
            hidden[:, 0] @ params["pooler"]["dense"]["weight"].T
            + params["pooler"]["dense"]["bias"]
        )
    return hidden, pooled


def _token_ce_loss(logits, labels, ignore_index=-100):
    """Mean CE over labels != ignore_index (HF convention)."""
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    safe = jnp.where(labels == ignore_index, 0, labels)
    ll = jnp.take_along_axis(logprobs, safe[..., None], axis=-1)[..., 0]
    keep = (labels != ignore_index).astype(jnp.float32)
    return -jnp.sum(ll * keep) / jnp.maximum(jnp.sum(keep), 1.0)


def _mlm_logits(params, hidden, config):
    """BertLMPredictionHead: dense + gelu + LayerNorm transform, decoder
    tied to the word embeddings + an output bias (reference
    modeling_bert.py:1226-1270)."""
    t = params["cls"]["transform"]
    h = hidden @ t["dense"]["weight"].T + t["dense"]["bias"]
    h = jax.nn.gelu(h, approximate=False)
    h = layer_norm(
        h, t["LayerNorm"]["weight"], t["LayerNorm"]["bias"],
        config.layer_norm_eps,
    )
    dec_w = params["cls"].get("decoder", {}).get(
        "weight", params["embeddings"]["word_embeddings"]["weight"]
    )
    return h @ dec_w.T + params["cls"]["bias"]


def bert_for_masked_lm(
    params, input_ids, attention_mask=None, token_type_ids=None, labels=None,
    config: BertQuantizedConfig = None, quantize_weights: bool = True,
):
    """Reference BertForMaskedLM (modeling_bert.py:1441-1528)."""
    hidden, _ = bert_model(
        params, input_ids, attention_mask, token_type_ids, config,
        quantize_weights,
    )
    logits = _mlm_logits(params, hidden, config)
    out = {"logits": logits}
    if labels is not None:
        out["loss"] = _token_ce_loss(logits, labels)
    return out


def bert_lm_head_model(
    params, input_ids, attention_mask=None, token_type_ids=None, labels=None,
    config: BertQuantizedConfig = None, quantize_weights: bool = True,
):
    """Causal-LM-style head: MLM head with SHIFTED labels (reference
    BertLMHeadModel, modeling_bert.py:1331-1438)."""
    hidden, _ = bert_model(
        params, input_ids, attention_mask, token_type_ids, config,
        quantize_weights,
    )
    logits = _mlm_logits(params, hidden, config)
    out = {"logits": logits}
    if labels is not None:
        out["loss"] = _token_ce_loss(logits[:, :-1], labels[:, 1:])
    return out


def bert_for_next_sentence_prediction(
    params, input_ids, attention_mask=None, token_type_ids=None, labels=None,
    config: BertQuantizedConfig = None, quantize_weights: bool = True,
):
    """Reference BertForNextSentencePrediction (modeling_bert.py:1645-1744)."""
    _, pooled = bert_model(
        params, input_ids, attention_mask, token_type_ids, config,
        quantize_weights,
    )
    sr = params["cls"]["seq_relationship"]
    logits = pooled @ sr["weight"].T + sr["bias"]
    out = {"logits": logits}
    if labels is not None:
        out["loss"] = _token_ce_loss(logits, labels)
    return out


def bert_for_pretraining(
    params, input_ids, attention_mask=None, token_type_ids=None, labels=None,
    next_sentence_label=None,
    config: BertQuantizedConfig = None, quantize_weights: bool = True,
):
    """Reference BertForPreTraining: MLM + NSP joint head
    (modeling_bert.py:1274-1328 equivalent span)."""
    hidden, pooled = bert_model(
        params, input_ids, attention_mask, token_type_ids, config,
        quantize_weights,
    )
    mlm_logits = _mlm_logits(params, hidden, config)
    sr = params["cls"]["seq_relationship"]
    nsp_logits = pooled @ sr["weight"].T + sr["bias"]
    out = {"prediction_logits": mlm_logits, "seq_relationship_logits": nsp_logits}
    if labels is not None and next_sentence_label is not None:
        out["loss"] = _token_ce_loss(mlm_logits, labels) + _token_ce_loss(
            nsp_logits, next_sentence_label
        )
    return out


def bert_for_multiple_choice(
    params, input_ids, attention_mask=None, token_type_ids=None, labels=None,
    config: BertQuantizedConfig = None, quantize_weights: bool = True,
):
    """Reference BertForMultipleChoice (modeling_bert.py:1845-1951):
    input [b, n_choices, s] flattened through the encoder, pooled output
    scored by a 1-logit classifier, softmax over choices."""
    b, n, s = input_ids.shape
    flat = lambda x: None if x is None else x.reshape(b * n, s)
    _, pooled = bert_model(
        params, flat(input_ids), flat(attention_mask), flat(token_type_ids),
        config, quantize_weights,
    )
    logits = (
        pooled @ params["classifier"]["weight"].T
        + params["classifier"]["bias"]
    ).reshape(b, n)
    out = {"logits": logits}
    if labels is not None:
        out["loss"] = _token_ce_loss(logits, labels)
    return out


def bert_for_token_classification(
    params, input_ids, attention_mask=None, token_type_ids=None, labels=None,
    config: BertQuantizedConfig = None, quantize_weights: bool = True,
):
    """Reference BertForTokenClassification (modeling_bert.py:1954-2020)."""
    hidden, _ = bert_model(
        params, input_ids, attention_mask, token_type_ids, config,
        quantize_weights,
    )
    logits = (
        hidden @ params["classifier"]["weight"].T
        + params["classifier"]["bias"]
    )
    out = {"logits": logits}
    if labels is not None:
        out["loss"] = _token_ce_loss(logits, labels)
    return out


def bert_for_question_answering(
    params, input_ids, attention_mask=None, token_type_ids=None,
    start_positions=None, end_positions=None,
    config: BertQuantizedConfig = None, quantize_weights: bool = True,
):
    """Reference BertForQuestionAnswering (modeling_bert.py:2023-2064):
    span start/end logits from a 2-output dense over sequence states."""
    hidden, _ = bert_model(
        params, input_ids, attention_mask, token_type_ids, config,
        quantize_weights,
    )
    logits = (
        hidden @ params["qa_outputs"]["weight"].T
        + params["qa_outputs"]["bias"]
    )
    start_logits, end_logits = logits[..., 0], logits[..., 1]
    out = {"start_logits": start_logits, "end_logits": end_logits}
    if start_positions is not None and end_positions is not None:
        out["loss"] = 0.5 * (
            _token_ce_loss(start_logits, start_positions)
            + _token_ce_loss(end_logits, end_positions)
        )
    return out


def bert_for_sequence_classification(
    params,
    input_ids,
    attention_mask=None,
    token_type_ids=None,
    labels=None,
    config: BertQuantizedConfig = None,
    quantize_weights: bool = True,
):
    """Reference modeling_bert.py:1747-… (the exercised head)."""
    _, pooled = bert_model(
        params, input_ids, attention_mask, token_type_ids, config, quantize_weights
    )
    logits = pooled @ params["classifier"]["weight"].T + params["classifier"]["bias"]
    out = {"logits": logits}
    if labels is not None:
        if config.num_labels == 1:
            out["loss"] = jnp.mean((logits.squeeze(-1) - labels) ** 2)
        else:
            logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            out["loss"] = -jnp.mean(
                jnp.take_along_axis(logprobs, labels[:, None], axis=-1)
            )
    return out
