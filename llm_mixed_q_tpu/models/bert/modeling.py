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
