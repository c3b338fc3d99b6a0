"""Functional quantized OPT in JAX.

Reference: src/llm_mixed_q/models/opt_quantized/modeling_opt.py (1423 LoC).
Numerics mirrored:
- learned positional embedding with +2 offset, indexed by
  cumsum(attention_mask) - 1 (modeling_opt.py:115-141)
- q scaled by head_dim**-0.5 BEFORE bmm_0 quantization (modeling_opt.py:206)
- quantized bmm_0/bmm_1 on [bsz*heads, t, d] rank-3 operands
  (modeling_opt.py:246,312) — so block quantizers take the 3-D activation path
- pre/post layer-norm order via do_layer_norm_before (modeling_opt.py:353-420)
- optional word_embed_proj_dim project_in/out (modeling_opt.py:550-640)
- heads: CausalLM (tied lm_head), SequenceClassification (last-non-pad
  pooling), QuestionAnswering (start/end span logits)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.functions import quantized_matmul
from ...ops.linear import quantized_linear
from ..llama.modeling import causal_lm_loss, make_causal_mask
from .configuration import OPTQuantizedConfig

NEG_INF = float(np.finfo(np.float32).min)
_BYPASS = {"bypass": True, "name": "integer"}

ACT2FN = {
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "silu": jax.nn.silu,
    "gelu_new": partial(jax.nn.gelu, approximate=True),
}


def _node_cfg(quant_config, layer_idx: int, *path) -> dict:
    if quant_config is None:
        return _BYPASS
    node = quant_config[f"model_layer_{layer_idx}"]
    for p in path:
        node = node[p]
    return node


def layer_norm(x, weight, bias, eps: float = 1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight + bias
    return y


def opt_learned_positional_embedding(weight, attention_mask, past_len: int = 0):
    """positions = cumsum(mask)*mask - 1, sliced past past_len, +2 offset
    (reference modeling_opt.py:115-141)."""
    mask = attention_mask.astype(jnp.int32)
    positions = jnp.cumsum(mask, axis=1) * mask - 1
    positions = positions[:, past_len:]
    return weight[positions + 2]


def opt_attention(
    params,
    hidden,
    mask,
    config: OPTQuantizedConfig,
    layer_idx: int,
    quantize_weights: bool,
    past_kv=None,
):
    b, q_len, _ = hidden.shape
    nh, hd = config.num_attention_heads, config.head_dim
    qc = partial(_node_cfg, config.quant_config, layer_idx, "self_attn")

    def proj(name):
        return quantized_linear(
            hidden,
            params[name]["weight"],
            params[name].get("bias"),
            qc(name),
            quantize_weights,
            node_name=f"model_layer_{layer_idx}:self_attn:{name}",
        )

    # scaling folded into q BEFORE bmm_0 quantization (modeling_opt.py:206)
    q = proj("q_proj") * (hd**-0.5)
    k = proj("k_proj")
    v = proj("v_proj")

    def shape(t, s):
        return t.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)

    q, k, v = shape(q, q_len), shape(k, q_len), shape(v, q_len)
    if past_kv is not None:
        k = jnp.concatenate([past_kv[0], k], axis=2)
        v = jnp.concatenate([past_kv[1], v], axis=2)
    new_kv = (k, v)
    kv_len = k.shape[2]

    # rank-3 [b*h, t, d] operands as the reference's torch.bmm path
    q3 = q.reshape(b * nh, q_len, hd)
    k3 = k.reshape(b * nh, kv_len, hd)
    v3 = v.reshape(b * nh, kv_len, hd)

    attn_weights = quantized_matmul(q3, k3.transpose(0, 2, 1), qc("bmm_0"), "bmm")
    if mask is not None:
        attn_weights = attn_weights.reshape(b, nh, q_len, kv_len) + mask
        attn_weights = jnp.maximum(attn_weights, NEG_INF)
        attn_weights = attn_weights.reshape(b * nh, q_len, kv_len)
    attn_weights = jax.nn.softmax(attn_weights.astype(jnp.float32), axis=-1).astype(
        q.dtype
    )

    attn_output = quantized_matmul(attn_weights, v3, qc("bmm_1"), "bmm")
    attn_output = (
        attn_output.reshape(b, nh, q_len, hd).transpose(0, 2, 1, 3).reshape(b, q_len, nh * hd)
    )
    attn_output = quantized_linear(
        attn_output,
        params["out_proj"]["weight"],
        params["out_proj"].get("bias"),
        qc("out_proj"),
        quantize_weights,
        node_name=f"model_layer_{layer_idx}:self_attn:out_proj",
    )
    return attn_output, new_kv


def opt_decoder_layer(
    params, hidden, mask, config, layer_idx: int, quantize_weights: bool, past_kv=None
):
    residual = hidden
    h = hidden
    if config.do_layer_norm_before:
        h = layer_norm(
            h,
            params["self_attn_layer_norm"].get("weight"),
            params["self_attn_layer_norm"].get("bias"),
        )
    h, new_kv = opt_attention(
        params["self_attn"], h, mask, config, layer_idx, quantize_weights, past_kv
    )
    hidden = residual + h
    if not config.do_layer_norm_before:
        hidden = layer_norm(
            hidden,
            params["self_attn_layer_norm"].get("weight"),
            params["self_attn_layer_norm"].get("bias"),
        )

    residual = hidden
    h = hidden
    if config.do_layer_norm_before:
        h = layer_norm(
            h,
            params["final_layer_norm"].get("weight"),
            params["final_layer_norm"].get("bias"),
        )
    h = quantized_linear(
        h,
        params["fc1"]["weight"],
        params["fc1"].get("bias"),
        _node_cfg(config.quant_config, layer_idx, "fc1"),
        quantize_weights,
        node_name=f"model_layer_{layer_idx}:fc1",
    )
    h = ACT2FN[config.activation_function](h)
    h = quantized_linear(
        h,
        params["fc2"]["weight"],
        params["fc2"].get("bias"),
        _node_cfg(config.quant_config, layer_idx, "fc2"),
        quantize_weights,
        node_name=f"model_layer_{layer_idx}:fc2",
    )
    hidden = residual + h
    if not config.do_layer_norm_before:
        hidden = layer_norm(
            hidden,
            params["final_layer_norm"].get("weight"),
            params["final_layer_norm"].get("bias"),
        )
    return hidden, new_kv


def opt_model(
    params,
    input_ids,
    attention_mask,
    config: OPTQuantizedConfig,
    quantize_weights: bool = True,
    past_kvs=None,
):
    b, q_len = input_ids.shape
    past_len = 0 if past_kvs is None else past_kvs[0][0].shape[2]
    kv_len = past_len + q_len

    if attention_mask is None:
        attention_mask = jnp.ones((b, kv_len), dtype=jnp.int32)

    hidden = params["embed_tokens"]["weight"][input_ids]
    if "project_in" in params:
        hidden = hidden @ params["project_in"]["weight"].T
    pos_embed = opt_learned_positional_embedding(
        params["embed_positions"]["weight"], attention_mask, past_len
    )
    hidden = hidden + pos_embed

    mask = make_causal_mask(attention_mask, q_len, kv_len, hidden.dtype)
    if past_len:
        causal = jnp.tril(jnp.ones((q_len, kv_len), dtype=bool), k=past_len)
        ok = jnp.logical_and(
            causal[None, None], attention_mask[:, None, None, :].astype(bool)
        )
        mask = jnp.where(ok, 0.0, NEG_INF).astype(hidden.dtype)

    new_kvs = []
    for i, layer_params in enumerate(params["layers"]):
        past = None if past_kvs is None else past_kvs[i]
        hidden, new_kv = opt_decoder_layer(
            layer_params, hidden, mask, config, i, quantize_weights, past
        )
        new_kvs.append(new_kv)

    if "final_layer_norm" in params and config.do_layer_norm_before:
        hidden = layer_norm(
            hidden,
            params["final_layer_norm"].get("weight"),
            params["final_layer_norm"].get("bias"),
        )
    if "project_out" in params:
        hidden = hidden @ params["project_out"]["weight"].T
    return hidden, new_kvs


def opt_for_causal_lm(
    params,
    input_ids,
    attention_mask=None,
    labels=None,
    config: OPTQuantizedConfig = None,
    quantize_weights: bool = True,
    past_kvs=None,
):
    hidden, new_kvs = opt_model(
        params, input_ids, attention_mask, config, quantize_weights, past_kvs
    )
    lm_w = params.get("lm_head", params["embed_tokens"])["weight"]
    logits = hidden @ lm_w.T
    out = {"logits": logits, "past_kvs": new_kvs}
    if labels is not None:
        out["loss"] = causal_lm_loss(logits, labels)
    return out


def opt_for_sequence_classification(
    params,
    input_ids,
    attention_mask=None,
    labels=None,
    config: OPTQuantizedConfig = None,
    quantize_weights: bool = True,
):
    hidden, _ = opt_model(params, input_ids, attention_mask, config, quantize_weights)
    logits = hidden @ params["score"]["weight"].T
    b = input_ids.shape[0]
    if config.pad_token_id is None:
        seq_idx = jnp.full((b,), input_ids.shape[1] - 1, dtype=jnp.int32)
    else:
        is_not_pad = (input_ids != config.pad_token_id).astype(jnp.int32)
        seq_idx = jnp.maximum(jnp.sum(is_not_pad, axis=-1) - 1, 0)
    pooled = logits[jnp.arange(b), seq_idx]
    out = {"logits": pooled}
    if labels is not None:
        if config.num_labels == 1:
            out["loss"] = jnp.mean((pooled.squeeze(-1) - labels) ** 2)
        else:
            logprobs = jax.nn.log_softmax(pooled.astype(jnp.float32), axis=-1)
            out["loss"] = -jnp.mean(
                jnp.take_along_axis(logprobs, labels[:, None], axis=-1)
            )
    return out


def opt_for_question_answering(
    params,
    input_ids,
    attention_mask=None,
    start_positions=None,
    end_positions=None,
    config: OPTQuantizedConfig = None,
    quantize_weights: bool = True,
):
    """Span QA head (reference modeling_opt.py:1296-1423)."""
    hidden, _ = opt_model(params, input_ids, attention_mask, config, quantize_weights)
    logits = hidden @ params["qa_outputs"]["weight"].T + params["qa_outputs"]["bias"]
    start_logits, end_logits = logits[..., 0], logits[..., 1]
    out = {"start_logits": start_logits, "end_logits": end_logits}
    if start_positions is not None and end_positions is not None:
        def ce(lg, pos):
            lp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
            return -jnp.mean(jnp.take_along_axis(lp, pos[:, None], axis=-1))

        out["loss"] = (ce(start_logits, start_positions) + ce(end_logits, end_positions)) / 2
    return out
