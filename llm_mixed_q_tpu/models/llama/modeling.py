"""Functional quantized Llama in JAX.

Reference: src/llm_mixed_q/models/llama_quantized/modeling_llama.py (1070 LoC
torch fork of HF Llama). Re-designed functionally for TPU: a model is a pure
``apply(params, batch)`` closed over a static config; quantization is a
property of the per-node quant config (fake-quant today, packed Pallas kernels
via llm_mixed_q_tpu.kernels). No nn.Module mutation, no device dispatch —
sharding is applied to the params pytree externally (llm_mixed_q_tpu.parallel).

Numerics mirror the reference:
- RMSNorm variance in fp32 (modeling_llama.py:100-113)
- RoPE tables cos/sin [seq, dim] quantized per the rope node config, rotation
  full precision (modeling_llama.py:289-299)
- quantized matmul_0 = q @ k^T then / sqrt(head_dim) (modeling_llama.py:309-314)
- additive causal+padding mask, clamped at finfo.min, fp32 softmax
  (modeling_llama.py:322-336)
- quantized matmul_1 = attn @ v (modeling_llama.py:341-344)
- causal-LM loss: shift-logits cross entropy (modeling_llama.py:869-879)
- sequence classification: last-non-pad-token pooling (modeling_llama.py:1022-1031)

GQA (num_key_value_heads < num_attention_heads) is supported by repeating KV
heads; the reference fork is MHA-only so parity configs always have
num_key_value_heads == num_attention_heads.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.functions import quantized_apply_rotary_pos_emb, quantized_matmul
from ...ops.linear import quantized_linear
from .configuration import LlamaQuantizedConfig

NEG_INF = float(np.finfo(np.float32).min)

_BYPASS = {"bypass": True, "name": "integer"}


def _node_cfg(quant_config, layer_idx: int, group: str, name: str) -> dict:
    if quant_config is None:
        return _BYPASS
    return quant_config[f"model_layer_{layer_idx}"][group][name]


def rms_norm(x, weight, eps: float):
    input_dtype = x.dtype
    variance = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    x = x.astype(jnp.float32) * jax.lax.rsqrt(variance + eps)
    return (weight * x).astype(input_dtype)


def rope_tables(seq_len: int, head_dim: int, base: float, dtype=jnp.float32):
    """cos/sin [seq_len, head_dim] (reference modeling_llama.py:119-177)."""
    inv_freq = 1.0 / (base ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim))
    t = np.arange(seq_len, dtype=np.float32)
    freqs = np.einsum("i,j->ij", t, inv_freq)
    emb = np.concatenate([freqs, freqs], axis=-1)
    return jnp.asarray(np.cos(emb), dtype), jnp.asarray(np.sin(emb), dtype)


def make_causal_mask(attention_mask, q_len: int, kv_len: int, dtype=jnp.float32):
    """Additive mask [b, 1, q, kv]: 0 where attendable, finfo.min otherwise."""
    causal = jnp.tril(jnp.ones((q_len, kv_len), dtype=bool), k=kv_len - q_len)
    ok = causal[None, None, :, :]
    if attention_mask is not None:
        ok = jnp.logical_and(ok, attention_mask[:, None, None, :].astype(bool))
    return jnp.where(ok, jnp.zeros((), dtype), jnp.asarray(NEG_INF, dtype))


def _repeat_kv(x, n_rep: int):
    if n_rep == 1:
        return x
    b, h, s, d = x.shape
    return jnp.broadcast_to(x[:, :, None], (b, h, n_rep, s, d)).reshape(
        b, h * n_rep, s, d
    )


def attention(
    params: dict,
    hidden: jnp.ndarray,
    mask,
    position_ids,
    cos,
    sin,
    config: LlamaQuantizedConfig,
    layer_idx: int,
    quantize_weights: bool,
    past_kv=None,
):
    b, q_len, _ = hidden.shape
    nh = config.num_attention_heads
    nkv = config.num_key_value_heads
    hd = config.head_dim
    qc = partial(_node_cfg, config.quant_config, layer_idx, "self_attn")

    def heads(out, nheads):
        return out.reshape(b, q_len, nheads, hd).transpose(0, 2, 1, 3)

    if "qkv_proj" in params:
        # fused packed projection (pack.py fuse=True): one kernel launch,
        # one activation quantize; member configs are identical so
        # q_proj's config speaks for all three
        node = params["qkv_proj"]
        fused = quantized_linear(
            hidden, node["weight"], node.get("bias"), qc("q_proj"),
            quantize_weights,
        )
        nq, nk, _ = node["splits"]
        q = heads(fused[..., :nq], nh)
        k = heads(fused[..., nq : nq + nk], nkv)
        v = heads(fused[..., nq + nk :], nkv)
    else:
        def proj(name, nheads):
            out = quantized_linear(
                hidden,
                params[name]["weight"],
                params[name].get("bias"),
                qc(name),
                quantize_weights,
                node_name=f"model_layer_{layer_idx}:self_attn:{name}",
            )
            return heads(out, nheads)

        q = proj("q_proj", nh)
        k = proj("k_proj", nkv)
        v = proj("v_proj", nkv)

    q, k = quantized_apply_rotary_pos_emb(
        q, k, cos, sin, position_ids, qc("rotary_positional_encoding")
    )

    if past_kv is not None:
        k = jnp.concatenate([past_kv[0], k], axis=2)
        v = jnp.concatenate([past_kv[1], v], axis=2)
    new_kv = (k, v)

    k = _repeat_kv(k, nh // nkv)
    v = _repeat_kv(v, nh // nkv)

    chunk = getattr(config, "attention_chunk", None)
    if chunk:
        # O(S*chunk)-memory two-pass quantized attention (ops/attention.py);
        # exact reference semantics, enables long context
        from ...ops.attention import chunked_quantized_attention

        attn_output = chunked_quantized_attention(
            q, k, v, mask, qc("matmul_0"), qc("matmul_1"),
            sqrt_hd=math.sqrt(hd), chunk=chunk,
        )
    else:
        attn_weights = quantized_matmul(
            q, k.transpose(0, 1, 3, 2), qc("matmul_0")
        ) / math.sqrt(hd)
        if mask is not None:
            attn_weights = jnp.maximum(attn_weights + mask, NEG_INF)
        attn_weights = jax.nn.softmax(
            attn_weights.astype(jnp.float32), axis=-1
        ).astype(q.dtype)
        attn_output = quantized_matmul(attn_weights, v, qc("matmul_1"))
    attn_output = attn_output.transpose(0, 2, 1, 3).reshape(b, q_len, nh * hd)
    attn_output = quantized_linear(
        attn_output,
        params["o_proj"]["weight"],
        params["o_proj"].get("bias"),
        qc("o_proj"),
        quantize_weights,
        node_name=f"model_layer_{layer_idx}:self_attn:o_proj",
    )
    return attn_output, new_kv


def mlp(params, hidden, config, layer_idx: int, quantize_weights: bool):
    qc = partial(_node_cfg, config.quant_config, layer_idx, "mlp")
    nn = lambda name: f"model_layer_{layer_idx}:mlp:{name}"
    if "gate_up_proj" in params:
        # fused packed projection (pack.py fuse=True); identical configs
        node = params["gate_up_proj"]
        gu = quantized_linear(
            hidden, node["weight"], node.get("bias"), qc("gate_proj"),
            quantize_weights,
        )
        gate = gu[..., : node["splits"][0]]
        up = gu[..., node["splits"][0] :]
    else:
        gate = quantized_linear(
            hidden, params["gate_proj"]["weight"], None, qc("gate_proj"),
            quantize_weights, node_name=nn("gate_proj"),
        )
        up = quantized_linear(
            hidden, params["up_proj"]["weight"], None, qc("up_proj"),
            quantize_weights, node_name=nn("up_proj"),
        )
    return quantized_linear(
        jax.nn.silu(gate) * up,
        params["down_proj"]["weight"],
        None,
        qc("down_proj"),
        quantize_weights,
        node_name=nn("down_proj"),
    )


def decoder_layer(
    params,
    hidden,
    mask,
    position_ids,
    cos,
    sin,
    config,
    layer_idx: int,
    quantize_weights: bool,
    past_kv=None,
):
    residual = hidden
    h = rms_norm(hidden, params["input_layernorm"]["weight"], config.rms_norm_eps)
    h, new_kv = attention(
        params["self_attn"],
        h,
        mask,
        position_ids,
        cos,
        sin,
        config,
        layer_idx,
        quantize_weights,
        past_kv,
    )
    hidden = residual + h
    residual = hidden
    h = rms_norm(
        hidden, params["post_attention_layernorm"]["weight"], config.rms_norm_eps
    )
    h = mlp(params["mlp"], h, config, layer_idx, quantize_weights)
    return residual + h, new_kv


def llama_model(
    params: dict,
    input_ids,
    attention_mask,
    config: LlamaQuantizedConfig,
    quantize_weights: bool = True,
    position_ids=None,
    past_kvs=None,
    remat: bool = False,
):
    """Backbone forward -> (final hidden states [b, s, h], new kv caches)."""
    b, q_len = input_ids.shape
    past_len = 0 if past_kvs is None else past_kvs[0][0].shape[2]
    kv_len = past_len + q_len

    # a bf16 embedding table (pack.py bf16_embed serving option) upcasts at
    # the lookup: the backbone always computes in f32
    hidden = params["embed_tokens"]["weight"][input_ids].astype(jnp.float32)
    if position_ids is None:
        position_ids = jnp.broadcast_to(
            jnp.arange(past_len, kv_len, dtype=jnp.int32)[None, :], (b, q_len)
        )
    cos, sin = rope_tables(kv_len, config.head_dim, config.rope_theta, hidden.dtype)

    if attention_mask is None:
        attention_mask = jnp.ones((b, kv_len), dtype=jnp.int32)
    mask = make_causal_mask(attention_mask, q_len, kv_len, hidden.dtype)
    if past_len:
        # queries sit at the END of the kv axis
        causal = jnp.tril(jnp.ones((q_len, kv_len), dtype=bool), k=past_len)
        ok = jnp.logical_and(
            causal[None, None], attention_mask[:, None, None, :].astype(bool)
        )
        mask = jnp.where(ok, 0.0, NEG_INF).astype(hidden.dtype)

    new_kvs = []
    layer_fn = decoder_layer
    if remat:
        layer_fn = jax.checkpoint(
            decoder_layer, static_argnums=(6, 7, 8), policy=None
        )
    for i, layer_params in enumerate(params["layers"]):
        past = None if past_kvs is None else past_kvs[i]
        hidden, new_kv = layer_fn(
            layer_params,
            hidden,
            mask,
            position_ids,
            cos,
            sin,
            config,
            i,
            quantize_weights,
            past,
        )
        new_kvs.append(new_kv)

    hidden = rms_norm(hidden, params["norm"]["weight"], config.rms_norm_eps)
    return hidden, new_kvs


def llama_for_causal_lm(
    params,
    input_ids,
    attention_mask=None,
    labels=None,
    config: LlamaQuantizedConfig = None,
    quantize_weights: bool = True,
    position_ids=None,
    past_kvs=None,
    remat: bool = False,
):
    """Returns dict(logits=…[, loss=…][, past_kvs=…])."""
    hidden, new_kvs = llama_model(
        params,
        input_ids,
        attention_mask,
        config,
        quantize_weights,
        position_ids,
        past_kvs,
        remat,
    )
    lm_w = params["embed_tokens" if config.tie_word_embeddings else "lm_head"][
        "weight"
    ]
    # bf16 lm_head (pack.py bf16_embed): halve the HBM stream of the
    # decode step's largest dense matmul; hidden is cast to match (the
    # documented serving deviation — logits rounding only). f32 tables
    # keep the reference-exact f32 matmul.
    logits = jax.lax.dot_general(
        hidden.astype(lm_w.dtype), lm_w, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = {"logits": logits, "past_kvs": new_kvs}
    if labels is not None:
        out["loss"] = causal_lm_loss(logits, labels)
    return out


def causal_lm_loss(logits, labels, ignore_index: int = -100):
    """Shifted cross-entropy (reference modeling_llama.py:869-879)."""
    shift_logits = logits[:, :-1, :].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != ignore_index
    safe_labels = jnp.where(valid, shift_labels, 0)
    logprobs = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(logprobs, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)


def llama_for_sequence_classification(
    params,
    input_ids,
    attention_mask=None,
    labels=None,
    config: LlamaQuantizedConfig = None,
    quantize_weights: bool = True,
):
    """Last-non-pad-token pooling (reference modeling_llama.py:1022-1031)."""
    hidden, _ = llama_model(params, input_ids, attention_mask, config, quantize_weights)
    logits = hidden @ params["score"]["weight"].T  # [b, s, num_labels]
    b = input_ids.shape[0]
    if config.pad_token_id is None:
        seq_idx = jnp.full((b,), input_ids.shape[1] - 1, dtype=jnp.int32)
    else:
        is_not_pad = (input_ids != config.pad_token_id).astype(jnp.int32)
        seq_idx = jnp.maximum(
            jnp.sum(is_not_pad, axis=-1) - 1, 0
        )  # index of last non-pad token
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
