"""Chunked (blockwise) quantized attention — O(S·chunk) memory.

The reference materializes the full [b, h, q, kv] score matrix
(modeling_llama.py:309-344), which caps context at ~2k and costs
b·h·S² fp32 in HBM. This module computes the SAME quantized attention
(matmul_0 -> fp32 softmax -> quantize probs -> matmul_1) in KV chunks with a
two-pass online-softmax structure, never materializing more than
[b, h, S, chunk] at once.

Exactness: the reference quantizes the *normalized* softmax probabilities
before matmul_1 (modeling_llama.py:336-344), which a single-pass
flash-attention accumulation cannot reproduce. Pass 1 computes the exact
row max and the online sum; pass 2 recomputes scores per chunk, forms the
exact normalized probs, quantizes them, and accumulates p_q @ v_chunk.
Block-arith parity: [1, 16] blocks tile the kv axis from index 0, so chunk
boundaries at multiples of 16 preserve the reference's block grouping; the
probs of fully-masked positions are exact zeros, which the zero-preserving
quantizer passes through.

This is the XLA-idiomatic formulation (lax.scan over chunks; the per-chunk
matmul/softmax/quantize fuse into a handful of kernels) — no Pallas needed
because nothing here is bandwidth-pathological once the S² buffer is gone.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .functions import (
    BLOCK_LOG_MATMUL_QUANTIZES_Y,
    _quantize_matmul_operand,
)

NEG_INF = -1e9


def _chunk_scores(qq, k_chunk, mask_chunk, mm0_cfg, sqrt_hd):
    """Quantized matmul_0 for one kv chunk + mask: [..., S, chunk] scores.
    Divides by sqrt_hd (not multiply-by-reciprocal) for bit parity with the
    naive path (modeling_llama.py:309-314)."""
    kt = k_chunk.transpose(0, 1, 3, 2)  # [b, h, d, chunk]
    if not mm0_cfg.get("bypass", False):
        if mm0_cfg["name"] != "block_log" or BLOCK_LOG_MATMUL_QUANTIZES_Y:
            kt = _q4(kt, mm0_cfg, "weight")
    s = jnp.matmul(qq, kt) / sqrt_hd
    if mask_chunk is not None:
        s = jnp.maximum(s + mask_chunk, NEG_INF)
    return s.astype(jnp.float32)


def _q4(x, cfg, entry):
    """Quantize a rank-4 operand like quantized_matmul does (flatten leading
    dims to rank-3, block over the last two dims)."""
    shape = x.shape
    return _quantize_matmul_operand(
        x.reshape((-1,) + shape[-2:]), cfg, entry
    ).reshape(shape)


def chunked_quantized_attention(
    q,
    k,
    v,
    mask,
    mm0_cfg: dict,
    mm1_cfg: dict,
    sqrt_hd: float,
    chunk: int = 512,
):
    """Drop-in replacement for the naive quantized attention pair.

    q: [b, h, S, d]; k, v: [b, h, K, d]; mask: additive [b, 1, S, K] or None.
    Returns [b, h, S, d]. ``chunk`` must be a multiple of 16 (the block size
    every shipped config uses on the kv axis).
    """
    b, h, S, d = q.shape
    K = k.shape[2]
    chunk = min(chunk, K)
    assert chunk % 16 == 0 or chunk == K, "chunk must preserve block tiling"

    pad = (-K) % chunk
    if pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        if mask is None:
            mask = jnp.zeros((b, 1, S, K), dtype=q.dtype)
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, 0), (0, pad)),
                       constant_values=NEG_INF)
    Kp = K + pad
    nc = Kp // chunk

    # operand quantization that is chunk-independent:
    qq = q if mm0_cfg.get("bypass", False) else _q4(q, mm0_cfg, "data_in")
    if not mm1_cfg.get("bypass", False):
        if mm1_cfg["name"] != "block_log" or BLOCK_LOG_MATMUL_QUANTIZES_Y:
            v = _q4(v, mm1_cfg, "weight")  # [1,16] blocks along d, per row

    k_chunks = k.reshape(b, h, nc, chunk, d).transpose(2, 0, 1, 3, 4)
    v_chunks = v.reshape(b, h, nc, chunk, d).transpose(2, 0, 1, 3, 4)
    if mask is not None:
        mask_chunks = mask.reshape(b, 1, S, nc, chunk).transpose(3, 0, 1, 2, 4)
    else:
        mask_chunks = jnp.zeros((nc, 1, 1, 1, 1), dtype=q.dtype)

    score_fn = partial(_chunk_scores, mm0_cfg=mm0_cfg, sqrt_hd=sqrt_hd)

    # pass 1: exact row max + online sum of exp(s - m)
    def pass1(carry, xs):
        m, l = carry
        k_c, mask_c = xs
        s = score_fn(qq, k_c, mask_c if mask is not None else None)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        l = l * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(s - m_new[..., None]), axis=-1
        )
        return (m_new, l), None

    m0 = jnp.full((b, h, S), -jnp.inf, dtype=jnp.float32)
    l0 = jnp.zeros((b, h, S), dtype=jnp.float32)
    (m, l), _ = jax.lax.scan(pass1, (m0, l0), (k_chunks, mask_chunks))

    # pass 2: exact normalized probs per chunk -> quantize -> accumulate @ v
    def pass2(ctx, xs):
        k_c, v_c, mask_c = xs
        s = score_fn(qq, k_c, mask_c if mask is not None else None)
        p = (jnp.exp(s - m[..., None]) / l[..., None]).astype(q.dtype)
        if not mm1_cfg.get("bypass", False):
            p = _q4(p, mm1_cfg, "data_in")  # [1,16] blocks along kv
        return ctx + jnp.matmul(p, v_c), None

    ctx0 = jnp.zeros((b, h, S, d), dtype=q.dtype)
    ctx, _ = jax.lax.scan(pass2, ctx0, (k_chunks, v_chunks, mask_chunks))
    return ctx
