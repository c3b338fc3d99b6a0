"""Quantized op functions: entry-quantizer factory, matmul/bmm, RoPE.

Reference: src/llm_mixed_q/models/quantize/quantized_functions/{matmul,
rotary_positional_encoding}.py and quantized_modules/linear.py:113-307.

Deliberate deviations from reference quirks (SURVEY.md §2.2):
- reference ``LinearLog`` passes a bogus ``exponent_width=`` kwarg into
  ``log_quantizer`` (linear.py:234-245) and crashes; here log-linear works.
- reference maps arith "log" matmul onto the *block_log* matmul
  (quantized_functions/__init__.py:20,29), which then KeyErrors on the parsed
  log config; here "log" matmul is a working plain-log matmul.
- reference ``generic_matmul_block_log`` builds but never applies the y
  quantizer (matmul.py:293-297). We REPRODUCE that (block_log matmuls
  quantize only x) for eval parity; set
  ``BLOCK_LOG_MATMUL_QUANTIZES_Y = True`` to fix it.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp

from .quantizers import (
    block_fp_quantizer,
    block_log_quantizer,
    block_minifloat_quantizer,
    integer_quantizer,
    log_quantizer,
    minifloat_denorm_quantizer,
    minifloat_ieee_quantizer,
)

BLOCK_LOG_MATMUL_QUANTIZES_Y = False

BLOCK_ARITHS = ("block_fp", "block_minifloat", "block_log")


def make_entry_quantizer(config: dict, entry: str, skip_first_dim: bool = False):
    """Bind a quantizer to one entry's keys (entry in weight/data_in/bias).

    Mirrors the per-arith ``_setup_quantizers`` of the 7 Linear subclasses
    (reference quantized_modules/linear.py:113-307): activations use
    skip_first_dim=True, weights/bias False.
    """
    name = config["name"]
    g = lambda k: config[f"{entry}_{k}"]
    if name == "integer":
        return partial(integer_quantizer, width=g("width"), frac_width=g("frac_width"))
    if name == "minifloat_denorm":
        return partial(
            minifloat_denorm_quantizer,
            width=g("width"),
            exponent_width=g("exponent_width"),
            exponent_bias=g("exponent_bias"),
        )
    if name == "minifloat_ieee":
        return partial(
            minifloat_ieee_quantizer,
            width=g("width"),
            exponent_width=g("exponent_width"),
            exponent_bias=g("exponent_bias"),
        )
    if name == "log":
        return partial(log_quantizer, width=g("width"), exponent_bias=g("exponent_bias"))
    if name == "block_fp":
        return partial(
            block_fp_quantizer,
            width=g("width"),
            exponent_width=g("exponent_width"),
            exponent_bias=g("exponent_bias"),
            block_size=g("block_size"),
            skip_first_dim=skip_first_dim,
        )
    if name == "block_minifloat":
        return partial(
            block_minifloat_quantizer,
            width=g("width"),
            exponent_width=g("exponent_width"),
            exponent_bias_width=g("exponent_bias_width"),
            block_size=g("block_size"),
            skip_first_dim=skip_first_dim,
        )
    if name == "block_log":
        return partial(
            block_log_quantizer,
            width=g("width"),
            exponent_bias_width=g("exponent_bias_width"),
            block_size=g("block_size"),
            skip_first_dim=skip_first_dim,
        )
    raise ValueError(f"Unknown quant arith: {name}")


def _quantize_matmul_operand(x, config: dict, entry: str):
    """Quantize one matmul operand.

    Block ariths flatten leading dims to rank-3 and block over the last two
    dims (reference matmul.py:183-196 "hack"); elementwise ariths apply
    directly. The flatten+reshape round-trip is shape bookkeeping only — the
    values come back in place.
    """
    name = config["name"]
    if name in BLOCK_ARITHS:
        more_than_2 = x.ndim > 2
        q = make_entry_quantizer(config, entry, skip_first_dim=more_than_2)
        if more_than_2:
            shape = x.shape
            xq = q(x.reshape((-1,) + shape[-2:]))
            return xq.reshape(shape)
        return q(x)
    return make_entry_quantizer(config, entry)(x)


def quantized_matmul(x, y, config: dict, style: str = "matmul"):
    """q(x) @ q(y) — x uses data_in_* keys, y uses weight_* keys.

    Reference matmul.py:28-353. ``style`` ("matmul"|"bmm") only affects rank
    expectations; jnp.matmul covers both torch.matmul and torch.bmm.
    """
    if config.get("bypass", False):
        return jnp.matmul(x, y)
    x = _quantize_matmul_operand(x, config, "data_in")
    if config["name"] != "block_log" or BLOCK_LOG_MATMUL_QUANTIZES_Y:
        y = _quantize_matmul_operand(y, config, "weight")
    return jnp.matmul(x, y)


def quantized_bmm(x, y, config: dict):
    return quantized_matmul(x, y, config, style="bmm")


def _rotate_half(x):
    x1 = x[..., : x.shape[-1] // 2]
    x2 = x[..., x.shape[-1] // 2 :]
    return jnp.concatenate([-x2, x1], axis=-1)


def quantized_apply_rotary_pos_emb(q, k, cos, sin, position_ids, config: dict):
    """RoPE with quantized cos/sin tables.

    Reference rotary_positional_encoding.py:59-248: only the tables are
    quantized (2-D weight-style blocks, skip_first_dim=False); the rotation
    itself stays full precision. ``cos``/``sin`` are [seq_len, dim];
    ``position_ids`` is [batch, seq].
    """
    if not config.get("bypass", False):
        name = config["name"]
        if name in BLOCK_ARITHS:
            quantizer = make_entry_quantizer(config, "data_in", skip_first_dim=False)
        else:
            quantizer = make_entry_quantizer(config, "data_in")
        cos = quantizer(cos)
        sin = quantizer(sin)
    cos = cos[position_ids][:, None, :, :]  # [bs, 1, seq, dim]
    sin = sin[position_ids][:, None, :, :]
    q_embed = (q * cos) + (_rotate_half(q) * sin)
    k_embed = (k * cos) + (_rotate_half(k) * sin)
    return q_embed, k_embed
