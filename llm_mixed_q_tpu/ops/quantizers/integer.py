"""Symmetric fixed-point (integer) fake quantizer.

Reference: src/llm_mixed_q/models/quantize/quantizers/integer.py:25-105.
qdq(x) = clamp(round(x * 2^frac_width), int_min, int_max) / 2^frac_width with
signed range [-2^(w-1), 2^(w-1)-1]. Round is half-to-even in both torch and
jnp, so the forward is bit-exact vs the reference. Backward: STE.
"""

from __future__ import annotations

from math import log2

import jax.numpy as jnp

from .ste import ste


def _integer_qdq(x, width: int, frac_width: int, is_signed: bool = True):
    if is_signed:
        int_min = -(2 ** (width - 1))
        int_max = 2 ** (width - 1) - 1
    else:
        int_min = 0
        int_max = 2**width - 1
    scale = float(2**frac_width)
    return jnp.clip(jnp.round(x * scale), int_min, int_max) / scale


integer_quantizer = ste(_integer_qdq)


def integer_fraction(
    width: int, frac_choices: list, min_value: float, max_value: float
) -> int:
    """Pick the largest legal frac_width for a value range.

    Reference integer.py:98-105 (used by the stat-profile -> int-config
    transform).
    """
    max_half_range = max(abs(min_value), abs(max_value))
    int_width = int(log2(max(0.5, max_half_range))) + 2
    frac_width = max(0, width - int_width)
    frac_width = max(filter(lambda x: x <= frac_width, frac_choices))
    return frac_width
