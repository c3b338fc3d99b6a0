"""Base-2 logarithmic fake quantizer.

Reference: src/llm_mixed_q/models/quantize/quantizers/log.py:22-88.
x -> sign * 2^clamp(round(log2|x|), -bias, 2^(w-1)-1-bias). Cannot represent
0: ``min_pos * 0.1`` is added to |x| before the log (reference log.py:55-57).
``exponent_bias`` may be a broadcastable array (block_log shares a bias per
block, reference block_log.py:55-60).
"""

from __future__ import annotations

import jax.numpy as jnp

from .exact import exact_exp2
from .ste import ste


def _log_qdq(x, width: int, exponent_bias=None):
    exponent_bits = width - 1
    if exponent_bias in (None, "none", "None"):
        exponent_bias = 2 ** (exponent_bits - 1) - 1
    exponent_bias = jnp.asarray(exponent_bias, dtype=jnp.float32)

    exponent_max = 2**exponent_bits - 1 - exponent_bias
    exponent_min = -exponent_bias
    min_pos = exact_exp2(exponent_min)

    sign = jnp.sign(x + min_pos * 0.1)
    value = jnp.abs(x) + min_pos * 0.1

    exponent = jnp.clip(jnp.round(jnp.log2(value)), exponent_min, exponent_max)
    return sign * exact_exp2(exponent)


log_quantizer = ste(_log_qdq)
