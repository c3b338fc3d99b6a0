"""Minifloat fake quantizers (denorm & IEEE-like variants).

Reference: src/llm_mixed_q/models/quantize/quantizers/minifloat.py:21-239.

- denorm: mantissa has NO implicit leading bit; exponent = ceil(log2|x|)
  clamped, mantissa in [0, 1). Saturates; no inf/NaN.
- ieee: implicit leading bit + subnormals; exponent = floor(log2|x|) clamped;
  normal mantissa 1 + m/2^mb, subnormal m/2^mb * 2.

``exponent_bias`` may be a broadcastable array — that is how
block_minifloat reuses the ieee core with a per-block shared bias
(reference block_minifloat.py:57-65).

The elementwise math (epsilons ``+1e-9``, isclose thresholds, half-to-even
rounding) matches the reference bit-for-bit in fp32.
"""

from __future__ import annotations

import jax.numpy as jnp

from .exact import exact_exp2
from .ste import ste

# torch.isclose(x, 0) defaults: |x| <= atol + rtol*|0| = 1e-8
_ATOL = 1e-8
_RTOL = 1e-5


def _default_bias(exponent_width: int, exponent_bias):
    if exponent_bias in (None, "none", "None"):
        return 2 ** (exponent_width - 1) - 1
    return exponent_bias


def _minifloat_denorm_qdq(x, width: int, exponent_width: int, exponent_bias=None):
    mantissa_bits = width - exponent_width - 1
    exponent_bias = _default_bias(exponent_width, exponent_bias)

    exponent_max = 2**exponent_width - 1 - exponent_bias
    exponent_min = -exponent_bias
    shifted_mantissa_max = 2**mantissa_bits - 1

    sign = jnp.sign(x + 1e-9)
    value = jnp.abs(x)
    exponent = jnp.clip(jnp.ceil(jnp.log2(value + 1e-9)), exponent_min, exponent_max)

    two_e = exact_exp2(exponent)
    mantissa = value / two_e
    shift = 2**mantissa_bits
    shifted_mantissa = jnp.clip(jnp.round(mantissa * shift), 0, shifted_mantissa_max)
    mantissa = shifted_mantissa / shift

    is_close_to_0 = value <= _ATOL
    return jnp.where(is_close_to_0, x, sign * two_e * mantissa)


def _minifloat_ieee_qdq(x, width: int, exponent_width: int, exponent_bias=None):
    mantissa_bits = width - exponent_width - 1
    exponent_bias = _default_bias(exponent_width, exponent_bias)
    exponent_bias = jnp.asarray(exponent_bias, dtype=jnp.float32)

    exponent_max = 2**exponent_width - 1 - exponent_bias
    exponent_min = -exponent_bias
    shift = 2**mantissa_bits
    shifted_mantissa_max = 2**mantissa_bits - 1

    sign = jnp.sign(x + 1e-9)
    value = jnp.abs(x)
    exponent = jnp.clip(jnp.floor(jnp.log2(value + 1e-9)), exponent_min, exponent_max)
    two_e = exact_exp2(exponent)
    mantissa = value / two_e

    # subnormal iff clipped exponent hit -bias (isclose, reference
    # minifloat.py:183-185)
    is_normal = jnp.abs(exponent - (-exponent_bias)) > (
        _ATOL + _RTOL * jnp.abs(exponent_bias)
    )

    sm_normal = jnp.clip(jnp.round(mantissa * shift - shift), 0, shifted_mantissa_max)
    sm_subnormal = jnp.clip(jnp.round(mantissa * shift / 2), 0, shifted_mantissa_max)
    shifted_mantissa = jnp.where(is_normal, sm_normal, sm_subnormal)
    mantissa = jnp.where(
        is_normal, 1.0 + shifted_mantissa / shift, shifted_mantissa / shift * 2
    )

    is_close_to_0 = value <= _ATOL
    return jnp.where(is_close_to_0, x, sign * two_e * mantissa)


minifloat_denorm_quantizer = ste(_minifloat_denorm_qdq)
minifloat_ieee_quantizer = ste(_minifloat_ieee_qdq)
