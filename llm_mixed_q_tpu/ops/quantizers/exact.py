"""Exact power-of-two construction.

XLA lowers ``exp2``/``pow(2, e)`` to ``exp(e * ln2)``, which drifts by ulps
at large |e| (e.g. exp2(95) is off by ~1.7e-6 relative on CPU). The
reference's torch ``2**e`` IS exactly a power of two, as is the native C++
packer's ``std::exp2`` — so the JAX side must construct 2^e from bits to be
bit-compatible with both.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exact_exp2(e):
    """2.0**e for integer-valued float array ``e``, exact for all f32
    results: normals (e in [-126, 128] — 128 gives +inf like exp2),
    subnormals (e in [-149, -127]), and 0 below."""
    ei = jnp.clip(e.astype(jnp.int32), -150, 128)
    normal_bits = (ei + 127) << 23
    sub_bits = jnp.int32(1) << jnp.maximum(ei + 149, 0)
    bits = jnp.where(ei >= -126, normal_bits, sub_bits)
    val = jax.lax.bitcast_convert_type(bits, jnp.float32)
    return jnp.where(ei >= -149, val, jnp.float32(0))
