"""Native (C++) BFP pack engine parity vs the JAX pack.

The native tier exists for host-side per-trial repacking in search
(SURVEY.md §7 "hard parts": the reference reloads a full checkpoint per
trial, search.py:145-176; we repack in place). Its output must be
bit-identical to ``kernels/packing.py``.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from llm_mixed_q_tpu.kernels import pack_block_fp, pack_block_fp_subbyte
from llm_mixed_q_tpu.native import (
    native_available,
    native_pack_int8,
    native_pack_subbyte,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no native toolchain"
)

RNG = np.random.default_rng(7)


def _w(shape, scale=0.05):
    w = RNG.standard_normal(shape).astype(np.float32) * scale
    w.reshape(-1)[::41] = 0.0
    # a fully-zero block to exercise the zero-block fix
    w[0, :16] = 0.0
    return w


@pytest.mark.parametrize("shape", [(32, 64), (16, 48), (64, 256)])
@pytest.mark.parametrize("width", [4, 6, 8])
def test_native_int8_matches_jax(shape, width):
    w = _w(shape)
    codes, scales = native_pack_int8(w, width, 8, None, 16)
    ref = pack_block_fp(jnp.asarray(w), width, 8, None, [1, 16])
    np.testing.assert_array_equal(codes, np.asarray(ref.codes))
    np.testing.assert_array_equal(scales, np.asarray(ref.scales))


@pytest.mark.parametrize("shape", [(16, 640), (8, 1280), (32, 700)])
@pytest.mark.parametrize("width", [3, 4, 6])
def test_native_subbyte_matches_jax(shape, width):
    w = _w(shape)
    words, scales = native_pack_subbyte(w, width, 8, None, 16)
    ref = pack_block_fp_subbyte(jnp.asarray(w), width, 8, None, [1, 16])
    np.testing.assert_array_equal(words, np.asarray(ref.words))
    np.testing.assert_array_equal(scales, np.asarray(ref.scales))


def test_native_extreme_values():
    w = np.zeros((8, 64), dtype=np.float32)
    w[0, 0] = 1e30  # saturating exponent
    w[1, 16] = 1e-40  # subnormal-range
    w[2, 32] = -3.75
    codes, scales = native_pack_int8(w, 6, 8, None, 16)
    ref = pack_block_fp(jnp.asarray(w), 6, 8, None, [1, 16])
    np.testing.assert_array_equal(codes, np.asarray(ref.codes))
    np.testing.assert_array_equal(scales, np.asarray(ref.scales))


def test_native_threaded_large():
    w = _w((512, 1280))
    words, scales = native_pack_subbyte(w, 6, 8, None, 16)
    ref = pack_block_fp_subbyte(jnp.asarray(w), 6, 8, None, [1, 16])
    np.testing.assert_array_equal(words, np.asarray(ref.words))
    np.testing.assert_array_equal(scales, np.asarray(ref.scales))


def test_native_int8_k_stride_matches_jax():
    w = _w((16, 700))
    codes, scales = native_pack_int8(w, 6, 8, None, 16, k_stride=1024)
    ref = pack_block_fp(jnp.asarray(w), 6, 8, None, [1, 16], k_stride=1024)
    assert codes.shape == (16, 1024)
    np.testing.assert_array_equal(codes, np.asarray(ref.codes))
    np.testing.assert_array_equal(scales, np.asarray(ref.scales))
