"""Packed BFP storage + fused dequant-matmul kernel tests.

SURVEY.md §4 item 3: the Pallas packed dequant-matmul must match the
pure-jnp fake-quant matmul (interpret mode on CPU).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llm_mixed_q_tpu.kernels import (
    PackedBFP,
    PackedBFPSub,
    bfp_matmul,
    pack_block_fp,
    pack_block_fp_subbyte,
    packed_nbytes,
    unpack_block_fp,
    unpack_block_fp_subbyte,
)
from llm_mixed_q_tpu.ops.quantizers.block_fp import _block_fp_qdq

RNG = np.random.default_rng(0)


def _w(shape, scale=0.05):
    w = RNG.standard_normal(shape).astype(np.float32) * scale
    w.reshape(-1)[:: 37] = 0.0  # exact zeros
    return w


@pytest.mark.parametrize("shape", [(32, 64), (16, 48), (8, 16)])
@pytest.mark.parametrize("width", [4, 6, 8])
def test_pack_unpack_matches_fake_quant(shape, width):
    w = _w(shape)
    packed = pack_block_fp(jnp.asarray(w), width, 8, None, block_size=[1, 16])
    deq = np.asarray(unpack_block_fp(packed))
    ref = np.asarray(
        _block_fp_qdq(jnp.asarray(w), width, 8, None, [1, 16], skip_first_dim=False)
    )
    # identical except the |x|<=1e-8 passthrough (documented deviation):
    tiny = np.abs(w) <= 1e-8
    np.testing.assert_allclose(deq[~tiny], ref[~tiny], rtol=0, atol=0)
    # passthrough elements land on (near-)zero grid points in packed storage
    assert np.all(np.abs(deq[tiny]) <= np.abs(ref[tiny]) + 1e-6)


def test_pack_padding_non_divisible():
    w = _w((8, 40))  # 40 not divisible by 16
    packed = pack_block_fp(jnp.asarray(w), 6, 8, None, block_size=[1, 16])
    assert packed.codes.shape == (8, 48)
    deq = np.asarray(unpack_block_fp(packed))
    assert deq.shape == (8, 40)
    ref = np.asarray(
        _block_fp_qdq(jnp.asarray(w), 6, 8, None, [1, 16], skip_first_dim=False)
    )
    tiny = np.abs(w) <= 1e-8
    np.testing.assert_allclose(deq[~tiny], ref[~tiny], rtol=0, atol=0)


def test_packed_nbytes_compression():
    w = _w((128, 256))
    packed = pack_block_fp(jnp.asarray(w), 6, 8, None, [1, 16])
    ratio = (w.size * 4) / packed_nbytes(packed)
    assert ratio > 3.0  # int8 codes + f32/16 scales ~ 3.2x vs fp32


def test_pytree_registration():
    w = _w((8, 32))
    packed = pack_block_fp(jnp.asarray(w), 6, 8, None, [1, 16])
    leaves = jax.tree_util.tree_leaves(packed)
    assert len(leaves) == 2
    mapped = jax.tree_util.tree_map(lambda x: x, packed)
    assert isinstance(mapped, PackedBFP)
    assert mapped.width == 6


@pytest.mark.parametrize("m,n,k", [(16, 32, 64), (8, 16, 32), (64, 128, 256)])
@pytest.mark.parametrize("width", [4, 6])
def test_pallas_kernel_matches_unpack_matmul(m, n, k, width):
    # activations arrive BFP-quantized in the real pipeline (data_in config),
    # so their values are exact in the kernel's bf16 cast
    x_raw = RNG.standard_normal((m, k)).astype(np.float32)
    x = np.asarray(
        _block_fp_qdq(jnp.asarray(x_raw), 6, 8, None, [1, 16], skip_first_dim=True)
    )
    w = _w((n, k))
    packed = pack_block_fp(jnp.asarray(w), width, 8, None, [1, 16])
    # oracle: unpack + f32 matmul
    ref = x @ np.asarray(unpack_block_fp(packed)).T
    out = bfp_matmul(jnp.asarray(x), packed, use_pallas=True, interpret=True)
    # bf16 operands are exact for quantized values; only f32 accumulation
    # order differs from the oracle
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


# ----------------------------------------------------------- sub-byte packed


@pytest.mark.parametrize("width", [3, 4, 6])
@pytest.mark.parametrize("k", [640, 1280, 700])  # 700: padding path
def test_subbyte_pack_unpack_matches_int8_pack(width, k):
    w = _w((16, k))
    sub = pack_block_fp_subbyte(jnp.asarray(w), width, 8, None, [1, 16])
    full = pack_block_fp(jnp.asarray(w), width, 8, None, [1, 16])
    np.testing.assert_array_equal(
        np.asarray(unpack_block_fp_subbyte(sub)),
        np.asarray(unpack_block_fp(full))[:, :k],
    )


def test_subbyte_density():
    w = _w((256, 5120))  # divisible by both the 6-bit (640) and 4-bit (1024) tiles
    sub = pack_block_fp_subbyte(jnp.asarray(w), 6, 8, None, [1, 16])
    bits_per_elem = packed_nbytes(sub) * 8 / w.size
    assert bits_per_elem < 8.5  # 6.4 code bits + 2 scale bits
    sub4 = pack_block_fp_subbyte(jnp.asarray(w), 4, 8, None, [1, 16])
    assert packed_nbytes(sub4) * 8 / w.size < 6.1  # 4.0 + 2


def test_subbyte_pytree():
    w = _w((8, 640))
    sub = pack_block_fp_subbyte(jnp.asarray(w), 6, 8, None, [1, 16])
    mapped = jax.tree_util.tree_map(lambda x: x, sub)
    assert isinstance(mapped, PackedBFPSub)
    assert mapped.per_word == 5 and mapped.tile == 640


@pytest.mark.parametrize("m,n,k", [(16, 32, 640), (8, 256, 1344)])
@pytest.mark.parametrize("width", [4, 6])
def test_subbyte_kernel_matches_unpack_matmul(m, n, k, width):
    x_raw = RNG.standard_normal((m, k)).astype(np.float32)
    x = np.asarray(
        _block_fp_qdq(jnp.asarray(x_raw), 6, 8, None, [1, 16], skip_first_dim=True)
    )
    w = _w((n, k))
    sub = pack_block_fp_subbyte(jnp.asarray(w), width, 8, None, [1, 16])
    ref = x @ np.asarray(unpack_block_fp_subbyte(sub)).T
    out = bfp_matmul(jnp.asarray(x), sub, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_subbyte_fallback_matches_kernel_path():
    x_raw = RNG.standard_normal((2, 5, 640)).astype(np.float32)
    # BFP-quantize x (as the real pipeline does) so its bf16 cast is exact
    x = np.asarray(
        _block_fp_qdq(
            jnp.asarray(x_raw.reshape(10, 640)), 6, 8, None, [1, 16],
            skip_first_dim=True,
        )
    ).reshape(2, 5, 640)
    w = _w((48, 640))
    sub = pack_block_fp_subbyte(jnp.asarray(w), 6, 8, None, [1, 16])
    fb = bfp_matmul(jnp.asarray(x), sub, use_pallas=False)
    kn = bfp_matmul(jnp.asarray(x), sub, use_pallas=True, interpret=True)
    assert fb.shape == (2, 5, 48)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(kn), rtol=2e-3, atol=2e-3)


def test_fallback_matches_kernel_path():
    x = RNG.standard_normal((4, 3, 32)).astype(np.float32)  # leading dims
    w = _w((24, 32))
    packed = pack_block_fp(jnp.asarray(w), 6, 8, None, [1, 16])
    fb = bfp_matmul(jnp.asarray(x), packed, use_pallas=False)
    kn = bfp_matmul(jnp.asarray(x), packed, use_pallas=True, interpret=True)
    assert fb.shape == (4, 3, 24)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(kn), rtol=2e-3, atol=2e-3)


# ------------------------------------------- round 4: in-kernel activation
# quant + K-stride padding


def _actq_cfg(bs=16):
    return {
        "name": "block_fp",
        "bypass": False,
        "data_in_width": 6,
        "data_in_exponent_width": 8,
        "data_in_exponent_bias": None,
        "data_in_block_size": [1, bs],
    }


@pytest.mark.parametrize("fmt", ["int8", "sub"])
def test_in_kernel_actq_matches_external_quantize(fmt):
    """actq folded into the kernel prologue == quantizing x upstream with
    the reference XLA expression (VERDICT r3 #1)."""
    from llm_mixed_q_tpu.kernels.dequant_matmul import actq_spec

    k = 1280
    x_raw = RNG.standard_normal((8, k)).astype(np.float32)
    x_raw.reshape(-1)[::53] = 0.0
    w = _w((32, k))
    if fmt == "sub":
        packed = pack_block_fp_subbyte(jnp.asarray(w), 6, 8, None, [1, 16])
    else:
        packed = pack_block_fp(jnp.asarray(w), 6, 8, None, [1, 16])
    spec = actq_spec(_actq_cfg())
    assert spec == (16, 6, 8, None)
    fused = bfp_matmul(
        jnp.asarray(x_raw), packed, use_pallas=True, interpret=True,
        actq=spec,
    )
    xq = _block_fp_qdq(jnp.asarray(x_raw), 6, 8, None, [1, 16],
                       skip_first_dim=True)
    ref = bfp_matmul(xq, packed, use_pallas=True, interpret=True)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=1e-6, atol=1e-6
    )


def test_actq_spec_rejects_non_kernel_configs():
    from llm_mixed_q_tpu.kernels.dequant_matmul import actq_spec

    assert actq_spec(None) is None
    assert actq_spec({**_actq_cfg(), "bypass": True}) is None
    assert actq_spec({**_actq_cfg(), "name": "integer"}) is None
    # 2-D act tile and non-lane-dividing block fall back
    assert actq_spec({**_actq_cfg(), "data_in_block_size": [4, 16]}) is None
    assert actq_spec({**_actq_cfg(), "data_in_block_size": [1, 48]}) is None
    assert actq_spec({**_actq_cfg(), "data_in_block_size": [1, -1]}) is None


def test_actq_fallback_path_applies_quantizer():
    """Non-Pallas dispatch with actq= must quantize x itself (callers pass
    actq INSTEAD of pre-quantizing)."""
    from llm_mixed_q_tpu.kernels.dequant_matmul import actq_spec

    x = RNG.standard_normal((4, 64)).astype(np.float32)
    w = _w((24, 64))
    packed = pack_block_fp(jnp.asarray(w), 6, 8, None, [1, 16])
    spec = actq_spec(_actq_cfg())
    fb = bfp_matmul(jnp.asarray(x), packed, use_pallas=False, actq=spec)
    xq = _block_fp_qdq(jnp.asarray(x), 6, 8, None, [1, 16],
                       skip_first_dim=True)
    ref = bfp_matmul(xq, packed, use_pallas=False)
    np.testing.assert_allclose(np.asarray(fb), np.asarray(ref), rtol=1e-6,
                               atol=1e-6)


@pytest.mark.parametrize("k", [700, 11008 // 8])
def test_k_stride_pack_matches_unstrided(k):
    """Stride-padded packing (kernel K-tile alignment) changes only the
    padded tail: unpack and matmul results are identical."""
    w = _w((16, k))
    base = pack_block_fp(jnp.asarray(w), 6, 8, None, [1, 16])
    strided = pack_block_fp(jnp.asarray(w), 6, 8, None, [1, 16],
                            k_stride=1024)
    assert strided.codes.shape[1] % 1024 == 0
    assert strided.in_features == k
    np.testing.assert_array_equal(
        np.asarray(unpack_block_fp(strided)), np.asarray(unpack_block_fp(base))
    )
    x = RNG.standard_normal((8, k)).astype(np.float32)
    y_b = bfp_matmul(jnp.asarray(x), base, use_pallas=True, interpret=True)
    y_s = bfp_matmul(jnp.asarray(x), strided, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_b), rtol=1e-5,
                               atol=1e-5)


# ------------------------------------------------- transposed sub-byte (r5)


def test_subbyte_t_pack_unpack_matches_lane_major():
    from llm_mixed_q_tpu.kernels.packing import (
        PackedBFPSubT,
        pack_block_fp_subbyte_t,
        unpack_block_fp_subbyte_t,
    )

    w = _w((48, 1280))
    sub = pack_block_fp_subbyte(jnp.asarray(w), 6, 8, None, [1, 16])
    subt = pack_block_fp_subbyte_t(jnp.asarray(w), 6, 8, None, [1, 16])
    assert isinstance(subt, PackedBFPSubT)
    assert subt.words.shape == (sub.words.shape[1], sub.words.shape[0])
    np.testing.assert_array_equal(
        np.asarray(unpack_block_fp_subbyte(sub)),
        np.asarray(unpack_block_fp_subbyte_t(subt)),
    )
    # pytree round trip keeps the type and aux
    mapped = jax.tree_util.tree_map(lambda x: x, subt)
    assert isinstance(mapped, PackedBFPSubT)
    assert mapped.tile == 640


@pytest.mark.parametrize("m,n,k", [(8, 256, 1344), (16, 48, 640)])
@pytest.mark.parametrize("width", [4, 6])
def test_subbyte_t_kernel_matches_unpack_matmul(m, n, k, width):
    from llm_mixed_q_tpu.kernels.packing import (
        pack_block_fp_subbyte_t,
        unpack_block_fp_subbyte_t,
    )

    x_raw = RNG.standard_normal((m, k)).astype(np.float32)
    x = np.asarray(
        _block_fp_qdq(jnp.asarray(x_raw), 6, 8, None, [1, 16],
                      skip_first_dim=True)
    )
    w = _w((n, k))
    subt = pack_block_fp_subbyte_t(jnp.asarray(w), width, 8, None, [1, 16])
    ref = x @ np.asarray(unpack_block_fp_subbyte_t(subt)).T
    out = bfp_matmul(jnp.asarray(x), subt, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
    fb = bfp_matmul(jnp.asarray(x), subt, use_pallas=False)
    np.testing.assert_allclose(np.asarray(fb), ref, rtol=1e-5, atol=1e-5)


def test_subbyte_t_in_kernel_actq_matches_external():
    from llm_mixed_q_tpu.kernels.packing import (
        pack_block_fp_subbyte_t,
        unpack_block_fp_subbyte_t,
    )

    x = jnp.asarray(RNG.standard_normal((8, 1280)).astype(np.float32))
    w = _w((64, 1280))
    subt = pack_block_fp_subbyte_t(jnp.asarray(w), 6, 8, None, [1, 16])
    xq = _block_fp_qdq(x, 6, 8, None, [1, 16], skip_first_dim=True)
    ref = np.asarray(xq) @ np.asarray(unpack_block_fp_subbyte_t(subt)).T
    out = bfp_matmul(x, subt, use_pallas=True, interpret=True,
                     actq=(16, 6, 8, None))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
