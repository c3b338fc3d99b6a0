"""Ragged-batch generation + sampling + EOS + continuous batching
(VERDICT.md Next #7): a right-padded ragged batch must match per-sequence
unbatched generation token-for-token, EOS must stop sequences, and the
slot-based ContinuousBatcher must reproduce offline greedy outputs while
admitting more requests than it has slots."""

import numpy as np
import pytest

import jax.numpy as jnp

from llm_mixed_q_tpu.models.hf_loader import init_llama_params
from llm_mixed_q_tpu.models.llama import LlamaQuantizedConfig
from llm_mixed_q_tpu.models.llama.serving import (
    ContinuousBatcher,
    generate,
    generate_greedy,
)

TINY = dict(
    vocab_size=96,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    max_position_embeddings=128,
)

BFP6 = {
    "default": {
        "name": "block_fp",
        "bypass": False,
        "is_ptq": True,
        "bias_block_size": [16],
        "bias_exponent_bias": 127,
        "bias_exponent_width": 8,
        "bias_width": 6,
        "data_in_block_size": [1, 16],
        "data_in_exponent_bias": 127,
        "data_in_exponent_width": 8,
        "data_in_width": 6,
        "weight_block_size": [1, 16],
        "weight_exponent_bias": 127,
        "weight_exponent_width": 8,
        "weight_width": 6,
    },
    "rotary_positional_encoding": {
        "bypass": False,
        "name": "integer",
        "data_in_width": 8,
        "data_in_frac_width": 7,
    },
}


@pytest.fixture(scope="module")
def setup():
    config = LlamaQuantizedConfig(**TINY, quant_config=BFP6)
    params = init_llama_params(config, task="lm", seed=0)
    return config, params


def _ragged_prompts(lengths, pad_to, seed=0):
    rng = np.random.default_rng(seed)
    ids = np.zeros((len(lengths), pad_to), dtype=np.int32)
    mask = np.zeros((len(lengths), pad_to), dtype=np.int32)
    prompts = []
    for i, L in enumerate(lengths):
        p = rng.integers(2, 96, size=L)
        prompts.append(p)
        ids[i, :L] = p
        mask[i, :L] = 1
    return prompts, ids, mask


@pytest.mark.parametrize("packed_kv", [False, None])
def test_ragged_batch_matches_unbatched(setup, packed_kv):
    config, params = setup
    prompts, ids, mask = _ragged_prompts([5, 11, 16], pad_to=16)
    batched = generate(
        params, config, ids, mask, max_new_tokens=6, max_len=32,
        quantize_weights=True, packed_kv=packed_kv,
    )
    for i, p in enumerate(prompts):
        solo = generate(
            params, config, p[None, :], None, max_new_tokens=6, max_len=32,
            quantize_weights=True, packed_kv=packed_kv,
        )
        np.testing.assert_array_equal(
            batched[i], solo[0],
            err_msg=f"seq {i} (len {len(p)}) diverged from unbatched",
        )


def test_eos_stops_sequence(setup):
    config, params = setup
    prompts, ids, mask = _ragged_prompts([6, 9], pad_to=9, seed=1)
    free = generate(params, config, ids, mask, max_new_tokens=8, max_len=32)
    # pick the token the first sequence emits at step 2 as "EOS"
    eos = int(free[0, 2])
    out = generate(
        params, config, ids, mask, max_new_tokens=8, max_len=32,
        eos_token_id=eos,
    )
    row = out[0]
    hit = np.where(row == eos)[0]
    assert hit.size > 0
    # everything after the first EOS is EOS-padding
    assert (row[hit[0]:] == eos).all()


def test_sampling_is_seeded_and_varies(setup):
    config, params = setup
    _, ids, mask = _ragged_prompts([8, 8], pad_to=8, seed=2)
    a = generate(params, config, ids, mask, max_new_tokens=8,
                 temperature=1.0, top_k=8, seed=0)
    b = generate(params, config, ids, mask, max_new_tokens=8,
                 temperature=1.0, top_k=8, seed=0)
    c = generate(params, config, ids, mask, max_new_tokens=8,
                 temperature=1.0, top_k=8, seed=1)
    np.testing.assert_array_equal(a, b)  # deterministic per seed
    assert (a != c).any()  # different seed samples differently


def test_continuous_batcher_matches_offline(setup):
    config, params = setup
    rng = np.random.default_rng(3)
    prompts = [rng.integers(2, 96, size=L) for L in (4, 7, 10, 5)]
    # 2 slots, 4 requests: forces slot reuse / rolling admission
    srv = ContinuousBatcher(
        params, config, num_slots=2, max_len=48, max_new_tokens=5,
    )
    rids = [srv.submit(p) for p in prompts]
    done = srv.run()
    assert set(done) == set(rids)
    for rid, p in zip(rids, prompts):
        ref = generate_greedy(
            params, config, p[None, :], max_new_tokens=5, max_len=48
        )[0]
        np.testing.assert_array_equal(
            np.asarray(done[rid]), ref,
            err_msg=f"request {rid} diverged from offline greedy",
        )


def test_continuous_batcher_eos(setup):
    config, params = setup
    rng = np.random.default_rng(4)
    p = rng.integers(2, 96, size=6)
    ref = generate_greedy(params, config, p[None, :], max_new_tokens=8,
                          max_len=32)[0]
    eos = int(ref[3])
    srv = ContinuousBatcher(
        params, config, num_slots=1, max_len=32, max_new_tokens=8,
        eos_token_id=eos,
    )
    rid = srv.submit(p)
    done = srv.run()
    toks = done[rid]
    assert toks[-1] == eos and len(toks) <= 8
    np.testing.assert_array_equal(np.asarray(toks), ref[: len(toks)])


def test_continuous_batcher_packed_matches_fake(setup):
    """Packed-cache batching (VERDICT r2 weak #4) must reproduce the
    f32 fake-quant-cache batcher token-for-token (same quantized values,
    different storage)."""
    config, params = setup
    rng = np.random.default_rng(5)
    prompts = [rng.integers(2, 96, size=L) for L in (4, 9, 6)]
    outs = {}
    for packed in (True, False):
        srv = ContinuousBatcher(
            params, config, num_slots=2, max_len=48, max_new_tokens=5,
            packed_kv=packed,
        )
        rids = [srv.submit(p) for p in prompts]
        outs[packed] = [srv.run()[r] for r in rids]
    assert srv._spec is None  # packed_kv=False really used the f32 cache
    for a, b in zip(outs[True], outs[False]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
