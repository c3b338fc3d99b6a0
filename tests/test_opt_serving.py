"""OPT serving stack: fixed-cache ragged generation must match the
reference-semantics full-forward path token for token, and greedy_until
must produce identical text through the KV-cached generate_fn.
(VERDICT r2 weak #6: OPT had no serving path; greedy prompting re-forwarded
O(n^2).)"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent))

from llm_mixed_q_tpu.models.hf_loader import init_opt_params
from llm_mixed_q_tpu.models.opt import OPTQuantizedConfig, opt_for_causal_lm
from llm_mixed_q_tpu.models.opt.serving import generate, generate_greedy

BFP6 = {
    "name": "block_fp",
    "is_ptq": True,
    "bypass": False,
    "weight_width": 6,
    "weight_exponent_width": 8,
    "weight_exponent_bias": None,
    "weight_block_size": [1, 16],
    "data_in_width": 6,
    "data_in_exponent_width": 8,
    "data_in_exponent_bias": None,
    "data_in_block_size": [1, 16],
    "bias_width": 6,
    "bias_exponent_width": 8,
    "bias_exponent_bias": None,
    "bias_block_size": [1, 16],
}

TINY = dict(
    vocab_size=96,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    ffn_dim=64,
    max_position_embeddings=128,
    word_embed_proj_dim=32,
)


@pytest.fixture(scope="module")
def setup():
    config = OPTQuantizedConfig(**TINY, quant_config={"default": BFP6})
    params = init_opt_params(config, task="lm", seed=0)
    return config, params


def _full_forward_greedy(params, config, prompt, n):
    """Oracle: grow the sequence, full forward each step (reference
    execution model, modeling_opt.py:143-352)."""
    ids = list(int(t) for t in prompt)
    out = []
    for _ in range(n):
        arr = jnp.asarray([ids], dtype=jnp.int32)
        logits = opt_for_causal_lm(
            params, arr, jnp.ones_like(arr), config=config,
            quantize_weights=True,
        )["logits"]
        nxt = int(np.argmax(np.asarray(logits)[0, -1]))
        out.append(nxt)
        ids.append(nxt)
    return out


def test_opt_generate_matches_full_forward(setup):
    config, params = setup
    rng = np.random.default_rng(0)
    prompt = rng.integers(2, 96, size=6)
    ref = _full_forward_greedy(params, config, prompt, 5)
    got = generate_greedy(params, config, prompt[None, :], max_new_tokens=5,
                          max_len=32)
    np.testing.assert_array_equal(got[0], ref)


def test_opt_generate_ragged_matches_unbatched(setup):
    config, params = setup
    rng = np.random.default_rng(1)
    prompts = [rng.integers(2, 96, size=L) for L in (4, 9, 6)]
    pad = max(len(p) for p in prompts)
    ids = np.zeros((len(prompts), pad), np.int32)
    mask = np.zeros((len(prompts), pad), np.int32)
    for i, p in enumerate(prompts):
        ids[i, : len(p)] = p
        mask[i, : len(p)] = 1
    batched = generate_greedy(params, config, ids, mask, max_new_tokens=4,
                              max_len=32)
    for i, p in enumerate(prompts):
        solo = generate_greedy(params, config, p[None, :], max_new_tokens=4,
                               max_len=32)
        np.testing.assert_array_equal(
            batched[i], solo[0], err_msg=f"row {i} diverged"
        )


def test_opt_generate_eos_stops(setup):
    config, params = setup
    rng = np.random.default_rng(2)
    p = rng.integers(2, 96, size=5)
    ref = generate_greedy(params, config, p[None, :], max_new_tokens=6,
                          max_len=32)[0]
    eos = int(ref[2])
    got = generate(params, config, p[None, :], max_new_tokens=6, max_len=32,
                   eos_token_id=eos)
    np.testing.assert_array_equal(got[0][:3], ref[:3])
    assert (got[0][3:] == eos).all()


class _IdTok:
    """Tokenizer stub: text is a space-joined id list."""

    def __call__(self, text, add_special_tokens=True):
        ids = [int(t) for t in text.split()] if text.strip() else []
        return {"input_ids": ids}

    def decode(self, ids):
        return " ".join(str(int(t)) for t in ids)


def test_greedy_until_serving_matches_fallback(setup):
    from llm_mixed_q_tpu.eval.prompting import (
        greedy_until,
        make_serving_generate_fn,
    )
    from llm_mixed_q_tpu.models.api import make_forward

    config, params = setup
    tok = _IdTok()
    rng = np.random.default_rng(3)
    contexts = [" ".join(str(t) for t in rng.integers(2, 96, size=L))
                for L in (5, 8)]
    fwd = make_forward("opt", "lm", config, quantize_weights=True)
    slow = greedy_until(fwd, params, tok, contexts, max_gen_tokens=4,
                        stop="")
    gen_fn = make_serving_generate_fn("opt", config, params)
    fast = greedy_until(fwd, params, tok, contexts, max_gen_tokens=4,
                        stop="", generate_fn=gen_fn)
    assert fast == slow
