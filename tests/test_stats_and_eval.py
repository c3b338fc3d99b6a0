"""Stats reducers, tap-based profiling, eval loops (synthetic data)."""

import numpy as np
import pytest

import jax.numpy as jnp

from llm_mixed_q_tpu.datasets import (
    make_synthetic_cls_dataset,
    make_synthetic_lm_dataset,
    numpy_dataloader,
)
from llm_mixed_q_tpu.eval import eval_cls_glue, eval_lm_wikitext2
from llm_mixed_q_tpu.models.api import make_forward
from llm_mixed_q_tpu.models.hf_loader import init_llama_params
from llm_mixed_q_tpu.models.llama import (
    LlamaQuantizedConfig,
    llama_for_causal_lm,
)
from llm_mixed_q_tpu.stats import profile_statistics
from llm_mixed_q_tpu.stats.stats import (
    RangeMinMax,
    Record,
    ThresholdCount,
    VarianceOnline,
    VariancePrecise,
)

TINY = dict(
    vocab_size=96,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=2,
)


def test_variance_online_matches_precise():
    rng = np.random.default_rng(0)
    online = VarianceOnline(dims="all")
    precise = VariancePrecise(dims="all")
    for _ in range(5):
        s = rng.standard_normal((3, 7)).astype(np.float32) * 2 + 1
        online.update_a_sample(s)
        precise.update_a_sample(s)
    o, p = online.compute(), precise.compute()
    np.testing.assert_allclose(float(o["mean"]), float(p["mean"]), rtol=1e-4)
    np.testing.assert_allclose(
        float(o["variance"]), float(p["variance"]), rtol=0.05
    )


def test_range_min_max_and_threshold():
    r = RangeMinMax(dims="all", abs=True)
    t = ThresholdCount(threshold=2.0)
    data = np.array([[-3.0, 0.5], [1.0, 2.5]], dtype=np.float32)
    r.update_a_sample(data)
    t.update_a_sample(data)
    rc = r.compute()
    assert float(rc["max"]) == 3.0
    assert float(rc["min"]) == 0.5
    tc = t.compute()
    assert tc["num_outliers"] == 2  # |-3| and |2.5| exceed 2.0
    assert tc["total"] == 4


def test_record_concat():
    rec = Record()
    rec.update_a_sample(np.ones((2, 3), np.float32))
    rec.update_a_sample(np.zeros((1, 3), np.float32))
    out = rec.compute()
    assert out["data"].shape == (3, 3)
    assert out["count"] == 2


@pytest.fixture(scope="module")
def tiny_llama():
    config = LlamaQuantizedConfig(**TINY, quant_config=None)
    params = init_llama_params(config, task="lm", seed=0)
    return config, params


def test_profile_statistics_llama(tiny_llama):
    config, params = tiny_llama
    data = make_synthetic_lm_dataset(TINY["vocab_size"], 24, 4)
    batches = list(numpy_dataloader(data, batch_size=2))

    profile = profile_statistics(
        batches=batches, arch="llama",
        model_fn=llama_for_causal_lm, config=config, params=params,
    )
    key = "root:model_layer_0:self_attn:q_proj:data_in"
    assert key in profile
    assert "range_min_max" in profile[key]
    assert profile[key]["range_min_max"]["count"] > 1
    wkey = "root:model_layer_0:self_attn:q_proj:weight"
    assert "range_min_max" in profile[wkey]
    # q/k/v expose data_out, o_proj does not (reference profiler_llama.py:159-171)
    assert "root:model_layer_0:self_attn:q_proj:data_out" in profile
    assert "root:model_layer_0:self_attn:o_proj:data_out" not in profile
    # 2 layers * (3*3 + 4*2 + 3*2) entries
    assert len(profile) == 2 * (3 * 3 + 2 + 3 * 2)


def test_stat_profile_to_int_config_runs_forward(tiny_llama):
    config, params = tiny_llama
    data = make_synthetic_lm_dataset(TINY["vocab_size"], 16, 2)
    batches = list(numpy_dataloader(data, batch_size=2))

    profile = profile_statistics(
        batches=batches, arch="llama",
        model_fn=llama_for_causal_lm, config=config, params=params,
    )

    from llm_mixed_q_tpu.config import transform_stat_profile_to_int_quant_config
    from llm_mixed_q_tpu.models.llama import (
        format_stat_profiled_int_config_llama_quantized,
        parse_llama_quantized_config,
    )

    qc = transform_stat_profile_to_int_quant_config(
        profile, "range_min_max", width=8
    )
    qc = format_stat_profiled_int_config_llama_quantized(
        qc, TINY["num_hidden_layers"]
    )
    qc = parse_llama_quantized_config(qc, TINY["num_hidden_layers"], strict=False)
    q_config = LlamaQuantizedConfig(**TINY, quant_config=qc)
    fwd = make_forward("llama", "lm", q_config)
    out = fwd(params, jnp.asarray(data["input_ids"][:2]), None)
    assert np.isfinite(np.asarray(out["logits"])).all()


def test_eval_lm_synthetic(tiny_llama):
    config, params = tiny_llama
    data = make_synthetic_lm_dataset(TINY["vocab_size"], 24, 4)
    fwd = make_forward("llama", "lm", config, with_labels=True)
    results = eval_lm_wikitext2(
        fwd, params, numpy_dataloader(data, batch_size=2)
    )
    assert results["num_sequences"] == 4
    assert results["seq_len"] == 24
    # random model on random tokens: ppl near vocab size
    assert 10 < results["perplexity"] < 10000


def test_eval_cls_synthetic(tiny_llama):
    config, _ = tiny_llama
    cls_config = LlamaQuantizedConfig(**TINY, quant_config=None, pad_token_id=0)
    params = init_llama_params(cls_config, task="cls", seed=0)
    data = make_synthetic_cls_dataset(TINY["vocab_size"], 16, 8)
    fwd = make_forward("llama", "cls", cls_config)
    results = eval_cls_glue(
        fwd, params, "sst2", numpy_dataloader(data, batch_size=4), num_samples=6
    )
    assert 0.0 <= results["accuracy"] <= 1.0
