"""Prompting-task search variants (reference search.py:595-1101,
search_conditional.py:684-…): 2-trial runs on a tiny llama with synthetic
task examples and a toy tokenizer — artifact layout and Pareto plumbing."""

import numpy as np
import pytest

from llm_mixed_q_tpu.models.hf_loader import init_llama_params
from llm_mixed_q_tpu.models.llama import (
    LlamaQuantizedConfig,
    llama_for_causal_lm,
)
from llm_mixed_q_tpu.search import (
    SearchIntQuantisationForPromptingCLS,
    SearchQuantisationForPromptingCLS,
)

TINY = dict(
    vocab_size=96,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=2,
    max_position_embeddings=256,
)


class ToyTokenizer:
    def __call__(self, text, add_special_tokens=True):
        ids = [1] if add_special_tokens else []
        ids += [2 + (hash(w) % 90) for w in text.split()]
        return {"input_ids": ids}


def _examples(n=6):
    rng = np.random.default_rng(0)
    return [
        {"sentence": f"example sentence number {i} quality", "label": int(rng.integers(0, 2))}
        for i in range(n)
    ]


SEARCH_CONFIG = {
    "search_strategy": {
        "n_trials": 2,
        "n_jobs": 1,
        "sampler": "random",
        "seed": 0,
        "accuracy_threshold": 0,
        "avg_bitwidth_threshold": 0,
    },
    "search_estimator": {
        "alpha_accuracy": 1.0,
        "alpha_memory_density": 1.0,
        "alpha_fps": 0,
        "alpha_fps_per_lut": 0,
        "compare_to": 32,
    },
    "search_space": {
        "quant_config_seed": {
            "default": {
                "name": ["block_fp"],
                "bypass": [False],
                "weight_width": [4, 6],
                "weight_exponent_width": [8],
                "weight_exponent_bias": [127],
                "weight_block_size": ["!ast![1, 16]"],
                "data_in_width": [6],
                "data_in_exponent_width": [8],
                "data_in_exponent_bias": [127],
                "data_in_block_size": ["!ast![1, 16]"],
                "bias_width": [8],
                "bias_exponent_width": [8],
                "bias_exponent_bias": [127],
                "bias_block_size": ["!ast![16]"],
            }
        }
    },
}


def test_prompting_search_two_trials(tmp_path):
    config = LlamaQuantizedConfig(**TINY, quant_config=None)
    params = init_llama_params(config, task="lm", seed=0)
    search = SearchQuantisationForPromptingCLS(
        "llama",
        "tiny-local",
        SEARCH_CONFIG,
        tmp_path,
        params,
        ToyTokenizer(),
        model_config_kwargs=TINY,
    )
    assert search.task == "lm"
    examples = {"sst": _examples()}
    study = search.search_prompting(
        ["sst"], seq_len=32, limit=4, examples_by_task=examples
    )
    assert len(study.trials) == 2
    assert (tmp_path / "study.pkl").exists()
    assert (tmp_path / "results.csv").exists()
    res = search.evaluate_best_trials_prompting(
        study, ["sst"], limit=4, examples_by_task=examples
    )
    assert 0.0 <= res["mean_acc"] <= 1.0
    assert (tmp_path / "best_quant_config.toml").exists()


def test_conditional_prompting_search(tmp_path):
    from llm_mixed_q_tpu.datasets import make_synthetic_lm_dataset, numpy_dataloader
    from llm_mixed_q_tpu.stats import profile_statistics

    config = LlamaQuantizedConfig(**TINY, quant_config=None)
    params = init_llama_params(config, task="lm", seed=0)
    data = make_synthetic_lm_dataset(TINY["vocab_size"], 16, 2)
    stat_profile = profile_statistics(
        batches=list(numpy_dataloader(data, batch_size=2)),
        arch="llama",
        model_fn=llama_for_causal_lm,
        config=config,
        params=params,
    )
    int_search_config = {
        **SEARCH_CONFIG,
        "search_space": {
            "quant_config_seed": {
                "default": {
                    "name": ["integer"],
                    "bypass": [False],
                    "weight_width": [4, 8],
                    "data_in_width": [8],
                    "bias_width": [8],
                    "data_out_width": [8],
                }
            }
        },
    }
    search = SearchIntQuantisationForPromptingCLS(
        "llama",
        "tiny-local",
        int_search_config,
        tmp_path,
        params,
        ToyTokenizer(),
        stat_profile=stat_profile,
        model_config_kwargs=TINY,
    )
    examples = {"sst": _examples(4)}
    study = search.search_prompting(
        ["sst"], seq_len=16, limit=4, examples_by_task=examples
    )
    assert len(study.trials) == 2
    assert all(t.state == "COMPLETE" for t in study.trials)
