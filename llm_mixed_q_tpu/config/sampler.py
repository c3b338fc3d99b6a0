"""Categorical sampling over a dict-of-lists search space.

Reference: src/llm_mixed_q/models/quantize/quant_config_sampler.py:10-26.
Non-scalar choices (lists/None/bool) are encoded as '!ast!<literal>' strings
for TOML compatibility and decoded after sampling.
"""

from __future__ import annotations

import ast
from copy import deepcopy


def decode_ast_value(v):
    """'!ast!<literal>' -> literal (reference quant_config_sampler.py:13-14)."""
    if isinstance(v, str) and v.startswith("!ast!"):
        return ast.literal_eval(v.removeprefix("!ast!"))
    return v


def sample_a_list(trial, name: str, choices: list):
    assert isinstance(choices, list), f"choices must be a list, got {choices}"
    sampled = trial.suggest_categorical(name, deepcopy(choices))
    return decode_ast_value(sampled)


def sample_a_dict_of_list(trial, name: str, config: dict) -> dict:
    assert isinstance(config, dict), f"config must be a dict, got {config}"
    return {k: sample_a_list(trial, f"{name}:{k}", v) for k, v in config.items()}
