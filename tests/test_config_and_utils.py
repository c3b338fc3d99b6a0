"""Config system, TOML round-trip, dict tools, cost model, metrics tests."""

import numpy as np
import pytest

from llm_mixed_q_tpu.config import (
    parse_node_config,
    transform_stat_profile_to_int_quant_config,
)
from llm_mixed_q_tpu.config.stat_to_int import find_int_frac_width
from llm_mixed_q_tpu.costmodel import (
    profile_linear_layer,
    profile_matmul_layer,
    update_profile,
)
from llm_mixed_q_tpu.eval.metrics import compute_glue_metrics
from llm_mixed_q_tpu.models.llama import parse_llama_quantized_config
from llm_mixed_q_tpu.utils import (
    dumps_toml,
    expand_dict,
    flatten_dict,
    load_config,
    save_config,
)

BFP = {
    "name": "block_fp",
    "is_ptq": True,
    "bypass": False,
    "weight_width": 6,
    "weight_exponent_width": 8,
    "weight_exponent_bias": 127,
    "weight_block_size": [1, 16],
    "data_in_width": 6,
    "data_in_exponent_width": 8,
    "data_in_exponent_bias": 127,
    "data_in_block_size": [1, 16],
    "bias_width": 6,
    "bias_exponent_width": 8,
    "bias_exponent_bias": 127,
    "bias_block_size": [16],
}


def test_parse_node_config_linear():
    p = parse_node_config(BFP, "linear")
    assert p["name"] == "block_fp"
    assert p["is_ptq"] is True
    assert "bias_width" in p
    assert "data_out_width" not in p


def test_parse_node_config_matmul_drops_bias():
    p = parse_node_config(BFP, "matmul")
    assert "bias_width" not in p
    assert "weight_width" in p and "data_in_width" in p
    assert "is_ptq" not in p


def test_parse_node_config_bypass_shortcircuit():
    cfg = {"name": "integer", "bypass": True}
    assert parse_node_config(cfg, "linear") == cfg


def test_parse_node_config_strict_raises():
    with pytest.raises(KeyError):
        parse_node_config({"name": "integer", "weight_width": 8}, "linear")
    # non-strict tolerates missing keys
    p = parse_node_config({"name": "integer", "weight_width": 8}, "linear", strict=False)
    assert p["weight_width"] == 8


def test_llama_config_precedence(tmp_path):
    config = {
        "default": dict(BFP),
        "model_layer_1": {
            "self_attn": {
                "q_proj": {**BFP, "weight_width": 4},
                "k_proj": dict(BFP),
                "v_proj": dict(BFP),
                "o_proj": dict(BFP),
                "rotary_positional_encoding": {
                    "name": "integer",
                    "data_in_width": 8,
                    "data_in_frac_width": 7,
                },
                "matmul_0": dict(BFP),
                "matmul_1": dict(BFP),
            },
            "mlp": {
                "gate_proj": dict(BFP),
                "down_proj": dict(BFP),
                "up_proj": dict(BFP),
            },
        },
    }
    parsed = parse_llama_quantized_config(config, num_hidden_layers=3)
    assert parsed["model_layer_0"]["self_attn"]["q_proj"]["weight_width"] == 6
    assert parsed["model_layer_1"]["self_attn"]["q_proj"]["weight_width"] == 4
    assert parsed["model_layer_2"]["mlp"]["up_proj"]["weight_width"] == 6
    assert "default" in parsed


def test_toml_roundtrip(tmp_path):
    cfg = {
        "default": {
            "name": "block_fp",
            "width": 6,
            "block": [1, 16],
            "maybe": None,
            "flag": True,
            "s": 'quote"inside',
        },
        "nested": {"inner": {"x": 1.5}},
    }
    path = tmp_path / "cfg.toml"
    save_config(cfg, path)
    loaded = load_config(path)
    assert loaded == cfg  # NA <-> None round trip included


def test_flatten_expand_roundtrip():
    d = {"a": {"b": {"c": 1}, "d": [1, 2]}, "e": "x"}
    flat = flatten_dict(d, {})
    assert flat["root:a:b:c"] == 1
    back = expand_dict(flat, {})
    assert back == d


def test_find_int_frac_width():
    # max_half_range 4.0, width 8 -> floor(log2(127/4)) = 4
    assert find_int_frac_width(8, 4.0) == 4
    assert find_int_frac_width(8, 4.0, frac_choices=[0, 2, 4, 6]) == 4
    assert find_int_frac_width(8, 4.0, frac_choices=[0, 3]) == 3


def test_transform_stat_profile():
    profile = {
        "root:model_layer_0:self_attn:q_proj:data_in": {
            "range_min_max": {"min": -2.0, "max": 3.0}
        },
        "root:model_layer_0:self_attn:q_proj:weight": {
            "range_min_max": {"min": -0.5, "max": 0.5}
        },
    }
    qc = transform_stat_profile_to_int_quant_config(
        profile, "range_min_max", width=8
    )
    node = qc["model_layer_0"]["self_attn"]["q_proj"]
    assert node["name"] == "integer"
    assert node["data_in_width"] == 8
    assert node["data_in_frac_width"] == find_int_frac_width(8, 3.0)
    assert node["weight_frac_width"] == find_int_frac_width(8, 0.5)


def test_cost_model_block_fp_bits():
    p = profile_linear_layer(BFP, in_features=64, out_features=32, bias=True,
                             batch_size=16)
    # weight [64,32] in [1,16] blocks: 64*2 blocks of 16 -> codes 64*32*6,
    # exponents 128*8
    assert p["num_params"] == 64 * 32 + 32
    assert p["param_bits"] == 64 * 32 * 6 + 128 * 8 + (32 * 6 + 2 * 8)
    assert p["flops"] == 16 * 32 * (2 * 64 - 1) + 16 * 32
    p2 = profile_matmul_layer(BFP, (16, 64), (64, 16))
    assert p2["num_params"] == 0
    assert p2["flops"] == 16 * 16 * (2 * 64 - 1)
    total = {"num_params": 0, "num_acts": 0, "param_bits": 0, "act_bits": 0,
             "flops": 0}
    update_profile(total, p)
    update_profile(total, p2)
    assert total["flops"] == p["flops"] + p2["flops"]


def test_cost_model_bypass_counts_fp32():
    p = profile_linear_layer({"name": "integer", "bypass": True}, 8, 8, False, 4)
    assert p["param_bits"] == 8 * 8 * 32


def test_glue_metrics():
    m = compute_glue_metrics("sst2", [1, 0, 1, 1], [1, 0, 0, 1])
    assert m["accuracy"] == 0.75
    m = compute_glue_metrics("mrpc", [1, 1, 0, 1], [1, 0, 0, 1])
    assert 0 < m["f1"] <= 1
    m = compute_glue_metrics("cola", [1, 0, 1, 0], [1, 0, 0, 1])
    assert -1 <= m["matthews_correlation"] <= 1
    m = compute_glue_metrics("stsb", [1.0, 2.0, 3.0], [1.1, 2.2, 2.9])
    assert m["pearson"] > 0.9
