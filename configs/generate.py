"""Generate the experiment config TOMLs.

The 10 uniform PTQ configs and 3 mixed-precision search spaces reproduce the
paper's hyperparameters (EMNLP 2023, reference experiments/emnlp/configs/):
W8 baselines for every arithmetic, W6/W4 BFP, and block_fp per-layer search
seeds for bert-base/opt-1.3b/llama-7b on SST-2. Emitted via this framework's
own TOML writer — run ``python configs/generate.py`` to regenerate.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from llm_mixed_q_tpu.utils import save_config

HERE = Path(__file__).resolve().parent

ROPE_INT8 = {
    "bypass": False,
    "name": "integer",
    "data_in_width": 8,
    "data_in_frac_width": 7,
}


def entries(prefix_to_keys: dict) -> dict:
    out = {}
    for prefix, kv in prefix_to_keys.items():
        for k, v in kv.items():
            out[f"{prefix}_{k}"] = v
    return out


def bfp(width: int) -> dict:
    per = {"width": width, "exponent_width": 8, "exponent_bias": 127}
    return {
        "bypass": False,
        "name": "block_fp",
        "is_ptq": True,
        **entries(
            {
                "weight": {**per, "block_size": [1, 16]},
                "data_in": {**per, "block_size": [1, 16]},
                "bias": {**per, "block_size": [16]},
            }
        ),
    }


QUANTIZATION = {
    "bypass": {"by": "type", "default": {"bypass": True, "name": "integer"}},
    "integer": {
        "by": "type",
        "default": {
            "bypass": False,
            "name": "integer",
            "is_ptq": True,
            **entries(
                {
                    "weight": {"width": 8, "frac_width": 7},
                    "data_in": {"width": 8, "frac_width": 4},
                    "bias": {"width": 8, "frac_width": 8},
                }
            ),
        },
        "rotary_positional_encoding": ROPE_INT8,
    },
    "log": {
        "by": "type",
        "default": {
            "bypass": False,
            "name": "log",
            "is_ptq": True,
            **entries(
                {
                    p: {"width": 8, "exponent_bias": 63}
                    for p in ("weight", "data_in", "bias")
                }
            ),
        },
        "rotary_positional_encoding": ROPE_INT8,
    },
    "minifloat_ieee": {
        "by": "type",
        "default": {
            "bypass": False,
            "name": "minifloat_ieee",
            "is_ptq": True,
            **entries(
                {
                    p: {"width": 8, "exponent_width": 4, "exponent_bias": 7}
                    for p in ("weight", "data_in", "bias")
                }
            ),
        },
        "rotary_positional_encoding": ROPE_INT8,
    },
    "minifloat_denorm": {
        "by": "type",
        "default": {
            "bypass": False,
            "name": "minifloat_denorm",
            "is_ptq": True,
            **entries(
                {
                    p: {"width": 8, "exponent_width": 4, "exponent_bias": 7}
                    for p in ("weight", "data_in", "bias")
                }
            ),
        },
        "rotary_positional_encoding": ROPE_INT8,
    },
    "block_fp": {
        "by": "type",
        "default": bfp(8),
        "rotary_positional_encoding": ROPE_INT8,
    },
    "bfp_6bit": {"default": bfp(6), "rotary_positional_encoding": ROPE_INT8},
    "bfp_4bit": {"default": bfp(4), "rotary_positional_encoding": ROPE_INT8},
    "block_minifloat": {
        "by": "type",
        "default": {
            "bypass": False,
            "name": "block_minifloat",
            "is_ptq": True,
            **entries(
                {
                    "weight": {
                        "width": 8,
                        "exponent_width": 4,
                        "exponent_bias_width": 8,
                        "block_size": [1, 16],
                    },
                    "data_in": {
                        "width": 8,
                        "exponent_width": 4,
                        "exponent_bias_width": 8,
                        "block_size": [1, 16],
                    },
                    "bias": {
                        "width": 8,
                        "exponent_width": 4,
                        "exponent_bias_width": 8,
                        "block_size": [16],
                    },
                }
            ),
        },
        "rotary_positional_encoding": ROPE_INT8,
    },
    "block_log": {
        "by": "type",
        "default": {
            "bypass": False,
            "name": "block_log",
            "is_ptq": True,
            **entries(
                {
                    "weight": {
                        "width": 8,
                        "exponent_bias_width": 8,
                        "block_size": [1, 16],
                    },
                    "data_in": {
                        "width": 8,
                        "exponent_bias_width": 8,
                        "block_size": [1, 16],
                    },
                    "bias": {
                        "width": 8,
                        "exponent_bias_width": 8,
                        "block_size": [16],
                    },
                }
            ),
        },
        "rotary_positional_encoding": ROPE_INT8,
    },
}

def seed_entry(data_widths, weight_widths, bias_widths=None) -> dict:
    def lists(per):
        return {
            "name": ["block_fp"],
            "bypass": ["!ast!False"],
            "is_ptq": ["!ast!True"],
            **{f"data_in_{k}": v for k, v in per["data_in"].items()},
            **{f"weight_{k}": v for k, v in per["weight"].items()},
            **(
                {f"bias_{k}": v for k, v in per["bias"].items()}
                if "bias" in per
                else {}
            ),
        }

    per = {
        "data_in": {
            "width": data_widths,
            "exponent_width": [8],
            "exponent_bias": ["!ast!None"],
            "block_size": ["!ast![1, 16]"],
        },
        "weight": {
            "width": weight_widths,
            "exponent_width": [8],
            "exponent_bias": ["!ast!None"],
            "block_size": ["!ast![1, 16]"],
        },
    }
    if bias_widths is not None:
        per["bias"] = {
            "width": bias_widths,
            "exponent_width": [8],
            "exponent_bias": ["!ast!None"],
            "block_size": ["!ast![1, 16]"],
        }
    return lists(per)


def search_config(data_widths, weight_widths, bias_widths, n_trials=128):
    return {
        "search_strategy": {
            "n_jobs": 1,
            "n_trials": n_trials,
            "timeout": 28800.0,
            "sampler": "TPE",
            "accuracy_threshold": 0.80,
            "avg_bitwidth_threshold": 5,
            "fps_threshold": 0,
            "fps_per_lut_threshold": 0,
            "sort_by": ["accuracy", "avg_bitwidth"],
        },
        "search_estimator": {
            "alpha_accuracy": 1,
            "alpha_memory_density": 0.1,
            "alpha_fps": 0,
            "alpha_fps_per_lut": 0,
            "compare_to": 32,
        },
        "search_space": {
            "extend_quant_config_seed_first": True,
            "quant_config_seed": {
                "default": seed_entry(data_widths, weight_widths, bias_widths)
            },
        },
    }


SEARCH = {
    "bert_base_sst2": search_config([6, 5, 4, 3], [5, 4, 3, 2], [5, 4, 3, 2]),
    "opt_1.3b_sst2": search_config([6, 5, 4, 3], [5, 4, 3, 2], [5, 4, 3, 2]),
    "llama_7b_sst2": search_config([7, 6, 5, 4], [6, 5, 4, 3], [7, 6, 5, 4]),
}


def main():
    qdir = HERE / "quantization"
    for name, cfg in QUANTIZATION.items():
        save_config(cfg, qdir / f"{name}.toml")
    sdir = HERE / "search"
    for name, cfg in SEARCH.items():
        save_config(cfg, sdir / f"{name}.toml")
    print(f"wrote {len(QUANTIZATION)} quantization + {len(SEARCH)} search configs")


if __name__ == "__main__":
    main()
