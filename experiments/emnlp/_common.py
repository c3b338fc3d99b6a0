"""Shared plumbing for the EMNLP reproduction drivers.

Reference: /root/reference/experiments/emnlp/ — bash scripts binding the
CLIs into the paper's protocol. These drivers do the same for this
framework, with one addition the offline CI environment needs: every driver
accepts ``--synthetic`` to run the identical protocol on a randomly
initialized model + synthetic data at CI scale (no HF checkpoints or
network in CI; pass a local checkpoint dir to reproduce at paper scale).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent
CONFIGS = REPO / "configs" / "quantization"


def add_driver_args(parser: argparse.ArgumentParser):
    parser.add_argument(
        "--model_name", default=None,
        help="local HF checkpoint dir; omit with --synthetic",
    )
    parser.add_argument("--model_arch", default="opt",
                        choices=["bert", "llama", "opt"])
    parser.add_argument(
        "--synthetic", action="store_true",
        help="random-init tiny model + synthetic data (CI scale)",
    )
    parser.add_argument("--save_dir", required=True)
    parser.add_argument("--seq_len", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--num_samples", type=int, default=None)


def tiny_config_kwargs(arch: str) -> dict:
    """CI-scale model shape per arch (synthetic mode)."""
    base = dict(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=128 if arch == "bert" else 256,
    )
    if arch == "opt":
        base["ffn_dim"] = 128
    else:
        base["intermediate_size"] = 128
    return base


def build_synthetic(arch: str, task: str, quant_config, num_labels: int = 2):
    """(config, params) for a random-init tiny model."""
    from llm_mixed_q_tpu.models import get_config_cls
    from llm_mixed_q_tpu.models import hf_loader

    kwargs = tiny_config_kwargs(arch)
    if task == "cls":
        kwargs["num_labels"] = num_labels
    config = get_config_cls(arch)(**kwargs, quant_config=quant_config)
    init = getattr(hf_loader, f"init_{arch}_params")
    params = init(config, task=task, seed=0)
    return config, params


def build_from_checkpoint(arch: str, task: str, model_name: str, quant_config,
                          num_labels: int = 2):
    from llm_mixed_q_tpu.models import get_config_cls, get_params_loader
    from llm_mixed_q_tpu.models.hf_loader import load_flat_state_dict

    kwargs = {"num_labels": num_labels} if task == "cls" else {}
    config = get_config_cls(arch).from_pretrained(
        model_name, quant_config=quant_config, **kwargs
    )
    flat = load_flat_state_dict(model_name)
    params = get_params_loader(arch)(flat, config, task=task)
    return config, params


def build(args, task: str, quant_config, num_labels: int = 2):
    if args.synthetic or args.model_name is None:
        return build_synthetic(args.model_arch, task, quant_config, num_labels)
    return build_from_checkpoint(
        args.model_arch, task, args.model_name, quant_config, num_labels
    )


def write_json(save_dir, name: str, payload: dict):
    out = Path(save_dir)
    out.mkdir(parents=True, exist_ok=True)
    path = out / name
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, default=float)
    print(f"wrote {path}")
    return path
