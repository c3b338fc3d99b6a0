"""QAT fine-tune CLI (DP / FSDP-style sharding).

Reference: ddp_train_runner (train_ddp.py:201) and fsdp_train_runner
(train_fsdp.py:245). One runner with ``--fsdp`` toggling ZeRO-3-style param
sharding; both names exported for parity.
"""

from __future__ import annotations

import argparse
from functools import partial

import jax

from ..datasets import get_raw_dataset_dict, numpy_dataloader, preprocess_dataset_dict
from ..datasets.glue import is_regression_task
from ..eval import eval_cls_glue
from ..models import get_config_cls, get_params_loader
from ..models.api import make_forward
from ..models.hf_loader import load_flat_state_dict
from ..parallel import make_mesh
from ..train import train_qat
from .common import add_common_model_args, get_tokenizer, save_results


def _train(args, fsdp: bool):
    config_cls = get_config_cls(args.model_arch)
    config = config_cls.from_pretrained(
        args.model_name, quant_config=args.quant_config, num_labels=args.num_labels
    )
    flat = load_flat_state_dict(args.model_name)
    params = get_params_loader(args.model_arch)(flat, config, task="cls")
    tokenizer = get_tokenizer(args)
    raw = get_raw_dataset_dict(args.task)
    ds = preprocess_dataset_dict(raw, args.task, tokenizer, "max_length", args.max_length)
    train_factory = partial(
        numpy_dataloader,
        ds["train"],
        batch_size=args.batch_size,
        shuffle=True,
        drop_last=True,
    )
    eval_loader_factory = partial(
        numpy_dataloader, ds["validation"], batch_size=args.batch_size
    )
    eval_fwd = make_forward(args.model_arch, "cls", config, quantize_weights=True)

    def eval_fn(p):
        out = eval_cls_glue(
            eval_fwd,
            p,
            args.task,
            eval_loader_factory(),
            is_regression=is_regression_task(args.task),
        )
        if args.task == "mnli":
            # mismatched split too (reference train_fsdp.py:627-647)
            mm = eval_cls_glue(
                eval_fwd,
                p,
                args.task,
                numpy_dataloader(
                    ds["validation_mismatched"], batch_size=args.batch_size
                ),
                is_regression=False,
            )
            out.update({f"{k}_mm": v for k, v in mm.items()})
        return out

    n_dev = len(jax.devices())
    mesh = make_mesh(data=n_dev, model=1) if n_dev > 1 else None

    n_train = len(ds["train"])
    steps_per_epoch = n_train // args.batch_size
    params, history = train_qat(
        args.model_arch,
        "cls",
        config,
        params,
        train_factory,
        eval_fn=eval_fn,
        num_epochs=args.num_train_epochs,
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        grad_accum_steps=args.gradient_accumulation_steps,
        schedule=args.lr_scheduler_type,
        warmup_steps=args.num_warmup_steps,
        checkpoint_dir=args.checkpoint_dir,
        save_every_steps=args.checkpointing_steps,
        resume=args.resume_from_checkpoint,
        mesh=mesh,
        fsdp=fsdp,
        steps_per_epoch=steps_per_epoch,
    )
    save_results(args, {"history": history}, "train_history")
    return params, history


def _add_train_args(parser):
    add_common_model_args(parser)
    parser.add_argument("--task", required=True)
    parser.add_argument("--num_train_epochs", type=int, default=4)
    parser.add_argument("--learning_rate", type=float, default=2e-5)
    parser.add_argument("--weight_decay", type=float, default=0.0)
    parser.add_argument("--gradient_accumulation_steps", type=int, default=1)
    parser.add_argument("--lr_scheduler_type", default="cosine")
    parser.add_argument("--num_warmup_steps", type=int, default=0)
    parser.add_argument("--checkpoint_dir", default=None)
    parser.add_argument("--checkpointing_steps", type=int, default=None)
    parser.add_argument("--resume_from_checkpoint", action="store_true")


def dp_train_runner(argv=None):
    parser = argparse.ArgumentParser("dp_train_runner")
    _add_train_args(parser)
    args = parser.parse_args(argv)
    return _train(args, fsdp=False)


def fsdp_train_runner(argv=None):
    parser = argparse.ArgumentParser("fsdp_train_runner")
    _add_train_args(parser)
    args = parser.parse_args(argv)
    return _train(args, fsdp=True)


ddp_train_runner = dp_train_runner  # reference name parity
