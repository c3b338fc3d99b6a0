"""Section 4.3 (QAT): W4A4 BFP quantization-aware fine-tune on SST-2.

Reference protocol: /root/reference/experiments/emnlp/section_4.3/
opt_350m_sst2.sh — OPT-350M, W4A4 BFP, batch 16, lr 2e-5, 4 epochs, cosine
schedule, grad-accum 4, periodic checkpoints, eval each epoch. This driver
reproduces that protocol through ``train_qat`` (the DDP/FSDP-equivalent
jitted train step) and emits history JSON + orbax checkpoints.

CI scale: python section_4_3_qat.py --synthetic --save_dir out/
Paper scale: ... --model_arch opt --model_name <opt-350m ckpt> --task sst2
"""

from __future__ import annotations

import argparse

from _common import CONFIGS, add_driver_args, build, write_json


def main(argv=None):
    parser = argparse.ArgumentParser("section_4.3 W4A4 QAT fine-tune")
    add_driver_args(parser)
    parser.add_argument("--task", default="sst2")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--lr", type=float, default=2e-5)
    parser.add_argument("--grad_accum", type=int, default=4)
    parser.add_argument("--resume", action="store_true")
    args = parser.parse_args(argv)
    epochs = args.epochs or (1 if args.synthetic else 4)
    batch_size = args.batch_size or (4 if args.synthetic else 16)
    seq_len = args.seq_len or (32 if args.synthetic else 128)

    from llm_mixed_q_tpu.datasets import (
        get_raw_dataset_dict,
        make_synthetic_cls_dataset,
        numpy_dataloader,
        preprocess_dataset_dict,
    )
    from llm_mixed_q_tpu.eval.eval_cls import eval_cls_glue
    from llm_mixed_q_tpu.models.api import make_forward
    from llm_mixed_q_tpu.train import train_qat
    from llm_mixed_q_tpu.utils.toml_io import load_config

    qc = load_config(CONFIGS / "bfp_4bit.toml")
    config, params = build(args, "cls", qc)

    if args.synthetic:
        train_ds = make_synthetic_cls_dataset(256, seq_len, 32, seed=0)
        eval_ds = make_synthetic_cls_dataset(256, seq_len, 16, seed=1)
        steps_per_epoch = 32 // batch_size
    else:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.model_name)
        raw = get_raw_dataset_dict(args.task)
        ds = preprocess_dataset_dict(raw, args.task, tokenizer, "max_length",
                                     seq_len)
        train_ds, eval_ds = ds["train"], ds["validation"]
        steps_per_epoch = len(train_ds) // batch_size

    def train_batches():
        return numpy_dataloader(train_ds, batch_size=batch_size, shuffle=True,
                                drop_last=True)

    eval_fwd = make_forward(args.model_arch, "cls", config,
                            quantize_weights=True)

    def eval_fn(p):
        return eval_cls_glue(
            eval_fwd, p, args.task,
            numpy_dataloader(eval_ds, batch_size=batch_size),
            is_regression=False,
        )

    params, history = train_qat(
        args.model_arch, "cls", config, params, train_batches,
        eval_fn=eval_fn,
        num_epochs=epochs,
        learning_rate=args.lr,
        grad_accum_steps=args.grad_accum,
        schedule="cosine",
        steps_per_epoch=steps_per_epoch,
        checkpoint_dir=f"{args.save_dir}/checkpoints",
        save_every_steps=max(steps_per_epoch // 2, 1),
        resume=args.resume,
    )
    write_json(args.save_dir, "qat_history.json",
               {"protocol": "opt_350m_sst2.sh (W4A4 BFP QAT)",
                "epochs": epochs, "history": history})
    return history


if __name__ == "__main__":
    main()
