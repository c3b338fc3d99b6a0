"""Fixed-sequence-length perplexity eval (Wikitext2 protocol).

Reference: src/llm_mixed_q/eval/eval_lm.py:10-72 — accumulate
loss * batch_size * seq_len over fixed-length chunks,
ppl = exp(sum / (seq_len * num_sequences)); asserts constant seq_len.
"""

from __future__ import annotations

import math

import numpy as np

import jax.numpy as jnp


def eval_lm_wikitext2(
    forward_fn,
    params,
    eval_dataloader,
    num_samples: int | None = None,
    progress_bar: bool = False,
) -> dict:
    losses = []
    seq_len = None
    num_sequences = 0
    for batch in eval_dataloader:
        input_ids = np.asarray(batch["input_ids"])
        bs, cur_len = input_ids.shape
        if seq_len is None:
            seq_len = cur_len
        assert cur_len == seq_len, "All batches must have the same seq_len"
        out = forward_fn(
            params,
            jnp.asarray(input_ids),
            jnp.asarray(batch["attention_mask"]),
            jnp.asarray(batch["labels"]),
        )
        losses.append(float(out["loss"]) * bs * seq_len)
        num_sequences += bs
        if num_samples is not None and num_sequences >= num_samples:
            break
    total = float(np.sum(losses))
    avg_nll = total / (seq_len * num_sequences)
    return {
        "loss": avg_nll,
        "perplexity": math.exp(avg_nll),
        "num_sequences": num_sequences,
        "seq_len": seq_len,
    }
