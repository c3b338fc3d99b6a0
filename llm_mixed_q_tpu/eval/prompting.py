"""Zero-shot prompting evaluation (lm-eval-harness style).

Reference: src/llm_mixed_q/eval/eval_prompting/ — the reference vendors a
fork of lm-evaluation-harness and registers a QuantizedCausalLMWrapper
(model_wrapper.py:16-176) whose core primitive is ``loglikelihood(context,
continuation)``. That primitive and the classification-task protocol
(score each answer choice, pick argmax, compare to gold) are implemented
natively here; task templates follow lm-eval's zero-shot prompts.

``eval_prompting_tasks`` mirrors the reference entry point
(evaluate_prompting.py:16-59): mean accuracy across tasks.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

# lm-eval zero-shot templates for the classification tasks the paper uses
# (sst = sst2 sentiment; plus common 0-shot cls tasks)
TASK_TEMPLATES = {
    "sst": {
        "context": lambda ex: f"{ex['sentence'].strip()}\nQuestion: Is this sentence positive or negative?\nAnswer:",
        "choices": [" negative", " positive"],
        "gold": lambda ex: int(ex["label"]),
        "dataset": ("glue", "sst2", "validation"),
    },
    "rte": {
        "context": lambda ex: f"{ex['sentence1']}\nQuestion: {ex['sentence2']} True or False?\nAnswer:",
        "choices": [" True", " False"],
        "gold": lambda ex: int(ex["label"]),
        "dataset": ("glue", "rte", "validation"),
    },
    "cola": {
        "context": lambda ex: f"{ex['sentence']}\nQuestion: Does this sentence make sense?\nAnswer:",
        "choices": [" no", " yes"],
        "gold": lambda ex: int(ex["label"]),
        "dataset": ("glue", "cola", "validation"),
    },
}


def loglikelihood_batch(forward_fn, params, tokenizer, pairs, max_length=512):
    """Sum log-prob of each continuation given its context.

    pairs: list of (context, continuation) strings. Returns np.array [n].
    Right-pads to the longest sequence in the batch (one jit shape per
    padded length bucket).
    """
    enc = []
    for ctx, cont in pairs:
        ctx_ids = tokenizer(ctx, add_special_tokens=True)["input_ids"]
        cont_ids = tokenizer(cont, add_special_tokens=False)["input_ids"]
        ids = (ctx_ids + cont_ids)[-max_length:]
        cont_len = min(len(cont_ids), len(ids) - 1)
        enc.append((ids, cont_len))
    max_len = max(len(ids) for ids, _ in enc)
    # bucket to multiples of 32 to bound jit recompiles
    max_len = ((max_len + 31) // 32) * 32
    batch_ids = np.zeros((len(enc), max_len), dtype=np.int64)
    mask = np.zeros((len(enc), max_len), dtype=np.int64)
    for i, (ids, _) in enumerate(enc):
        batch_ids[i, : len(ids)] = ids
        mask[i, : len(ids)] = 1

    logits = np.asarray(
        forward_fn(params, jnp.asarray(batch_ids), jnp.asarray(mask))["logits"]
    )
    logprobs = logits - _logsumexp(logits)
    out = np.zeros(len(enc))
    for i, (ids, cont_len) in enumerate(enc):
        n = len(ids)
        # token t is predicted by logits at t-1
        for t in range(n - cont_len, n):
            out[i] += logprobs[i, t - 1, ids[t]]
    return out


def _logsumexp(x):
    m = x.max(axis=-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=-1, keepdims=True))


def eval_prompting_task(
    forward_fn,
    params,
    tokenizer,
    task: str,
    examples,
    limit: int | None = None,
    batch_size: int = 8,
) -> dict:
    """Zero-shot classification accuracy for one task over ``examples``
    (list of dicts in the task's dataset schema)."""
    template = TASK_TEMPLATES[task]
    if limit is not None:
        examples = examples[:limit]
    n_choices = len(template["choices"])
    correct = 0
    for start in range(0, len(examples), batch_size):
        chunk = examples[start : start + batch_size]
        pairs = []
        for ex in chunk:
            ctx = template["context"](ex)
            pairs.extend((ctx, choice) for choice in template["choices"])
        lls = loglikelihood_batch(forward_fn, params, tokenizer, pairs)
        for i, ex in enumerate(chunk):
            scores = lls[i * n_choices : (i + 1) * n_choices]
            if int(np.argmax(scores)) == template["gold"](ex):
                correct += 1
    return {"acc": correct / max(len(examples), 1), "n": len(examples)}


def load_task_examples(task: str):
    """Load the task's eval split via HF datasets (cache or network)."""
    from datasets import load_dataset

    repo, subset, split = TASK_TEMPLATES[task]["dataset"]
    return list(load_dataset(repo, subset, split=split))


def eval_prompting_tasks(
    forward_fn,
    params,
    tokenizer,
    tasks: list[str],
    limit: int | None = None,
    batch_size: int = 8,
    examples_by_task: dict | None = None,
) -> dict:
    """Mean accuracy across tasks (reference evaluate_prompting.py:16-59)."""
    results = {}
    for task in tasks:
        examples = (
            examples_by_task[task]
            if examples_by_task is not None
            else load_task_examples(task)
        )
        results[task] = eval_prompting_task(
            forward_fn, params, tokenizer, task, examples, limit, batch_size
        )
    accs = [r["acc"] for r in results.values()]
    return {"results": results, "mean_acc": float(np.mean(accs))}
