"""GLUE classification eval.

Reference: src/llm_mixed_q/eval/eval_cls.py:6-53 — argmax (or squeeze for
regression) over a dataloader with an optional ``num_samples`` cap.
``forward_fn`` is a jitted logits function from
``llm_mixed_q_tpu.models.api.make_forward``.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .metrics import compute_glue_metrics


def eval_cls_glue(
    forward_fn,
    params,
    task: str,
    eval_dataloader,
    is_regression: bool = False,
    num_samples: int | None = None,
    progress_bar: bool = False,
) -> dict[str, float]:
    preds_all, refs_all = [], []
    seen = 0
    for batch in eval_dataloader:
        out = forward_fn(
            params,
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["attention_mask"]),
        )
        logits = np.asarray(out["logits"])
        preds = logits.squeeze(-1) if is_regression else logits.argmax(axis=-1)
        labels = np.asarray(batch["labels"])
        if num_samples is not None and seen + len(labels) > num_samples:
            take = num_samples - seen
            preds, labels = preds[:take], labels[:take]
        preds_all.append(preds)
        refs_all.append(labels)
        seen += len(labels)
        if num_samples is not None and seen >= num_samples:
            break
    preds_all = np.concatenate(preds_all)
    refs_all = np.concatenate(refs_all)
    return compute_glue_metrics(task, preds_all, refs_all)
