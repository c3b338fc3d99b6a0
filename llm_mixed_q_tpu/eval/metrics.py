"""GLUE metrics (numpy/scipy) — replaces the unavailable ``evaluate`` lib.

Reference behavior: eval/eval_cls.py:6-53 loads ``evaluate.load("glue",
task)``; the per-task metric sets here match the GLUE standard.
"""

from __future__ import annotations

import numpy as np
from scipy.stats import pearsonr, spearmanr

TASK_TO_METRICS = {
    "cola": ("matthews_correlation",),
    "mnli": ("accuracy",),
    "mrpc": ("accuracy", "f1"),
    "qnli": ("accuracy",),
    "qqp": ("accuracy", "f1"),
    "rte": ("accuracy",),
    "sst2": ("accuracy",),
    "stsb": ("pearson", "spearmanr"),
    "wnli": ("accuracy",),
}


def accuracy(preds, refs) -> float:
    preds, refs = np.asarray(preds), np.asarray(refs)
    return float((preds == refs).mean())


def f1(preds, refs, pos_label: int = 1) -> float:
    preds, refs = np.asarray(preds), np.asarray(refs)
    tp = np.sum((preds == pos_label) & (refs == pos_label))
    fp = np.sum((preds == pos_label) & (refs != pos_label))
    fn = np.sum((preds != pos_label) & (refs == pos_label))
    denom = 2 * tp + fp + fn
    return float(2 * tp / denom) if denom else 0.0


def matthews_correlation(preds, refs) -> float:
    preds, refs = np.asarray(preds), np.asarray(refs)
    classes = np.unique(np.concatenate([preds, refs]))
    k = len(classes)
    idx = {c: i for i, c in enumerate(classes)}
    cm = np.zeros((k, k), dtype=np.float64)
    for p, r in zip(preds, refs):
        cm[idx[r], idx[p]] += 1
    t = cm.sum(axis=1)
    p_ = cm.sum(axis=0)
    c = np.trace(cm)
    s = cm.sum()
    cov_ytyp = c * s - t @ p_
    cov_ypyp = s**2 - p_ @ p_
    cov_ytyt = s**2 - t @ t
    denom = np.sqrt(cov_ypyp * cov_ytyt)
    return float(cov_ytyp / denom) if denom else 0.0


def compute_glue_metrics(task: str, preds, refs) -> dict[str, float]:
    results = {}
    for metric in TASK_TO_METRICS[task]:
        if metric == "accuracy":
            results["accuracy"] = accuracy(preds, refs)
        elif metric == "f1":
            results["f1"] = f1(preds, refs)
        elif metric == "matthews_correlation":
            results["matthews_correlation"] = matthews_correlation(preds, refs)
        elif metric == "pearson":
            results["pearson"] = float(pearsonr(preds, refs)[0])
        elif metric == "spearmanr":
            results["spearmanr"] = float(spearmanr(preds, refs)[0])
    return results
