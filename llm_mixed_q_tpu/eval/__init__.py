"""Eval layer.

``eval_dse_results`` mirrors the reference stub (eval/__init__.py:7-20): the
FPGA design-space-exploration submodule was never open-sourced, so fps-based
search objectives are inert — identical behavior here, documented.
"""

from .eval_cls import eval_cls_glue
from .eval_lm import eval_lm_wikitext2
from .metrics import TASK_TO_METRICS, compute_glue_metrics
from .prompting import eval_prompting_task, eval_prompting_tasks, loglikelihood_batch


def eval_dse_results(config, is_mixed: bool = False) -> dict:
    """Stub matching the reference's closed-source DSE
    (reference eval/__init__.py:7-20)."""
    return {"best_fps": 0.0, "resource": 1.0}
