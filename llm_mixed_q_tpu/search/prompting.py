"""Mixed-precision search driven by zero-shot prompting accuracy.

Reference: ``SearchQuantisationForPromptingCLS`` (search/search.py:595-1101)
and ``SearchIntQuantisationForPromptingCLS`` (search_conditional.py:684-…):
same skeleton as the GLUE-driven search, but the software metric is the mean
lm-eval ``acc`` across prompting tasks (reference search.py:656-699). Here
the prompting eval is the native JAX loglikelihood protocol
(eval/prompting.py) instead of a vendored lm-eval fork, and the model is
re-CONFIGURED per trial (params stay resident) rather than re-instantiated.
"""

from __future__ import annotations

import logging

from ..config import transform_stat_profile_to_int_quant_config
from ..eval.prompting import eval_prompting_tasks, load_task_examples
from ..models import get_stat_config_formatter
from ..utils.dict_tools import flatten_dict
from ..utils.trial_extractor import trial_to_quant_config
from .engine import FrozenTrial, Study, create_study, get_sampler
from .search import METRIC_NAMES, SearchQuantisationForClassification

logger = logging.getLogger(__name__)


class SearchQuantisationForPromptingCLS(SearchQuantisationForClassification):
    """Search with mean zero-shot prompting accuracy as the software metric."""

    def __init__(
        self,
        model_arch: str,
        model_name: str,
        search_config,
        save_dir,
        params: dict,
        tokenizer,
        model_config_kwargs: dict | None = None,
    ):
        super().__init__(
            model_arch,
            model_name,
            search_config,
            save_dir,
            params,
            num_labels=2,
            model_config_kwargs=model_config_kwargs,
        )
        self.tokenizer = tokenizer
        self.search_task = "lm"

    @property
    def task(self):
        return "lm"

    @task.setter
    def task(self, value):  # SearchBase.__init__ assigns "cls"; keep "lm"
        pass

    def _pre_search_check(self):
        pass  # prompting search has no GLUE threshold invariants

    def _trial_config(self, sampled: dict, num_layers: int) -> dict:
        """Hook: sampled seed -> complete quant config (overridden by the
        conditional/int variant)."""
        return self.q_config_parser(sampled, num_layers, strict=False)

    def compute_software_metric_prompting(
        self, forward_fn, params, tasks, limit, examples_by_task
    ) -> dict:
        res = eval_prompting_tasks(
            forward_fn,
            params,
            self.tokenizer,
            tasks,
            limit=limit,
            examples_by_task=examples_by_task,
        )
        return {"accuracy": res["mean_acc"]}

    def search_prompting(
        self,
        tasks: list[str],
        seq_len: int,
        limit: int | None = None,
        examples_by_task: dict | None = None,
    ) -> Study:
        est = self.search_config["search_estimator"]
        strat = self.search_config["search_strategy"]
        seed = self.search_config["search_space"]["quant_config_seed"]
        extend_first = self.search_config["search_space"].get(
            "extend_quant_config_seed_first", False
        )
        if examples_by_task is None:
            examples_by_task = {t: load_task_examples(t) for t in tasks}

        def objective(trial):
            quant_config_seed = seed
            num_layers = self.make_model_config(None).num_hidden_layers
            if extend_first:
                quant_config_seed = self.q_config_parser(
                    quant_config_seed, num_layers, strict=False
                )
            sampled = self.q_config_sampler(trial, "root", quant_config_seed)
            config = self._trial_config(sampled, num_layers)
            model_config = self.make_model_config(config)
            forward_fn = self.make_forward(model_config)
            s_metric = self.compute_software_metric_prompting(
                forward_fn, self.params, tasks, limit, examples_by_task
            )
            h_metric = self.compute_hardware_metric(
                model_config, seq_len, compare_to=est["compare_to"]
            )
            metrics = {**s_metric, **h_metric}
            scaled = [metrics[m] * est[f"alpha_{m}"] for m in METRIC_NAMES]
            if trial.number == 0:
                self._csv_log(
                    "trial_id,"
                    + ",".join(METRIC_NAMES)
                    + ","
                    + ",".join(f"scaled_{m}" for m in METRIC_NAMES)
                )
            self._csv_log(
                f"{trial.number},"
                + ",".join(str(metrics[m]) for m in METRIC_NAMES)
                + ","
                + ",".join(map(str, scaled))
            )
            return tuple(scaled)

        def logger_callback(study, frozen: FrozenTrial):
            logger.info(
                f"Prompting trial {frozen.number}: "
                f"scaled={tuple(round(v, 4) for v in frozen.values)}"
            )

        sampler = get_sampler(strat["sampler"], seed=strat.get("seed"))
        study = create_study(directions=["maximize"] * 4, sampler=sampler)
        study.optimize(
            objective,
            n_trials=strat["n_trials"],
            n_jobs=strat.get("n_jobs", 1),
            timeout=strat.get("timeout"),
            callbacks=[logger_callback],
        )
        self.save_study_and_results(study)
        return study

    def evaluate_best_trials_prompting(
        self,
        study: Study,
        tasks: list[str],
        limit: int | None = None,
        examples_by_task: dict | None = None,
    ):
        """Threshold-filter the Pareto front, full prompting eval of the
        winner (reference search.py:1000-1101)."""
        strat = self.search_config["search_strategy"]
        est = self.search_config["search_estimator"]
        acc_threshold = strat.get("accuracy_threshold", 0)
        avg_bitwidth_threshold = strat.get("avg_bitwidth_threshold", 0)
        if examples_by_task is None:
            examples_by_task = {t: load_task_examples(t) for t in tasks}

        candidates = []
        for t in study.best_trials:
            acc = t.values[0] / (est["alpha_accuracy"] + 1e-8)
            mem = t.values[1] / (est["alpha_memory_density"] + 1e-8)
            avg_bw = est["compare_to"] / (mem + 1e-12)
            if acc >= acc_threshold and (
                avg_bitwidth_threshold == 0 or avg_bw <= avg_bitwidth_threshold
            ):
                candidates.append((t, acc, avg_bw))
        if not candidates:
            candidates = [(t, 0, 0) for t in study.best_trials]
        candidates.sort(key=lambda c: (-c[1], c[2]))
        best_trial = candidates[0][0]
        num_layers = self.make_model_config(None).num_hidden_layers
        qc = self._trial_config(
            trial_to_quant_config(best_trial), num_layers
        )
        model_config = self.make_model_config(qc)
        forward_fn = self.make_forward(model_config)
        res = eval_prompting_tasks(
            forward_fn,
            self.params,
            self.tokenizer,
            tasks,
            limit=limit,
            examples_by_task=examples_by_task,
        )
        from ..utils import save_config

        save_config(
            trial_to_quant_config(best_trial),
            self.save_dir / "best_quant_config.toml",
        )
        return {"best_trial_number": best_trial.number, **res}


class SearchIntQuantisationForPromptingCLS(SearchQuantisationForPromptingCLS):
    """Conditional integer search on prompting tasks: sample widths only,
    derive frac_widths from a stat profile (reference
    search_conditional.py:684-…)."""

    def __init__(
        self,
        model_arch: str,
        model_name: str,
        search_config,
        save_dir,
        params: dict,
        tokenizer,
        stat_profile: dict,
        range_entry: str = "range_min_max",
        model_config_kwargs: dict | None = None,
    ):
        super().__init__(
            model_arch,
            model_name,
            search_config,
            save_dir,
            params,
            tokenizer,
            model_config_kwargs,
        )
        self.stat_profile = stat_profile
        self.range_entry = range_entry
        self.q_config_formatter = get_stat_config_formatter(model_arch)

    def _trial_config(self, sampled: dict, num_layers: int) -> dict:
        sampled = self.q_config_parser(sampled, num_layers, strict=False)
        sampled_flat: dict = {}
        flatten_dict(sampled, new_d=sampled_flat, name="root")
        config = transform_stat_profile_to_int_quant_config(
            self.stat_profile,
            range_entry=self.range_entry,
            width=sampled_flat,
            frac_choices=None,
            root_name="root",
            is_ptq=True,
            bypass=False,
        )
        self.q_config_formatter(
            config,
            num_layers,
            default_config=sampled,
            is_ptq=True,
            bypass=False,
        )
        return self.q_config_parser(config, num_layers, strict=False)
