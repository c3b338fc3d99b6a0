"""Conditional (integer) search: sample widths, derive frac_widths from stats.

Reference: src/llm_mixed_q/search/search_conditional.py:96-683
(``SearchIntQuantisationForClassification``) — per trial: sample only widths
from the seed -> flatten -> ``transform_stat_profile_to_int_quant_config``
(frac_width from the pre-collected stat profile) -> per-model stat formatter
synthesizes matmul/rope nodes -> eval.
"""

from __future__ import annotations

import logging

from ..config.stat_to_int import transform_stat_profile_to_int_quant_config
from ..models import get_stat_config_formatter
from ..utils.dict_tools import flatten_dict
from .search import SearchQuantisationForClassification

logger = logging.getLogger(__name__)


class SearchIntQuantisationForClassification(SearchQuantisationForClassification):
    def __init__(
        self,
        model_arch: str,
        model_name: str,
        search_config,
        save_dir,
        params: dict,
        stat_profile: dict,
        range_entry: str = "range_min_max",
        num_labels: int = 2,
        model_config_kwargs: dict | None = None,
    ):
        super().__init__(
            model_arch,
            model_name,
            search_config,
            save_dir,
            params,
            num_labels,
            model_config_kwargs,
        )
        self.stat_profile = stat_profile
        self.range_entry = range_entry
        self.q_config_formatter = get_stat_config_formatter(model_arch)

    def _sampled_to_config(self, sampled: dict, num_layers: int) -> dict:
        """parsed sampled widths + stat profile -> complete integer config
        (reference search_conditional.py:262-285): flatten_dict produces keys
        like ``root:model_layer_0:self_attn:q_proj:data_in_width``, exactly
        what the transform looks up per stat-profile entry name."""
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
        return config

    def search(
        self,
        eval_dataloader_factory,
        task: str,
        is_regression: bool,
        seq_len: int,
        num_samples_per_trial: int,
    ):
        est = self.search_config["search_estimator"]
        strat = self.search_config["search_strategy"]
        seed = self.search_config["search_space"]["quant_config_seed"]
        extend_first = self.search_config["search_space"].get(
            "extend_quant_config_seed_first", False
        )
        from .engine import create_study, get_sampler
        from .search import METRIC_NAMES

        def objective(trial):
            quant_config_seed = seed
            num_layers = self.make_model_config(None).num_hidden_layers
            if extend_first:
                quant_config_seed = self.q_config_parser(
                    quant_config_seed, num_layers, strict=False
                )
            sampled = self.q_config_sampler(trial, "root", quant_config_seed)
            config = self._sampled_to_config(sampled, num_layers)
            config = self.q_config_parser(config, num_layers, strict=False)
            model_config = self.make_model_config(config)
            forward_fn = self.make_forward(model_config)
            s_metric = self.compute_software_metric(
                forward_fn,
                self.params,
                task,
                eval_dataloader_factory(),
                is_regression,
                num_samples_per_trial,
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

        sampler = get_sampler(strat["sampler"], seed=strat.get("seed"))
        study = create_study(directions=["maximize"] * 4, sampler=sampler)
        study.optimize(
            objective,
            n_trials=strat["n_trials"],
            n_jobs=strat.get("n_jobs", 1),
            timeout=strat.get("timeout"),
        )
        self.save_study_and_results(study)
        return study
