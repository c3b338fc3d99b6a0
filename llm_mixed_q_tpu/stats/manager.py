"""StatManager — named collections of act/weight stats.

Reference: src/llm_mixed_q/statstic_profiler/stat_manager.py:7-154. Instead of
torch forward hooks, the functional models emit taps (node name + arrays)
through ``llm_mixed_q_tpu.ops.linear.capture_quant_node_taps``; the manager
routes each tap entry into its collection. Weight entries are captured once
(``weight_collect_updated`` guard, stat_manager.py:110-128).
"""

from __future__ import annotations

import numpy as np

from .stats import StatBase, create_new_stat


class ActStatCollection:
    def __init__(self, stats):
        self.stats: list[StatBase] = []
        if isinstance(stats, dict):
            for stat_name, stat_kwargs in stats.items():
                self.stats.append(create_new_stat(stat_name, **stat_kwargs))
        else:
            for stat_name in stats:
                self.stats.append(create_new_stat(stat_name))

    def update(self, batch: np.ndarray):
        batch = np.asarray(batch)
        for stat in self.stats:
            # per-sample update with kept batch dim (reference
            # stat_manager.py:19-27)
            for i in range(batch.shape[0]):
                stat.update_a_sample(batch[i : i + 1])

    def compute(self) -> dict:
        results = {}
        for stat in self.stats:
            results.update(stat.export())
        return results


class WeightStatCollection:
    def __init__(self, stats):
        self.stats: list[StatBase] = []
        if isinstance(stats, dict):
            for stat_name, stat_kwargs in stats.items():
                self.stats.append(create_new_stat(stat_name, **stat_kwargs))
        else:
            for stat_name in stats:
                self.stats.append(create_new_stat(stat_name))

    def update(self, weight: np.ndarray):
        for stat in self.stats:
            stat.update_a_sample(np.asarray(weight))

    def compute(self) -> dict:
        results = {}
        for stat in self.stats:
            results.update(stat.export())
        return results


class StatManager:
    def __init__(self, act_stats, weight_stats):
        self.act_stats = act_stats
        self.weight_stats = weight_stats
        self.registered_stats: dict[str, ActStatCollection | WeightStatCollection] = {}
        self.weight_collect_updated: dict[str, bool] = {}

    def _act(self, name: str) -> ActStatCollection:
        if name not in self.registered_stats:
            self.registered_stats[name] = ActStatCollection(self.act_stats)
        return self.registered_stats[name]

    def _weight(self, name: str) -> WeightStatCollection:
        if name not in self.registered_stats:
            self.registered_stats[name] = WeightStatCollection(self.weight_stats)
            self.weight_collect_updated[name] = False
        return self.registered_stats[name]

    def update_act(self, name: str, batch):
        self._act(name).update(batch)

    def update_weight(self, name: str, weight):
        col = self._weight(name)
        if not self.weight_collect_updated[name]:
            col.update(weight)
            self.weight_collect_updated[name] = True

    def finalize(self, show_progress_bar: bool = False) -> dict:
        return {name: stat.compute() for name, stat in self.registered_stats.items()}
