"""Search engine tests: samplers, Pareto, study round-trip, model samplers."""

import numpy as np
import pytest

from llm_mixed_q_tpu.search.engine import (
    FrozenTrial,
    Study,
    create_study,
    crowding_distance,
    get_sampler,
    non_dominated_sort,
)
from llm_mixed_q_tpu.search.samplers_model import sample_llama_quant_config
from llm_mixed_q_tpu.utils.trial_extractor import trial_to_quant_config


def _mk_trial(n, values, params=None):
    return FrozenTrial(n, params or {}, {}, list(values), "COMPLETE")


def test_non_dominated_sort():
    ts = [
        _mk_trial(0, [1, 1]),
        _mk_trial(1, [2, 0.5]),
        _mk_trial(2, [0.5, 0.5]),  # dominated by 0
        _mk_trial(3, [0.5, 2]),
    ]
    fronts = non_dominated_sort(ts)
    assert {t.number for t in fronts[0]} == {0, 1, 3}
    assert {t.number for t in fronts[1]} == {2}


def test_crowding_distance_extremes_infinite():
    ts = [_mk_trial(i, [i, 10 - i]) for i in range(5)]
    cd = crowding_distance(ts)
    assert cd[0] == float("inf") and cd[4] == float("inf")
    assert np.isfinite(cd[2])


@pytest.mark.parametrize("name", ["random", "tpe", "nsgaii", "nsgaiii", "qmc"])
def test_samplers_optimize(name):
    sampler = get_sampler(name, seed=0)
    study = create_study(["maximize", "maximize"], sampler)

    def objective(trial):
        w = trial.suggest_categorical("w", [2, 4, 6, 8])
        b = trial.suggest_categorical("b", ["!ast![1, 16]", "!ast![16]"])
        acc = 1.0 - 0.05 * (8 - w)
        density = 32 / w
        return acc, density

    study.optimize(objective, n_trials=30)
    assert len(study.trials) == 30
    assert all(t.state == "COMPLETE" for t in study.trials)
    front = study.best_trials
    assert front
    # 4 distinct widths along the tradeoff are all non-dominated
    widths = {t.params["w"] for t in front}
    assert len(widths) >= 2


def test_sampler_determinism():
    results = []
    for _ in range(2):
        study = create_study(["maximize"], get_sampler("random", seed=42))
        study.optimize(
            lambda t: (t.suggest_categorical("x", list(range(100))),), n_trials=5
        )
        results.append([t.params["x"] for t in study.trials])
    assert results[0] == results[1]


def test_tpe_beats_random_on_easy_problem():
    def run(sampler_name):
        study = create_study(["maximize"], get_sampler(sampler_name, seed=1))

        def objective(trial):
            total = 0
            for i in range(8):
                total += trial.suggest_categorical(f"x{i}", [0, 1, 2, 3])
            return (total,)

        study.optimize(objective, n_trials=60)
        return max(t.values[0] for t in study.trials)

    assert run("tpe") >= run("random") - 2  # sanity: TPE not broken


def test_study_pickle_roundtrip(tmp_path):
    study = create_study(["maximize"], get_sampler("random", seed=0))
    study.optimize(
        lambda t: (t.suggest_categorical("root:a:b_width", [4, 8]),), n_trials=3
    )
    path = tmp_path / "study.pkl"
    study.save(path)
    loaded = Study.load(path)
    assert len(loaded.trials) == 3
    qc = trial_to_quant_config(loaded.trials[0])
    assert qc["a"]["b_width"] in (4, 8)


def test_timeout_stops_early():
    study = create_study(["maximize"], get_sampler("random", seed=0))
    import time

    def slow(trial):
        time.sleep(0.05)
        return (trial.suggest_categorical("x", [1, 2]),)

    study.optimize(slow, n_trials=1000, timeout=0.3)
    assert 1 <= len(study.trials) < 1000


def test_llama_model_sampler_param_names():
    seed = {
        "default": {
            "name": ["block_fp"],
            "weight_width": [4, 6, 8],
            "weight_exponent_width": [8],
            "weight_exponent_bias": [127],
            "weight_block_size": ["!ast![1, 16]"],
            "data_in_width": [4, 6, 8],
            "data_in_exponent_width": [8],
            "data_in_exponent_bias": [127],
            "data_in_block_size": ["!ast![1, 16]"],
            "is_ptq": [True],
            "bypass": [False],
        },
    }
    study = create_study(["maximize"], get_sampler("random", seed=0))
    captured = {}

    def objective(trial):
        sampled = sample_llama_quant_config(trial, "root", seed)
        captured.update(trial.params)
        assert sampled["default"]["weight_block_size"] == [1, 16]  # !ast! decoded
        assert sampled["default"]["weight_width"] in (4, 6, 8)
        return (1.0,)

    study.optimize(objective, n_trials=2)
    assert "root:default:weight_width" in captured


# ---- sampler FIDELITY (VERDICT.md Next #8): guided samplers must beat
# random measurably at equal trial budgets, multi-seed means so a silent
# degrade-to-random regression fails the suite.


def _single_obj_best(sampler_name, seed, n_trials=100):
    study = create_study(["maximize"], get_sampler(sampler_name, seed=seed))

    def objective(trial):
        # 12 independent categorical params, peak at x=6 — per-param
        # marginal structure that TPE's categorical estimator should learn
        s = 0.0
        for i in range(12):
            x = trial.suggest_categorical(f"x{i}", list(range(8)))
            s += 1.0 - abs(x - 6) / 7.0
        return (s / 12.0,)

    study.optimize(objective, n_trials=n_trials)
    return study.best_trial.values[0]


def test_tpe_regret_beats_random_multiseed():
    seeds = [0, 1, 2, 3, 4]
    tpe = sum(_single_obj_best("tpe", s) for s in seeds) / len(seeds)
    rnd = sum(_single_obj_best("random", s) for s in seeds) / len(seeds)
    # mean regret strictly better, by a real margin
    assert tpe > rnd + 0.02, (tpe, rnd)


def _hypervolume_2d(front, ref=(0.0, 0.0)):
    """Hypervolume of a 2-objective maximize front vs ref point."""
    pts = sorted({(t.values[0], t.values[1]) for t in front}, reverse=True)
    hv, prev_y = 0.0, ref[1]
    for x, y in pts:
        if y > prev_y:
            hv += (x - ref[0]) * (y - prev_y)
            prev_y = y
    return hv


def _multi_obj_hv(sampler_name, seed, n_trials=120):
    study = create_study(
        ["maximize", "maximize"], get_sampler(sampler_name, seed=seed)
    )

    def objective(trial):
        acc = 0.0
        mem = 0.0
        for i in range(10):
            x = trial.suggest_categorical(f"x{i}", list(range(8)))
            acc += 1.0 - abs(x - 6) / 7.0  # accuracy likes wide (x=6)
            mem += (7 - x) / 7.0  # memory density likes narrow
        return (acc / 10.0, mem / 10.0)

    study.optimize(objective, n_trials=n_trials)
    return _hypervolume_2d(study.best_trials)


@pytest.mark.parametrize("name", ["tpe", "nsgaii", "nsgaiii"])
def test_guided_samplers_hypervolume_vs_random(name):
    seeds = [0, 1, 2]
    guided = sum(_multi_obj_hv(name, s) for s in seeds) / len(seeds)
    rnd = sum(_multi_obj_hv("random", s) for s in seeds) / len(seeds)
    # Pareto hypervolume at equal trials must be at least random's
    # (and strictly better for TPE, whose marginals fit this separable toy)
    assert guided >= rnd - 1e-9, (name, guided, rnd)
    if name == "tpe":
        assert guided > rnd + 0.005, (guided, rnd)
