"""Experiment drivers (VERDICT.md Next #9): sections 4.2/4.3/4.4 run
end-to-end at CI scale (--synthetic) and leave the reference-matching
artifacts (JSON/CSV, study.pkl, checkpoints).

Reference: /root/reference/experiments/emnlp/section_4.*/ shell drivers."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

DRIVERS = Path(__file__).resolve().parent.parent / "experiments" / "emnlp"


def _run(script, out, extra=()):
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        str(DRIVERS.parent.parent) + os.pathsep + env.get("PYTHONPATH", "")
    )
    # The drivers are single-device programs; the parent test process holds
    # an 8-virtual-device CPU client, and on a small host a second one in
    # the subprocess oversubscribes the cores badly (observed: 900s timeout
    # on 2 vCPUs for a run that takes ~90s with 1 device).
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, script, "--synthetic", "--save_dir", str(out), *extra],
        cwd=str(DRIVERS),
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert r.returncode == 0, f"{script} failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    return r


def test_section_4_2_perplexity(tmp_path):
    _run("section_4_2_perplexity.py", tmp_path,
         ["--arms", "fp32", "w6a6_bfp", "w4a4_bfp"])
    summary = (tmp_path / "perplexity_summary.csv").read_text().splitlines()
    assert summary[0] == "arm,perplexity,delta_vs_fp32"
    assert len(summary) == 4
    ppl6 = json.loads((tmp_path / "ppl_w6a6_bfp.json").read_text())
    assert ppl6["perplexity"] > 0


def test_section_4_2_downstream(tmp_path):
    _run("section_4_2_downstream.py", tmp_path)
    out = json.loads((tmp_path / "downstream_w6a6_bfp.json").read_text())
    assert set(out["results"]) == {"sst", "rte", "cola"}
    assert (tmp_path / "downstream_summary.csv").exists()


def test_section_4_3_qat(tmp_path):
    _run("section_4_3_qat.py", tmp_path)
    hist = json.loads((tmp_path / "qat_history.json").read_text())
    assert hist["history"], "no training history"
    assert "accuracy" in hist["history"][-1]
    assert (tmp_path / "checkpoints").exists()


def test_section_4_4_search(tmp_path):
    _run("section_4_4_search.py", tmp_path, ["--n_trials", "3"])
    for artifact in ("search_log.csv", "study.pkl", "results.csv",
                     "search_summary.json"):
        assert (tmp_path / artifact).exists(), artifact
    summary = json.loads((tmp_path / "search_summary.json").read_text())
    assert summary["n_trials"] == 3
    assert summary["pareto_size"] >= 1


def test_section_1_variance(tmp_path):
    _run("section_1_variance.py", tmp_path, ["--model_arch", "llama"])
    out = json.loads((tmp_path / "variance_vs_depth.json").read_text())
    layers = [row["layer"] for row in out["series"]]
    assert layers == [0, 1]  # tiny synthetic llama has 2 layers
    assert all(row["mean_data_in_variance"] > 0 for row in out["series"])
    assert (tmp_path / "variance_vs_depth.csv").exists()
