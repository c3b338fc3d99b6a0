"""Section 1 (motivation): activation-variance-vs-depth profile.

Reference: /root/reference/experiments/emnlp/section_1/profile_variance/ —
a vendored Llama fork with nn.Identity taps and forward hooks collecting
``variance_online`` per decoder-layer input/output, plotted against depth
(the paper's Figure motivating per-layer mixed precision: variance grows
with depth, so deeper layers need different bit allocation).

This driver reproduces the experiment through the framework's stat
profiler (the jitted tap path — no model fork, no hooks): it collects
``variance_online`` at every quantized node, reduces per LAYER (mean over
the layer's data_in taps), and writes variance_vs_depth.{json,csv}.

CI scale:   python section_1_variance.py --synthetic --save_dir out/
Paper scale: ... --model_arch llama --model_name <vicuna-7b dir>
"""

from __future__ import annotations

import argparse
import csv
import re
from pathlib import Path

from _common import add_driver_args, build, write_json


def main(argv=None):
    parser = argparse.ArgumentParser("section_1 variance-vs-depth profile")
    add_driver_args(parser)
    args = parser.parse_args(argv)
    seq_len = args.seq_len or (32 if args.synthetic else 2048)
    batch_size = args.batch_size or 4
    num_batches = 4

    import numpy as np

    from llm_mixed_q_tpu.datasets import make_synthetic_lm_dataset
    from llm_mixed_q_tpu.models import get_model_fn
    from llm_mixed_q_tpu.stats.profiler import profile_statistics

    # fp32 model (quant nodes bypassed — we are measuring the float
    # activations the paper profiles, not quantized ones)
    config, params = build(args, task="lm", quant_config=None)

    data = make_synthetic_lm_dataset(
        config.vocab_size, seq_len, batch_size * num_batches, seed=0
    )
    batches = [
        {k: v[i * batch_size : (i + 1) * batch_size] for k, v in data.items()}
        for i in range(num_batches)
    ]

    profile = profile_statistics(
        batches=batches,
        arch=args.model_arch,
        model_fn=get_model_fn(args.model_arch, "lm"),
        config=config,
        params=params,
        act_stats=("variance_online",),
        weight_stats=(),
    )

    # reduce node-level variance to per-layer depth series
    per_layer: dict[int, list[float]] = {}
    node_table = {}
    # profile keys are FLAT ``root:<node path>:<entry>`` names (the same
    # convention as StatManager.finalize / the reference's stat TOMLs),
    # mapping to {stat_name: {...}} — filter on the NAME, then read the stat.
    for name, stats in profile.items():
        m = re.search(r"model_layer_(\d+)", name)
        if m is None:
            continue
        depth = int(m.group(1))
        if "variance_online" not in stats or not name.endswith(":data_in"):
            continue
        var = stats["variance_online"]["variance"]
        v = float(np.mean(var)) if not np.isscalar(var) else float(var)
        per_layer.setdefault(depth, []).append(v)
        node_table[name] = round(v, 6)

    series = [
        {"layer": d, "mean_data_in_variance": round(float(np.mean(vs)), 6),
         "max_data_in_variance": round(float(np.max(vs)), 6)}
        for d, vs in sorted(per_layer.items())
    ]
    if not series:
        # fail LOUDLY: an empty series means the profile key convention
        # changed under us (exactly the round-3 regression) — exiting 0 with
        # an empty artifact silently breaks run_all_ci.sh.
        raise RuntimeError(
            "empty variance series: no 'root:model_layer_<i>:...:data_in' "
            f"keys with variance_online in profile ({len(profile)} keys)"
        )

    save_dir = Path(args.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    write_json(save_dir, "variance_vs_depth.json", {
        "protocol": "variance_online per quant node (jitted tap path), "
        "reduced per layer — reference section_1/profile_variance",
        "arch": args.model_arch,
        "seq_len": seq_len,
        "series": series,
        "per_node": node_table,
    })
    with open(save_dir / "variance_vs_depth.csv", "w", newline="") as f:
        w = csv.DictWriter(
            f, fieldnames=["layer", "mean_data_in_variance",
                           "max_data_in_variance"]
        )
        w.writeheader()
        w.writerows(series)
    for row in series:
        print(f"layer {row['layer']:3d}: mean var "
              f"{row['mean_data_in_variance']:.6f}  max "
              f"{row['max_data_in_variance']:.6f}")
    print(f"wrote {save_dir}/variance_vs_depth.json")


if __name__ == "__main__":
    main()
