"""One-shot: re-run ONLY the 7B-shape arm of quality.py and patch the
existing artifact. The round-5 first run used a per-element max-relative
metric whose 1e-6 denominators blew bf16-accumulation noise at near-zero
outputs into 1e4-scale numbers; the arm now reports RMS-normalized
deviations. Usage: python tools/patch_quality_7b.py QUALITY.json
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from quality import seven_b_shape_arm  # noqa: E402

path = sys.argv[1] if len(sys.argv) > 1 else "QUALITY_r05.json"
report = json.loads(Path(path).read_text())
report["seven_b_shape"] = seven_b_shape_arm()
Path(path).write_text(json.dumps(report, indent=1))
print("patched", path)
