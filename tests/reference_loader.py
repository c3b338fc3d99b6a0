"""Load the reference's quantizer modules standalone for parity testing.

The full reference package needs the missing ``toml`` lib, so we materialize
only ``models/quantize/quantizers/*`` as a synthetic package ``refq`` with
correct relative-import wiring. The reference is used strictly as a test
oracle — no reference code is shipped in the framework.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

REF_QUANTIZERS = Path("/root/reference/src/llm_mixed_q/models/quantize/quantizers")


def load_reference_quantizers():
    if "refq" in sys.modules:
        return sys.modules["refq"]
    pkg = types.ModuleType("refq")
    pkg.__path__ = [str(REF_QUANTIZERS)]
    sys.modules["refq"] = pkg
    for name in [
        "utils",
        "minifloat",
        "log",
        "integer",
        "block_fp",
        "block_minifloat",
        "block_log",
    ]:
        spec = importlib.util.spec_from_file_location(
            f"refq.{name}", REF_QUANTIZERS / f"{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refq.{name}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, name, mod)
    return pkg
