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

def _mk_module(name):
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod



def shim_reference_deps():
    """Stub the reference's missing third-party deps (test-only).

    toml (read via stdlib tomllib), sentencepiece (only needed at import time
    by LlamaTokenizer), colorlog (plain logging.Formatter stand-in).
    """
    import logging
    import tomllib

    if "toml" not in sys.modules:
        toml_shim = _mk_module("toml")

        def _load(path):
            with open(path, "rb") as f:
                return tomllib.load(f)

        toml_shim.load = _load
        sys.modules["toml"] = toml_shim

    if "sentencepiece" not in sys.modules:
        sp = _mk_module("sentencepiece")
        sp.SentencePieceProcessor = object
        sys.modules["sentencepiece"] = sp

    if "colorlog" not in sys.modules:
        cl = _mk_module("colorlog")

        class ColoredFormatter(logging.Formatter):
            def __init__(self, fmt=None, *a, **k):
                if fmt:
                    for token in (
                        "%(log_color)s",
                        "%(reset)s",
                        "%(blue)s",
                        "%(thin_white)s",
                    ):
                        fmt = fmt.replace(token, "")
                super().__init__(fmt)

        cl.ColoredFormatter = ColoredFormatter
        sys.modules["colorlog"] = cl

    if "optuna" not in sys.modules:
        op = _mk_module("optuna")

        class _Stub:
            pass

        class _AnyAttr(types.ModuleType):
            def __getattr__(self, name):
                return _Stub

        op.Trial = _Stub
        op.Study = _Stub
        op.trial = _AnyAttr("optuna.trial")
        op.trial.__spec__ = __import__("importlib.machinery", fromlist=["ModuleSpec"]).ModuleSpec("optuna.trial", loader=None)
        sys.modules["optuna"] = op
        sys.modules["optuna.trial"] = op.trial

    if str(Path("/root/reference/src")) not in sys.path:
        sys.path.insert(0, "/root/reference/src")


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
