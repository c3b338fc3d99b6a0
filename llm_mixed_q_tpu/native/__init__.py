"""Native (C++) host-side tier.

The reference has no native code (SURVEY.md §2.14); this tier exists because
the TPU framework adds real packed storage, and host-side repacking is the
per-trial cost of mixed-precision search. ``bfp_pack`` compiles on demand
with g++ and loads through ctypes; every caller falls back to the pure-JAX
pack when the toolchain is unavailable, so the library never hard-depends on
a compiled artifact.
"""

from .loader import (
    native_available,
    native_pack_int8,
    native_pack_subbyte,
)

__all__ = ["native_available", "native_pack_int8", "native_pack_subbyte"]
