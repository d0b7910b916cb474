"""Loader that makes the actual reference `dibs` package importable.

Injects :mod:`parity.igraph_shim` as ``sys.modules['igraph']`` (igraph is the
reference's only uninstallable dependency — SURVEY.md §2.4) and puts
``/root/reference`` on ``sys.path`` so ``import dibs`` resolves to the real
upstream code, unmodified.

Everything under /root/reference is treated as untrusted third-party code run
for numerical comparison only.
"""
from __future__ import annotations

import os
import sys

REFERENCE_ROOT = os.environ.get("DIBS_REFERENCE_ROOT", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "dibs"))


def load_reference():
    """Returns the imported reference ``dibs`` package (cached)."""
    if not reference_available():
        raise ImportError(f"reference tree not found at {REFERENCE_ROOT}")
    if "igraph" not in sys.modules:
        from parity import igraph_shim

        sys.modules["igraph"] = igraph_shim
    # the repo's own package is `dibs_tpu`, so `dibs` is unambiguous
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    # avoid writing .pyc into the read-only reference tree
    sys.dont_write_bytecode = True
    import dibs  # noqa: F401

    return dibs
