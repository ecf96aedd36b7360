"""Declared query corpus.

Each submodule registers queries via the shared registry decorator; the
driver contract (__spark_entry__.py) re-exports ALL_QUERIES / ALL_ORACLES.
"""

from __future__ import annotations

from .registry import ALL_ORACLES, ALL_QUERIES

# Import for registration side effects.
from . import ingest as _ingest  # noqa: E402,F401
from . import tpch as _tpch  # noqa: E402,F401
from . import events as _events  # noqa: E402,F401
from . import text as _text  # noqa: E402,F401
from . import similarity as _similarity  # noqa: E402,F401
from . import multimodal as _multimodal  # noqa: E402,F401

__all__ = ["ALL_QUERIES", "ALL_ORACLES"]
