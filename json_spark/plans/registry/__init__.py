"""Driver-contract query registry (package form).

Split from the former 9.3k-line single module along its section comments
(r4 verdict directive 6) — zero behavior change: ``base`` holds the infra
(QUERIES/ORACLE_SQL dicts, @register, GATE_FRONT, gate_order) and the
section modules below are imported in the ORIGINAL registration order, so
``gate_order(QUERIES)`` yields the exact same 185-name ordering the
single file produced.
"""

from .base import (
    CFG,
    GATE_FRONT,
    ORACLE_SQL,
    QUERIES,
    gate_order,
    register,
)

# registration order == original single-file order; do not reorder
from . import core            # noqa: E402,F401
from . import audio           # noqa: E402,F401
from . import pipeline_text   # noqa: E402,F401
from . import pipeline_media  # noqa: E402,F401
from . import coercion_rest   # noqa: E402,F401
from . import engine_paths    # noqa: E402,F401
from . import domain          # noqa: E402,F401
from . import association     # noqa: E402,F401
from . import curation_batches  # noqa: E402,F401
from . import sentinel_family   # noqa: E402,F401

__all__ = ["CFG", "GATE_FRONT", "ORACLE_SQL", "QUERIES", "gate_order",
           "register"]
