from .stats import column_stats
from .uniqueness import approx_uniqueness, exact_duplicates, uniqueness_summary
from .referential import orphans, referential_summary, transcript_mismatches
from .drift import histogram, psi, ks_statistic

__all__ = [
    "column_stats",
    "approx_uniqueness",
    "exact_duplicates",
    "uniqueness_summary",
    "orphans",
    "referential_summary",
    "transcript_mismatches",
    "histogram",
    "psi",
    "ks_statistic",
]
