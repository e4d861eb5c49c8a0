from .stats import column_stats
from .uniqueness import approx_uniqueness, exact_duplicates, uniqueness_summary
from .referential import orphans, referential_summary, transcript_mismatches
from .drift import histogram, psi, ks_statistic
from .domain import DomainRule, domain_rollup, domain_violations

__all__ = [
    "column_stats",
    "DomainRule",
    "domain_rollup",
    "domain_violations",
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
