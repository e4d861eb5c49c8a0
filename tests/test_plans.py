"""Physical-plan assertions: the properties the 100 TB design depends on.

Reuses the check table from tools/explain_audit.py (the human-readable
auditor) so the two can't drift. AQE is disabled in this session ONLY to
make join strategies and codegen subtrees visible in the static plan —
production sessions keep AQE on.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.explain_audit import CHECKS, get_plan  # noqa: E402


@pytest.fixture(scope="module")
def noaqe_spark():
    from json_spark.session import get_spark
    s = get_spark("plan-tests", cores=4, shuffle_partitions=8,
                  extra_conf={"spark.sql.adaptive.enabled": "false",
                              "spark.ui.showConsoleProgress": "false"})
    yield s


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as e
    return e.queries()


@pytest.mark.parametrize("name", sorted(CHECKS))
def test_plan_properties(noaqe_spark, queries, sf_dir, name):
    df = queries[name](noaqe_spark, sf_dir)
    plan = get_plan(df) + "\n== CODEGEN ==\n" + get_plan(df, "codegen")
    for desc, required, pred in CHECKS[name]:
        if not required:
            continue
        assert pred(plan), f"{name}: {desc}\n--- plan ---\n{plan[:4000]}"


def test_ledger_trend_verdicts(spark):
    """Trend rules over a hand-built 3-run ledger: latest-vs-previous
    comparison, NEW for first-seen metrics, prev=0 special case, and the
    warn/alert thresholds."""
    import json as _json

    from json_spark.plans.ledger import ledger_trend

    from pyspark.sql import functions as F

    def row(pid, ts, metrics):
        return (pid, "stats", "DONE", _json.dumps(metrics), "lin", ts)

    rows = [
        # p1: three runs — only the last two must be compared
        row("p1", "2026-01-01 00:00:00", {"n": 1.0, "r": 0.5}),
        row("p1", "2026-01-02 00:00:00", {"n": 100.0, "r": 0.50}),
        row("p1", "2026-01-03 00:00:00", {"n": 108.0, "r": 0.62}),
        # p2: single run — everything NEW
        row("p2", "2026-01-03 00:00:00", {"n": 5.0}),
        # p3: prev zero
        row("p3", "2026-01-02 00:00:00", {"z": 0.0, "g": 0.0}),
        row("p3", "2026-01-03 00:00:00", {"z": 3.0, "g": 0.0}),
    ]
    led = spark.createDataFrame(
        rows, "partition_id string, check_name string, status string, "
              "metrics_json string, lineage string, updated_at string"
    ).withColumn("updated_at", F.to_timestamp("updated_at"))
    out = {(r["partition_id"], r["metric"]): r
           for r in ledger_trend(led).collect()}
    assert out[("p1", "n")]["trend"] == "GREEN"          # +8% <= warn
    assert abs(out[("p1", "n")]["rel_change"] - 0.08) < 1e-12
    assert out[("p1", "n")]["prev"] == 100.0             # run 1 ignored
    assert out[("p1", "r")]["trend"] == "YELLOW"         # +24%
    assert out[("p2", "n")]["trend"] == "NEW"
    assert out[("p2", "n")]["rel_change"] is None
    assert out[("p3", "z")]["trend"] == "RED"            # 0 -> 3
    assert out[("p3", "g")]["trend"] == "GREEN"          # 0 -> 0
