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
