"""The north-rule launch shape, for real: ``spark-submit --py-files
json_spark.zip`` with the package imported ONLY from the zip (cwd is a
scratch dir, so nothing resolves from the repo checkout by accident).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"

RUNNER = """\
import sys
from json_spark.cli import main
sys.exit(main(sys.argv[1:]))
"""


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not installed")
def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    from json_spark.fixtures.gen import write_fixtures

    fixture = str(tmp_path / "fixture")
    write_fixtures(spark, fixture, 600, partitions=4)

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_pyfiles
    zip_path = make_pyfiles.build(str(tmp_path / "json_spark.zip"))
    runner = tmp_path / "run_suite.py"
    runner.write_text(RUNNER)
    out = str(tmp_path / "out")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only import source
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path, str(runner),
         "--clips", f"{fixture}/clips", "--out", out, "--cores", "4"],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=420,
        env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    # stats/uniqueness/header/snr x 4 codecs
    assert summary["n_partition_checks"] == 16
    verdicts = spark.read.parquet(f"{out}/partition_verdicts")
    assert verdicts.count() == 16
