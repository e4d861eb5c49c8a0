"""spark-submit CLI end-to-end: run, outputs, ledger resume.

Runs in a subprocess because cli.main owns (and stops) its session —
calling it in-process would tear down the shared test session.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(args: list[str]) -> dict:
    proc = subprocess.run(
        [sys.executable, "-m", "json_spark", *args],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_cli_run_and_resume(spark, tmp_path):
    from json_spark.fixtures.gen import write_fixtures
    fixture = str(tmp_path / "fixture")
    # >= 1000 rows so the planted-defect moduli (983..1000) actually fire
    write_fixtures(spark, fixture, 2000, partitions=4)

    common = ["--clips", f"{fixture}/clips", "--manifest", f"{fixture}/manifest",
              "--baseline", "self", "--baseline-exclude", "opus",
              "--ledger", str(tmp_path / "ledger"),
              "--cores", "4"]
    first = _cli([*common, "--out", str(tmp_path / "out1")])
    assert first["n_partition_checks"] == 32       # 4 codecs x 8 checks
    assert first["n_violations"] > 0               # planted defects surface

    resumed = _cli([*common, "--out", str(tmp_path / "out2")])
    assert resumed["n_partition_checks"] == 0      # ledger marked all DONE

    rerun = _cli([*common, "--out", str(tmp_path / "out3"), "--no-resume"])
    assert rerun["n_partition_checks"] == 32       # --no-resume reprocesses


def test_cli_content_checks(spark, tmp_path):
    from json_spark.fixtures.gen import write_fixtures
    fixture = str(tmp_path / "fixture")
    write_fixtures(spark, fixture, 2000, partitions=4)
    out = str(tmp_path / "out")
    res = _cli(["--clips", f"{fixture}/clips", "--out", out,
                "--content-checks", "--cores", "4"])
    # stats/uniqueness/header/snr + pcm_content/silence/bandwidth/
    # bit_depth/polarity, 4 codecs
    assert res["n_partition_checks"] == 36
    got = {r["check_name"] for r in
           spark.read.parquet(f"{out}/partition_verdicts")
           .select("check_name").distinct().collect()}
    assert {"pcm_content", "silence", "bandwidth", "bit_depth",
            "polarity"} <= got


def test_cli_domain_rules_toml(spark, tmp_path):
    """--domain-rules: TOML-declared CHECK constraints flow through the
    CLI into per-rule verdict rows and violations."""
    from json_spark.fixtures.gen import write_fixtures
    fixture = str(tmp_path / "fixture")
    write_fixtures(spark, fixture, 1200, partitions=4)
    rules_toml = tmp_path / "rules.toml"
    rules_toml.write_text(
        '[[rule]]\n'
        'column = "dur_ms"\n'
        'required = true\n'
        'name = "required:dur_ms"\n'
        '\n'
        '[[rule]]\n'
        'column = "dur_ms"\n'
        'max = 190\n'
        'when = "codec = \'pcm_s16le\'"\n'
        'name = "cond:pcm_dur"\n'
    )
    out = str(tmp_path / "out")
    res = _cli(["--clips", f"{fixture}/clips", "--out", out,
                "--domain-rules", str(rules_toml), "--cores", "4"])
    # stats/uniqueness/header/snr + 2 domain rules, 4 codecs
    assert res["n_partition_checks"] == 24
    verdicts = spark.read.parquet(f"{out}/partition_verdicts")
    got = {r["check_name"] for r in
           verdicts.select("check_name").distinct().collect()}
    assert {"required:dur_ms", "cond:pcm_dur"} <= got
    # the generator plants NULL dur_ms at i%101==100
    from pyspark.sql import functions as F
    reds = (verdicts.filter(F.col("check_name") == "required:dur_ms")
            .agg(F.sum("n_red")).collect()[0][0])
    assert reds == len([i for i in range(1200) if i % 101 == 100])


def test_cli_suggest_rules_roundtrip(spark, tmp_path):
    """--suggest-rules prints domain-rule TOML derived from the data;
    feeding it straight back via --domain-rules yields all-green rows
    for the suggested checks (the closure property, end to end)."""
    from json_spark.fixtures.gen import write_fixtures
    fixture = str(tmp_path / "fixture")
    write_fixtures(spark, fixture, 600, partitions=4)

    proc = subprocess.run(
        [sys.executable, "-m", "json_spark",
         "--clips", f"{fixture}/clips",
         "--suggest-rules", "codec,sr_hz", "--cores", "4"],
        capture_output=True, text=True, cwd=REPO, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    toml_text = proc.stdout[proc.stdout.index("[[rule]]"):]
    assert "suggested:in_set:codec" in toml_text

    # round-trip: parse → render → parse is a fixed point
    from json_spark.operators.domain import (
        domain_rules_from_toml,
        domain_rules_to_toml,
    )
    rules = domain_rules_from_toml(toml_text)
    assert domain_rules_from_toml(domain_rules_to_toml(rules)) == rules

    rules_toml = tmp_path / "suggested.toml"
    rules_toml.write_text(toml_text)
    out = str(tmp_path / "out")
    _cli(["--clips", f"{fixture}/clips", "--out", out,
          "--domain-rules", str(rules_toml), "--cores", "4"])
    verdicts = spark.read.parquet(f"{out}/partition_verdicts")
    from pyspark.sql import functions as F
    sugg = verdicts.filter(F.col("check_name").startswith("suggested:"))
    assert sugg.count() > 0
    assert sugg.filter((F.col("n_red") > 0)
                       | (F.col("n_yellow") > 0)).count() == 0


def test_cli_out_still_required_without_suggest(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-m", "json_spark", "--clips", "/nonexistent"],
        capture_output=True, text=True, cwd=REPO, timeout=60)
    assert proc.returncode != 0
    assert "--out is required" in proc.stderr


def test_cli_schema_contract(spark, tmp_path):
    from json_spark.fixtures.gen import write_fixtures
    fixture = str(tmp_path / "fixture")
    write_fixtures(spark, fixture, 1000, partitions=2)
    contract = tmp_path / "contract.toml"
    contract.write_text(
        '[[field]]\nname = "clip_id"\nfamily = "string"\n\n'
        '[[field]]\nname = "Sr-Hz"\nfamily = "integer"\n\n'
        '[[field]]\nname = "bytes"\nfamily = "binary"\n')
    out = str(tmp_path / "out")
    res = _cli(["--clips", f"{fixture}/clips", "--out", out,
                "--schema-contract", str(contract), "--cores", "4"])
    # 4 codecs x 4 base checks + the one __table__ schema row
    assert res["n_partition_checks"] == 17


def test_cli_schema_contract_fail_fast(spark, tmp_path):
    from json_spark.fixtures.gen import write_fixtures
    fixture = str(tmp_path / "fixture")
    write_fixtures(spark, fixture, 1000, partitions=2)
    contract = tmp_path / "contract.toml"
    contract.write_text(
        '[[field]]\nname = "speaker_id"\nfamily = "string"\n')
    proc = subprocess.run(
        [sys.executable, "-m", "json_spark",
         "--clips", f"{fixture}/clips", "--out", str(tmp_path / "out"),
         "--schema-contract", str(contract), "--cores", "4"],
        capture_output=True, text=True, cwd=REPO, timeout=300)
    assert proc.returncode != 0
    assert "speaker_id" in proc.stderr


def test_cli_quarantine(spark, tmp_path):
    from json_spark.fixtures.gen import write_fixtures
    fixture = str(tmp_path / "fixture")
    write_fixtures(spark, fixture, 2000, partitions=2)
    out = str(tmp_path / "out")
    qdir = str(tmp_path / "quarantine")
    res = _cli(["--clips", f"{fixture}/clips", "--out", out,
                "--quarantine", qdir, "--cores", "4"])
    assert res["n_quarantined"] > 0
    q = spark.read.parquet(qdir)
    # full source schema, payloads included
    assert set(q.columns) >= {"clip_id", "bytes", "sr_hz", "dur_ms",
                              "codec"}
    viol_ids = {r["clip_id"] for r in spark.read.parquet(f"{out}/violations")
                .select("clip_id").distinct().collect() if r["clip_id"]}
    assert {r["clip_id"] for r in q.select("clip_id").collect()} == viol_ids
