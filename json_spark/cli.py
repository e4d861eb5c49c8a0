"""spark-submit entry point for the validation engine.

North-rule launch shape (BASELINE.json:6): ``spark-submit --py-files``
on a multi-executor cluster. Package the repo and run:

    zip -r json_spark.zip json_spark
    spark-submit --py-files json_spark.zip -m json_spark.cli ...   # or:
    spark-submit --py-files json_spark.zip run_suite.py \
        --clips /path/clips --manifest /path/manifest \
        --out /path/results --ledger /path/ledger

On a cluster, spark-submit provides the master; set
``SPARK_GRAFT_ON_CLUSTER=1`` so the session builder does not force
``local[*]`` (json_spark/session.py). Resumability: re-running with the
same ``--ledger`` path skips partitions already DONE for every check
(anti-join against the ledger — plans/ledger.py).

Outputs (all parquet, written not collected):
  {out}/partition_verdicts   per (partition, check): verdict + metrics
  {out}/violations           per offending row: reason + truncated value
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def main(argv: list[str] | None = None) -> int:
    # config-schema mode (reference cmd/config-schema/main.go:12-26):
    # print the introspected FormModel JSON and exit — no Spark session
    if argv is None:
        import sys as _sys
        argv = _sys.argv[1:]
    if argv and argv[0] == "--config-schema":
        from .config.introspect import config_schema_json
        print(config_schema_json())
        return 0

    ap = argparse.ArgumentParser(prog="json_spark",
                                 description="PySpark validation engine")
    ap.add_argument("--config-schema", action="store_true",
                    help="print the config form-model JSON schema and exit")
    ap.add_argument("--clips", required=True,
                    help="clips table path (parquet dir or Iceberg identifier)")
    ap.add_argument("--suggest-rules", default=None, metavar="COLS",
                    help="comma-separated columns: profile the clips "
                         "table, print suggested domain-rule TOML to "
                         "stdout, and exit (feed it back via "
                         "--domain-rules)")
    ap.add_argument("--manifest", default=None,
                    help="transcript manifest path (enables referential + "
                         "transcript checks)")
    ap.add_argument("--baseline", default=None,
                    help="baseline histogram-shares path (enables drift); "
                         "'self' builds it from this run's own population")
    ap.add_argument("--baseline-exclude", default=None, metavar="VALUE",
                    help="with --baseline self: partition value to exclude "
                         "from the self-baseline (a known-drifted "
                         "population); default excludes nothing")
    ap.add_argument("--out", default=None,
                    help="output directory (required unless "
                         "--suggest-rules)")
    ap.add_argument("--ledger", default=None,
                    help="checkpoint ledger path (enables resume)")
    ap.add_argument("--no-resume", action="store_true",
                    help="ignore existing ledger rows (full re-run)")
    ap.add_argument("--partition-col", default="codec")
    ap.add_argument("--snr-threshold-db", type=float, default=30.0)
    ap.add_argument("--content-checks", action="store_true",
                    help="add the sample-exact PCM content + silence "
                         "curation checks (same single decode pass as "
                         "header + snr)")
    ap.add_argument("--metadata-checks", action="store_true",
                    help="cross-field metadata-vs-payload checks "
                         "(container-vs-codec, dur-vs-header)")
    ap.add_argument("--max-silence-ratio", type=float, default=0.5,
                    help="per-clip YELLOW threshold for the silence check")
    ap.add_argument("--quarantine", default=None, metavar="PATH",
                    help="also write the FULL rows (payload included) of "
                         "every violating clip to PATH — the repair/"
                         "triage side table (plans/suite.py:quarantine)")
    ap.add_argument("--schema-contract", default=None,
                    metavar="CONTRACT_TOML",
                    help="validate the input schema against [[field]] "
                         "TOML tables (name/family/required) BEFORE any "
                         "scan; a missing required column aborts in "
                         "milliseconds (operators/schema.py)")
    ap.add_argument("--schema-no-fail-fast", action="store_true",
                    help="report missing required columns as RED rows "
                         "instead of aborting")
    ap.add_argument("--domain-rules", default=None, metavar="RULES_TOML",
                    help="TOML file of declarative domain/CHECK "
                         "constraints ([[rule]] tables — "
                         "operators/domain.py:domain_rules_from_toml)")
    ap.add_argument("--cores", type=int, default=None,
                    help="local-mode cores (ignored under spark-submit on a "
                         "cluster)")
    args = ap.parse_args(argv)
    if args.out is None and args.suggest_rules is None:
        ap.error("--out is required (unless --suggest-rules)")

    from .plans.suite import SuiteConfig, ValidationSuite, build_baseline_shares
    from .session import get_spark

    spark = get_spark("json_spark-suite", cores=args.cores)
    clips = spark.read.parquet(args.clips)
    if args.suggest_rules is not None:
        # onboarding mode: derive a reviewable domain-rule config from
        # the data itself (operators/suggest.py), printed as the same
        # [[rule]] TOML --domain-rules consumes — config is data, and
        # now data can draft the config
        from .operators.domain import domain_rules_to_toml
        from .operators.suggest import suggest_domain_rules
        cols = [c.strip() for c in args.suggest_rules.split(",") if c.strip()]
        rules = suggest_domain_rules(clips, cols)
        print(domain_rules_to_toml(rules), end="")
        spark.stop()
        return 0
    manifest = spark.read.parquet(args.manifest) if args.manifest else None
    domain_rules = ()
    if args.domain_rules:
        from .operators.domain import domain_rules_from_toml
        with open(args.domain_rules, encoding="utf-8") as fh:
            domain_rules = domain_rules_from_toml(fh.read())
    schema_contract = ()
    if args.schema_contract:
        from .operators.schema import contract_from_toml
        schema_contract = tuple(contract_from_toml(args.schema_contract))
    cfg = SuiteConfig(partition_col=args.partition_col,
                      snr_threshold_db=args.snr_threshold_db,
                      content_checks=args.content_checks,
                      metadata_checks=args.metadata_checks,
                      max_silence_ratio=args.max_silence_ratio,
                      domain_rules=domain_rules,
                      schema_contract=schema_contract,
                      schema_fail_fast=not args.schema_no_fail_fast)
    if args.baseline == "self":
        base_pop = clips
        if args.baseline_exclude is not None:
            base_pop = clips.filter(
                F.col(cfg.partition_col) != args.baseline_exclude)
        baseline = build_baseline_shares(base_pop, cfg)
    elif args.baseline:
        baseline = spark.read.parquet(args.baseline)
    else:
        baseline = None

    res = ValidationSuite(cfg).run(
        spark, clips, manifest, baseline,
        ledger_path=args.ledger, input_path=args.clips,
        resume=not args.no_resume,
    )
    res.partition_verdicts.write.mode("overwrite").parquet(
        f"{args.out}/partition_verdicts")
    res.violations.write.mode("overwrite").parquet(f"{args.out}/violations")

    verdicts = spark.read.parquet(f"{args.out}/partition_verdicts")
    summary = {
        "n_partition_checks": verdicts.count(),
        "n_red": verdicts.filter(F.col("verdict") == "RED").count(),
        "n_violations": spark.read.parquet(f"{args.out}/violations").count(),
    }
    if args.quarantine:
        from .plans.suite import quarantine
        q = quarantine(
            clips, spark.read.parquet(f"{args.out}/violations"))
        q.write.mode("overwrite").parquet(args.quarantine)
        summary["n_quarantined"] = (
            spark.read.parquet(args.quarantine).count())
    print(json.dumps(summary))
    res.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
