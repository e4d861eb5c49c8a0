"""json_spark — a PySpark-native schema + constraint validation engine.

Reinterprets the tolerance rules of the reference (d3rty/json, a Go library
for forgiving JSON unmarshalling — see /root/reference) as declarative
column-level constraint predicates compiled to Spark ``Column`` expressions,
evaluated at scale over tables of audio clip + transcript pairs.

Not a port: the reference's reflection decoder (internal/dirtyjson/decoder.go)
is row-at-a-time Go; here every rule becomes a vectorized, whole-stage-codegen
friendly expression, and the Green/Yellow/Red result model
(internal/dirtyjson/result.go:4-18) is lifted from row-level decode quality to
partition-level data-quality verdicts.

Layout
------
- ``json_spark.config``     rule-set dataclasses mirroring internal/config
- ``json_spark.functions``  coercion/key/text/vector Column-expression library
- ``json_spark.operators``  stats, uniqueness, referential, drift, dedup,
                            similarity, SNR, verdict roll-up
- ``json_spark.plans``      ValidationSuite runner + checkpoint ledger
- ``json_spark.streaming``  watermarked windowed verdicts for append-only ingest
- ``json_spark.sources``    table loading (Iceberg-try, parquet fallback)
- ``json_spark.fixtures``   deterministic audio-clip fixture generator
- ``json_spark.cli``        spark-submit entry point (``python -m json_spark``)
"""

__version__ = "0.1.0"

GREEN = "GREEN"
YELLOW = "YELLOW"
RED = "RED"

#: numeric ranks so verdicts roll up with max(): partition is RED if any row
#: is RED, YELLOW if any YELLOW, else GREEN (mirrors result.go color model).
VERDICT_RANK = {GREEN: 0, YELLOW: 1, RED: 2}
RANK_TO_VERDICT = {v: k for k, v in VERDICT_RANK.items()}
