"""Functional-dependency profiling: does column A determine column B?

The schema-inference side of validation (Metanome-style FD checking,
scoped to candidate pairs): for each declared candidate ``lhs → rhs``
report how many lhs groups exist, how many violate (|distinct rhs| > 1),
and the worst violation width. A clean key column shows up as
0 violations with rhs = anything; a "should-be-determined" attribute
that drifts (same clip_id, two sample rates) shows up immediately.

Scale shape: ONE pass per candidate — groupBy(lhs) with
``countDistinct(rhs)`` runs as Spark's two-phase distinct aggregate
(partial distinct map-side, so the shuffle carries (lhs, rhs) pairs
deduplicated per task, never raw rows). Candidates are unioned into one
result frame; each is an independent branch of the same scan when the
source caches, or independent pruned scans otherwise — either way no
candidate pays for another's columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column value-distribution profile: (col_name, n_rows, n_null,
    n_distinct, top_share, entropy_bits) — the at-a-glance table a
    validation run prints before anything else. ``top_share`` is the most
    frequent value's fraction (a 0.99 means the column is near-constant);
    ``entropy_bits`` is Shannon entropy of the value distribution
    (0 for constants, log2(n_distinct) for uniform).

    One pass per column: groupBy(value) hash aggregate (map-side
    combine), then ONE plain aggregate over the value-count table. NULL
    is profiled as its own value for the counts but excluded from
    entropy/top_share.

    Entropy is computed by the algebraic identity
    ``H = log2(N) - (Σ n·log2 n) / N`` so the whole profile is
    map-combinable partial aggregation — no ``Window.partitionBy()``
    (which would collapse a high-cardinality count table, e.g. an
    id-like column whose count table is corpus-sized, into ONE task).
    """
    outs = []
    for c in cols:
        vc = df.groupBy(F.col(c).alias("__v")).agg(
            F.count(F.lit(1)).alias("__n"))
        nn = F.when(F.col("__v").isNotNull(), F.col("__n"))
        raw = vc.agg(
            F.sum("__n").alias("n_rows"),
            F.coalesce(F.sum(F.when(F.col("__v").isNull(), F.col("__n"))),
                       F.lit(0).cast("long")).alias("n_null"),
            F.count(nn).alias("n_distinct"),
            F.max(nn).alias("__max_n"),
            F.sum(nn * F.log2(nn)).alias("__sum_nlog"),
            F.sum(nn).alias("__nn_tot"))
        outs.append(raw.select(
            F.lit(c).alias("col_name"),
            "n_rows", "n_null", "n_distinct",
            F.round(F.col("__max_n") / F.col("__nn_tot"), 6)
            .alias("top_share"),
            F.round(F.coalesce(
                F.log2("__nn_tot")
                - F.col("__sum_nlog") / F.col("__nn_tot"),
                F.lit(0.0)), 6).alias("entropy_bits")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def fd_profile(df: DataFrame,
               candidates: list[tuple[str, str]]) -> DataFrame:
    """One row per candidate FD: (lhs, rhs, n_groups, n_violating,
    max_distinct, holds)."""
    outs = []
    for lhs, rhs in candidates:
        g = (df.select(lhs, rhs)
             .groupBy(lhs)
             .agg(F.countDistinct(rhs).alias("__d")))
        outs.append(g.agg(
            F.lit(lhs).alias("lhs"),
            F.lit(rhs).alias("rhs"),
            F.count(F.lit(1)).alias("n_groups"),
            F.sum((F.col("__d") > 1).cast("long")).alias("n_violating"),
            F.max("__d").alias("max_distinct"),
            (F.max("__d") <= 1).alias("holds")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def key_emergence(df: DataFrame, keys_col: str, bucket_col: str) -> DataFrame:
    """Schema-evolution detection over embedded JSON: when did each key
    first and last appear, relative to the corpus's time span?

    The d3rty theme's temporal complement: the reference tolerates key
    DRIFT within one document (case conventions, unknown-field skip);
    this detects key drift ACROSS TIME — a producer that starts emitting
    a new field (``EMERGENT``), stops emitting an old one (``RETIRED``),
    or ran an experiment field for a while (``WINDOWED``). Per-row rules
    cannot see any of these: every individual document is valid.

    Inputs: ``keys_col`` — an ``array<string>`` of the document's JSON
    keys (e.g. ``F.json_object_keys(props)``; null for unparseable docs,
    which simply contribute no keys); ``bucket_col`` — an integer time
    bucket (epoch-days via ``epoch_us(ts) DIV 86400000000``, the
    session-TZ-proof idiom shared with coverage_gaps).

    Emits one row per key: first_seen / last_seen buckets, days_present,
    n_docs, and the status verdict against the corpus span. All values
    are exact integers, so a DuckDB oracle reproduces them bit-for-bit.

    Scale shape at 10^12 docs: explode collapses in ONE map-combinable
    (key, bucket) hash aggregate (the only corpus-sized exchange beside
    the 1-row span aggregate); everything downstream is
    |keys| x |buckets| and the span joins back as a 1-row broadcast.
    """
    kd = (df.select(F.explode(F.col(keys_col)).alias("key"),
                    F.col(bucket_col).alias("__b"))
          .groupBy("key", "__b").agg(F.count(F.lit(1)).alias("__n")))
    span = df.select(F.min(bucket_col).alias("__lo"),
                     F.max(bucket_col).alias("__hi"))
    per = kd.groupBy("key").agg(
        F.min("__b").alias("first_seen"),
        F.max("__b").alias("last_seen"),
        F.count(F.lit(1)).alias("days_present"),
        F.sum("__n").alias("n_docs"))
    emergent = F.col("first_seen") > F.col("__lo")
    retired = F.col("last_seen") < F.col("__hi")
    return (per.join(F.broadcast(span))
            .select("key", "first_seen", "last_seen", "days_present",
                    "n_docs",
                    F.when(emergent & retired, "WINDOWED")
                    .when(emergent, "EMERGENT")
                    .when(retired, "RETIRED")
                    .otherwise("STABLE").alias("status")))


#: Benford's-law expected first-digit shares log10(1 + 1/d), precomputed
#: once in Python and injected as LITERALS into both the Spark plan and
#: the DuckDB oracle — no runtime log10, so engine libm differences
#: cannot exist by construction.
BENFORD_SHARES = {
    1: 0.3010299956639812, 2: 0.17609125905568124, 3: 0.12493873660829992,
    4: 0.09691001300805642, 5: 0.07918124604762482, 6: 0.06694678963061322,
    7: 0.05799194697768673, 8: 0.05115252244738129, 9: 0.04575749056067514,
}

#: Nigrini's mean-absolute-deviation conformity bands for first digits.
BENFORD_MAD_YELLOW = 0.012   # above: marginal conformity
BENFORD_MAD_RED = 0.015      # above: nonconformity


def first_digit(c: "F.Column", min_decade: int = -6,
                max_decade: int = 12) -> "F.Column":
    """First significant decimal digit of |c| as a pure when-chain over
    decades — floor(|c| / 10^k) for the k with 10^k <= |c| < 10^(k+1).
    Deliberately NO log10 and NO double→string rendering: libm boundary
    rounding and decimal formatting both differ across engines, while
    powers of ten up to 1e22 and floor/compare are exact IEEE ops every
    engine performs identically. Values of 0/null (no first digit) or
    outside the decade range yield null.
    """
    a = F.abs(c)
    out = F.lit(None).cast("long")
    for k in range(min_decade, max_decade + 1):
        lo, hi = float(10.0 ** k), float(10.0 ** (k + 1))
        out = F.when((a >= lo) & (a < hi),
                     F.floor(a / F.lit(lo)).cast("long")).otherwise(out)
    return out


def benford_profile(df: DataFrame, col: str) -> DataFrame:
    """Benford's-law conformity of a numeric column's first significant
    digits — the classic detector for fabricated, truncated, or
    unit-mangled numeric feeds (naturally occurring multi-decade data
    follows log10(1+1/d); uniform or manually-entered data does not).

    Emits one row per digit 1-9 (zero-count digits grid-completed, so
    the deviation statistic cannot silently shrink): n, share, the
    expected Benford share, abs_dev — plus the global mean absolute
    deviation and its Nigrini-band verdict (GREEN conforming /
    YELLOW marginal >0.012 / RED nonconforming >0.015) repeated on
    each row. A uniform fixture column lands RED by design — the
    check's job is to say so.

    Scale shape: ONE map-combinable 9-row hash aggregate over the
    corpus; the digit grid, shares, MAD, and verdict are all
    literal-sized arithmetic after it (broadcast joins, no windows).
    """
    spark = df.sparkSession
    counts = (df.select(first_digit(F.col(col)).alias("digit"))
              .filter(F.col("digit").isNotNull())
              .groupBy("digit").agg(F.count(F.lit(1)).alias("n")))
    # 9-row grid built JVM-side (range + when-chain of the precomputed
    # literals) — keeps the plan free of any Python RDD scan
    expected = F.lit(None).cast("double")
    for d in range(1, 10):
        expected = F.when(F.col("digit") == d,
                          F.lit(BENFORD_SHARES[d])).otherwise(expected)
    grid = (spark.range(1, 10).select(F.col("id").alias("digit"))
            .withColumn("expected", expected))
    full = (grid.join(counts, "digit", "left")
            .select("digit", "expected",
                    F.coalesce("n", F.lit(0)).alias("n")))
    tot = full.agg(F.sum("n").alias("__tot"))
    dev = (full.join(F.broadcast(tot))
           .select("digit", "n", "expected",
                   (F.col("n") / F.col("__tot")).alias("__share")))
    dev = dev.withColumn("__adev", F.abs(F.col("__share") - F.col("expected")))
    mad = dev.agg((F.sum("__adev") / F.lit(9.0)).alias("__mad"))
    return (dev.join(F.broadcast(mad))
            .select("digit", "n",
                    F.round("__share", 6).alias("share"),
                    F.round("expected", 6).alias("expected"),
                    F.round("__adev", 6).alias("abs_dev"),
                    F.round("__mad", 6).alias("mad"),
                    F.when(F.col("__mad") > BENFORD_MAD_RED, "RED")
                    .when(F.col("__mad") > BENFORD_MAD_YELLOW, "YELLOW")
                    .otherwise("GREEN").alias("verdict")))


def file_profile(df: DataFrame,
                 path_col: str = "_metadata.file_path") -> DataFrame:
    """Physical-layout audit of a file-backed scan: per-file row counts
    collapsed into one report row — (n_files, n_rows, min_file_rows,
    max_file_rows, skew = max / mean). The table-maintenance view a
    100 TB lakehouse needs before every heavy read: thousands of tiny
    files mean the scan is task-scheduling-bound (compact them), one
    giant file means a straggler (split it), skew ≫ 1 means both.

    ``df`` must come straight from a file source so Spark's hidden
    ``_metadata`` struct is still addressable (any projection keeps it
    alive; a join/agg drops it). Works on parquet/orc/json/csv sources
    alike — the column is source-provided, not parsed from
    ``input_file_name()`` strings.

    Scale shape: groupBy(file_path) is map-combinable counting whose
    key cardinality IS the file count, then a single-row final
    aggregate — the shuffle carries one (path, count) pair per file per
    task, never rows. The mean in the skew ratio is the pinned IEEE
    chain max / (sum / count) so SQL twins replay it bit-identically.
    """
    per_file = (df.groupBy(F.col(path_col).alias("__file"))
                .agg(F.count(F.lit(1)).alias("__n")))
    return per_file.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("__n").alias("n_rows"),
        F.min("__n").alias("min_file_rows"),
        F.max("__n").alias("max_file_rows"),
        F.round(F.max("__n").cast("double")
                / (F.sum("__n").cast("double")
                   / F.count(F.lit(1)).cast("double")), 6).alias("skew"))


def compaction_plan(df: DataFrame, target_rows: int,
                    partition_cols: list[str],
                    path_col: str = "_metadata.file_path") -> DataFrame:
    """Small-file compaction PLAN for a partitioned file layout — the
    action that follows :func:`file_profile`'s diagnosis. Within each
    table partition, files are ordered largest-first and packed
    greedily into bins of ~``target_rows`` by a running row-count
    cumsum: ``bin = (cum_before_this_file) DIV target``. Each bin is
    one rewrite task (a bin holding a single already-big file is a
    no-op). The report row per table partition: files before/after,
    total rows, how many bins actually merge (>1 source file), and the
    largest planned output (straggler bound for the rewrite job).

    Bin assignment is deterministic up to ties in the per-file row
    count, and the REPORT is exactly deterministic: files with equal
    counts are interchangeable under the cumsum, so the multiset of bin
    sizes — and every aggregate over it — is order-invariant. That is
    what lets an independent SQL twin replay the plan from the row
    counts alone, with no knowledge of file names.

    Scale shape: the groupBy(file) count is map-combinable with key
    cardinality = file count; everything after runs on the
    METADATA-sized per-file table — the window is partitioned by the
    table-partition key (never global), so the plan for a million-file
    table is a million-row problem regardless of data volume.
    """
    per_file = (df.groupBy(*partition_cols, F.col(path_col).alias("__file"))
                .agg(F.count(F.lit(1)).alias("__n")))
    w = (Window.partitionBy(*partition_cols).orderBy(F.desc("__n"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    assigned = (per_file
                .withColumn("__cum", F.sum("__n").over(w))
                .withColumn("__bin", F.expr(
                    f"(__cum - __n) DIV {int(target_rows)}")))
    bins = assigned.groupBy(*partition_cols, "__bin").agg(
        F.count(F.lit(1)).alias("__nf"),
        F.sum("__n").alias("__rows"))
    return bins.groupBy(*partition_cols).agg(
        F.sum("__nf").alias("n_files_before"),
        F.sum("__rows").alias("n_rows"),
        F.count(F.lit(1)).alias("n_files_after"),
        F.sum((F.col("__nf") > 1).cast("long")).alias("n_merge_tasks"),
        F.max("__rows").alias("max_bin_rows"))


#: schema_of_variant renders integers at the smallest fitting width and
#: decimal literals as DECIMAL(p,s) — normalize every spelling to the
#: seven JSON type names so the profile is engine-neutral.
def json_value_type(val_col: Column) -> Column:
    """JSON type of a raw JSON value string, classified by Spark's
    VARIANT engine (``schema_of_variant(parse_json(...))``) — a genuine
    second implementation against any SQL twin's ``json_type()``:
    different parser, different type lattice, normalized to the same
    seven names (integer, double, string, boolean, null, array,
    object). Malformed input yields null (try_parse_json)."""
    t = F.schema_of_variant(F.try_parse_json(val_col))
    return (F.when(t.startswith("OBJECT") | t.startswith("STRUCT"),
                   "object")
            .when(t.startswith("ARRAY"), "array")
            .when(t == "STRING", "string")
            .when(t == "BOOLEAN", "boolean")
            .when(t.isin("TINYINT", "SMALLINT", "INT", "BIGINT"),
                  "integer")
            .when(t.startswith("DECIMAL") | t.isin("DOUBLE", "FLOAT"),
                  "double")
            .when(t == "VOID", "null"))


def dominant_type_drift(df: DataFrame, key_col: str, type_col: str,
                        seg_col: str, early: str = "early",
                        late: str = "late") -> DataFrame:
    """Schema-drift detection over embedded JSON VALUES — the type-level
    complement of :func:`key_emergence` (which sees keys appear/retire):
    per key, the dominant JSON value type in the ``early`` segment vs
    the ``late`` segment, flagging keys whose producer silently changed
    representation (ints that became strings, scalars that became
    objects). Every individual document still parses — only the
    cross-time comparison sees it; it is d3rty's coercion tolerance
    turned into a monitor for WHEN tolerance starts being needed.

    Emits one row per key: dominant_early, dominant_late, the dominant
    counts, and ``drifted``. Dominance ties break lexicographically so
    both engines pick the same winner.

    Scale shape: the corpus collapses in ONE map-combinable
    (key, segment, type) hash aggregate; the rank window runs on that
    |keys|x2x7 count table (partitioned by key+segment, never global).
    """
    counts = (df.groupBy(F.col(key_col).alias("key"),
                         F.col(seg_col).alias("__seg"),
                         F.col(type_col).alias("__t"))
              .agg(F.count(F.lit(1)).alias("__n")))
    w = Window.partitionBy("key", "__seg").orderBy(
        F.desc("__n"), F.asc("__t"))
    dom = (counts.withColumn("__rn", F.row_number().over(w))
           .filter(F.col("__rn") == 1))
    e, l = F.col("__seg") == early, F.col("__seg") == late
    out = dom.groupBy("key").agg(
        F.max(F.when(e, F.col("__t"))).alias("dominant_early"),
        F.max(F.when(l, F.col("__t"))).alias("dominant_late"),
        F.max(F.when(e, F.col("__n"))).alias("n_dom_early"),
        F.max(F.when(l, F.col("__n"))).alias("n_dom_late"))
    return out.withColumn(
        "drifted", F.col("dominant_early") != F.col("dominant_late"))


def decade(c: Column, min_decade: int = -6, max_decade: int = 12) -> Column:
    """floor(log10(|c|)) as a pure when-chain over exact IEEE decade
    boundaries — the same no-libm discipline as :func:`first_digit`
    (log10 boundary rounding differs across engines; comparisons
    against exact powers of ten do not). Zero/null/out-of-range yield
    null."""
    a = F.abs(c)
    out = F.lit(None).cast("long")
    for k in range(min_decade, max_decade + 1):
        lo, hi = float(10.0 ** k), float(10.0 ** (k + 1))
        out = F.when((a >= lo) & (a < hi), F.lit(k)).otherwise(out)
    return out


def unit_mixture_check(df: DataFrame, cols: list[str],
                       min_mode_share: float = 0.1,
                       min_gap: int = 3) -> DataFrame:
    """Mixed-units detector: a numeric column whose values cluster in
    TWO well-separated decades is almost always one feed reporting
    seconds where another reports milliseconds (or KB vs bytes, cents
    vs dollars) — the silent unit bug that poisons every aggregate
    while passing range checks row by row (both clusters look
    plausible alone).

    Per column: the decade histogram's top mode, the strongest second
    mode at least ``min_gap`` decades away, and a RED verdict when that
    far mode carries ≥ ``min_mode_share`` of the values — two real
    populations, not stragglers. Everything is exact-integer decade
    counting (pure when-chain, no log10), so an independent SQL twin
    reproduces every share and verdict.

    Scale shape: ONE map-combinable (col, decade) aggregate per column
    (stacked into a single pass); modes and verdicts run on the
    ≤|cols|×19-row decade table. No windows over the corpus.
    """
    entries = [F.struct(F.lit(c).alias("col_name"),
                        decade(F.col(c)).alias("__d")) for c in cols]
    u = df.select(F.inline(F.array(*entries)))
    hist = (u.filter(F.col("__d").isNotNull())
            .groupBy("col_name", "__d")
            .agg(F.count(F.lit(1)).alias("__n")))
    tot = hist.groupBy("col_name").agg(F.sum("__n").alias("__tot"))
    h = hist.join(tot, "col_name").withColumn(
        "__share", F.col("__n") / F.col("__tot"))
    # top mode per column: max share, tie-break lower decade
    top = h.groupBy("col_name").agg(
        F.max_by(F.struct(F.col("__share"), (-F.col("__d")).alias("__md")),
                 F.struct(F.col("__share"), (-F.col("__d")).alias("__md")))
        .alias("__top"))
    top = top.select("col_name",
                     (-F.col("__top.__md")).alias("mode_decade"),
                     F.round("__top.__share", 6).alias("mode_share"))
    far = (h.join(top, "col_name")
           .filter(F.abs(F.col("__d") - F.col("mode_decade")) >= min_gap)
           .groupBy("col_name")
           .agg(F.max_by(F.struct(F.col("__share"),
                                  (-F.col("__d")).alias("__md")),
                         F.struct(F.col("__share"),
                                  (-F.col("__d")).alias("__md")))
                .alias("__far")))
    far = far.select("col_name",
                     (-F.col("__far.__md")).alias("far_decade"),
                     F.round("__far.__share", 6).alias("far_share"))
    out = top.join(far, "col_name", "left")
    return out.select(
        "col_name", "mode_decade", "mode_share",
        "far_decade", F.coalesce("far_share", F.lit(0.0)).alias("far_share"),
        F.when(F.coalesce(F.col("far_share"), F.lit(0.0))
               >= min_mode_share, "RED")
        .otherwise("GREEN").alias("verdict"))
