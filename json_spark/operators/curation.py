"""Corpus-curation operators: deterministic stratified sampling, heavy
hitters, robust (median/MAD) outlier detection, and the end-to-end
filter→dedup→split curation funnel.

Everything is pure Column expressions + built-in aggregates — no Python in
any hot path — and every randomized-looking decision is the cross-engine
md5 bucket (operators/packing.py:hash32), so DuckDB oracles reproduce each
sampled row and split assignment bit-for-bit, and re-running on a grown
corpus never flips a previous decision.

Scale shapes:
- stratified_sample : map-only filter — ZERO shuffle; the rate lookup is a
                      when-chain (a broadcast-joined rate dim would also
                      work but pays a join for nothing at 5 strata).
- heavy_hitters     : explode → partial+final hash aggregate shrinks the
                      stream to vocabulary size BEFORE the top-k window;
                      the window partitions by group, so no single-task
                      global sort ever sees raw rows.
- robust_outliers   : 3 passes by construction (median → MAD needs the
                      median → outlier count needs both), each a map-side-
                      combinable agg + broadcast join of a |groups|-row dim.
                      ``approx=True`` swaps exact ``percentile`` (buffers a
                      group's values — fine per-partition, OOM at 10^12
                      rows/group) for the mergeable ``percentile_approx``
                      sketch: the production path at clip scale.
- weighted_sample   : one (n, Σw) aggregate pass + a map-only filter —
                      inclusion probability ∝ an integer weight, the
                      importance-sampling middle ground between uniform
                      sampling and hard top-k.
- curate_corpus     : one scan computes lang/quality/fingerprint, one
                      shuffle dedups on the fingerprint, the split report
                      aggregates the (already tiny) survivors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .packing import assign_split, hash32
from .text import fingerprint, predict_lang, quality_features, tokens


def stratified_sample(df: DataFrame, id_col: str, stratum_col: str,
                      rates_per_mille: dict[str, int],
                      default_per_mille: int = 0,
                      salt: str = "sample:") -> DataFrame:
    """Keep a deterministic per-stratum fraction of rows: row survives iff
    its id's md5 bucket (0..999) falls below the stratum's rate. The
    classic corpus-rebalancing primitive (downsample the head language,
    keep the tail) with exactly reproducible membership — no RNG, no
    state, stable under corpus growth and re-partitioning.
    """
    bucket = F.pmod(hash32(F.col(id_col), salt), F.lit(1000))
    rate: Column = F.lit(int(default_per_mille))
    for stratum, per_mille in rates_per_mille.items():
        rate = F.when(F.col(stratum_col) == stratum,
                      F.lit(int(per_mille))).otherwise(rate)
    return df.filter(bucket < rate)


def heavy_hitters(df: DataFrame, group_cols: list[str], item_col: str,
                  k: int) -> DataFrame:
    """Top-``k`` most frequent ``item_col`` values per group, exact.

    Count first (partial+final hash aggregate — the map-side combine is
    what makes this viable over exploded token streams), then rank within
    each group over the aggregated table, which is vocabulary-sized, not
    corpus-sized. Ties break on the item value so the result is total-
    order deterministic. ``rk`` is cast to long (Spark's row_number is
    int32; DuckDB's is int64).
    """
    counts = df.groupBy(*group_cols, item_col).agg(
        F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy(*group_cols).orderBy(F.desc("n"), item_col)
    return (counts
            .withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= k))


def token_heavy_hitters(df: DataFrame, text_col: str,
                        group_cols: list[str], k: int) -> DataFrame:
    """heavy_hitters over the exploded whitespace-token stream."""
    toks = df.select(*group_cols,
                     F.explode(tokens(F.col(text_col))).alias("tok"))
    return heavy_hitters(toks, group_cols, "tok", k)


def robust_outliers(df: DataFrame, value_col: str, group_cols: list[str],
                    z: float = 3.0, approx: bool = False) -> DataFrame:
    """Per-group robust outlier report via the median/MAD z-score:
    a row is an outlier when ``|x - median| > z * 1.4826 * MAD``
    (1.4826 rescales MAD to sigma under normality — the standard robust
    z-score, immune to the outliers it is hunting, unlike mean/stddev).

    Emits (group_cols..., n, median_value, mad, n_outliers). Exact mode
    matches DuckDB ``quantile_cont`` (both engines linearly interpolate
    over the sorted values); ``approx=True`` is the 10^12-row path — the
    percentile_approx sketch is mergeable, so no executor ever buffers a
    whole group.
    """
    def pct(c, p: float) -> Column:
        if approx:
            return F.percentile_approx(c, F.lit(p), F.lit(10_000))
        return F.percentile(c, F.lit(p))

    med = df.groupBy(*group_cols).agg(
        pct(F.col(value_col), 0.5).alias("__med"))
    dev = (df.join(F.broadcast(med), group_cols)
           .withColumn("__dev", F.abs(F.col(value_col) - F.col("__med"))))
    mad = dev.groupBy(*group_cols).agg(
        F.first("__med").alias("__med"),
        pct(F.col("__dev"), 0.5).alias("__mad"))
    return (dev.drop("__med").join(F.broadcast(mad), group_cols)
            .groupBy(*group_cols).agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.first("__med"), 6).alias("median_value"),
                F.round(F.first("__mad"), 6).alias("mad"),
                F.sum((F.col("__dev") > F.lit(z) * F.lit(1.4826)
                       * F.col("__mad")).cast("long")).alias("n_outliers")))


def curate_corpus(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  min_quality: float = 0.5) -> DataFrame:
    """End-to-end curation funnel — the composition a training-data
    pipeline actually runs: language-ID gate (drop 'und') → quality-score
    gate → exact dedup on the rolling fingerprint (keep the smallest id) →
    deterministic train/val/test split → per-split composition report
    (n_docs, token mass).

    Every stage is deterministic shared-arithmetic (marker-word argmax,
    fixed-formula score, md5 split bucket), so the DuckDB oracle replays
    the entire funnel bit-for-bit. One scan computes all per-doc features;
    the only corpus-sized shuffle is the fingerprint dedup.
    """
    c = F.col(text_col)
    q = quality_features(c)
    kept = (docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(c)).alias("n_tokens"),
        fingerprint(c).alias("fp"),
        q["quality_score"].alias("score"),
        predict_lang(c).alias("pl"))
        .filter((F.col("pl") != "und") & (F.col("score") >= min_quality)))
    dedup = kept.groupBy("fp").agg(
        F.min("doc_id").alias("doc_id"),
        F.min("n_tokens").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_copies"))
    return (dedup.withColumn("split", assign_split(F.col("doc_id")))
            .groupBy("split").agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").alias("sum_tokens"),
                F.sum(F.col("n_copies") - 1).alias("n_dups_removed")))


def temperature_sample(df: DataFrame, id_col: str, stratum_col: str,
                       alpha: float = 0.5, keep_frac: float = 0.5,
                       salt: str = "temp:",
                       buckets: int = 1 << 20) -> tuple[DataFrame, DataFrame]:
    """Temperature sampling (the mT5/XLM-R multilingual balancing rule):
    strata are re-weighted q_s ∝ p_s^alpha so head languages shrink and
    tail languages keep more of their mass, with an overall kept budget
    of ``keep_frac`` of the corpus. Membership is the deterministic md5
    bucket of the id against a per-stratum integer threshold — no RNG,
    reproducible and stable under re-partitioning, like
    :func:`stratified_sample` (whose rates are hand-set; here they are
    DERIVED from the measured distribution).

    Cross-engine determinism: alpha=0.5 evaluates via IEEE ``sqrt`` (not
    ``pow``) and the normalizer Z folds the stratum weights SEQUENTIALLY
    in lexical stratum order (``F.aggregate`` over a sorted struct array
    ↔ DuckDB ``list_reduce`` over ``list(... ORDER BY ...)``), so every
    intermediate double — and therefore every integer threshold — is
    bit-identical in a DuckDB replay. Other alphas use ``pow``, whose
    last-ulp may differ across libm builds (documented trade-off).

    Scale shape: the corpus is scanned exactly TWICE — once for the
    stratum histogram (a partial+final hash aggregate), once for the
    membership filter (broadcast join + map-side hash compare). The
    histogram, bounded by stratum cardinality (#languages, not #rows),
    is collected once and re-entered as a literal frame; without that
    the threshold derivation re-runs the corpus aggregate for every
    downstream reuse of ``rates`` (measured: 8 corpus scans in the
    report query at 10^12-row cost, vs 2 after).

    Returns (kept_rows, rates) where rates carries per-stratum
    (stratum, n_before, thresh).
    """
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n"))
    counts = df.sparkSession.createDataFrame(counts.collect(),
                                             schema=counts.schema)
    tot = counts.agg(F.sum("__n").alias("__tot"))
    c = counts.crossJoin(F.broadcast(tot))  # stratum-sized × 1 row
    p = F.col("__n") / F.col("__tot")
    w = F.sqrt(p) if alpha == 0.5 else F.pow(p, F.lit(alpha))
    cw = c.withColumn("__w", w)
    z = cw.agg(F.aggregate(
        F.array_sort(F.collect_list(
            F.struct(F.col(stratum_col).alias("s"), F.col("__w").alias("w")))),
        F.lit(0.0), lambda acc, x: acc + x["w"]).alias("__z"))
    rate = F.least(
        F.lit(1.0),
        (F.lit(keep_frac) * F.col("__tot")) * (F.col("__w") / F.col("__z"))
        / F.col("__n"))
    rates = (cw.crossJoin(F.broadcast(z))
             .select(F.col(stratum_col),
                     F.col("__n").alias("n_before"),
                     F.floor(rate * F.lit(float(buckets)))
                     .cast("long").alias("thresh")))
    from .packing import hash32
    bucket = F.pmod(hash32(F.col(id_col), salt), F.lit(buckets))
    kept = (df.join(F.broadcast(rates.select(stratum_col, "thresh")),
                    stratum_col)
            .filter(bucket < F.col("thresh"))
            .drop("thresh"))
    return kept, rates


def weighted_sample(df: DataFrame, id_col: str, weight_col: str,
                    keep_frac: float = 0.25, salt: str = "wsample:",
                    buckets: int = 1 << 20) -> DataFrame:
    """Deterministic Bernoulli sampling with inclusion probability
    proportional to an integer weight column.

    The curation primitive between uniform sampling (every row equal)
    and hard top-k filtering: each row survives with probability

        p_i = min(1, keep_frac · w_i · n / Σw)

    so the expected kept fraction is ``keep_frac`` of ROWS while the
    kept mass is tilted toward heavy rows — e.g. weight = token count
    keeps long documents preferentially without discarding short ones
    outright (importance sampling for training-mix construction).

    Membership is the md5 bucket of the id against a per-row integer
    threshold — no RNG, reproducible, stable under re-partitioning and
    corpus growth, like :func:`stratified_sample` /
    :func:`temperature_sample`.

    Cross-engine determinism: the weight is summed as a LONG (exact,
    order-free — a double Σw would depend on summation order across
    10^12 rows), and p_i is the pinned IEEE chain
    ``((keep_frac · w) · n) / Σw`` on doubles, so every integer
    threshold replays bit-identically in SQL. Weights must be
    non-negative integers (token counts, byte sizes); w_i = 0 rows are
    never kept.

    Scale shape: ONE aggregate pass for (n, Σw) — map-combinable sums,
    1-row result — broadcast back via crossJoin, then a map-only
    filter. Two scans total, zero data-sized shuffles.
    """
    tot = df.agg(F.count(F.lit(1)).alias("__n"),
                 F.sum(F.col(weight_col).cast("long")).alias("__sw"))
    w = F.col(weight_col).cast("double")
    p = F.least(
        F.lit(1.0),
        ((F.lit(float(keep_frac)) * w) * F.col("__n").cast("double"))
        / F.col("__sw").cast("double"))
    thresh = F.floor(p * F.lit(float(buckets))).cast("long")
    bucket = F.pmod(hash32(F.col(id_col), salt), F.lit(buckets))
    return (df.crossJoin(F.broadcast(tot))
            .where(bucket < thresh)
            .drop("__n", "__sw"))


def group_cap(df: DataFrame, group_cols: list[str],
              order_cols: list[Column], k: int) -> DataFrame:
    """Keep at most ``k`` rows per group, chosen by a preference order —
    the per-domain/per-source CAP every web-scale corpus applies so one
    crawler-friendly site cannot dominate the training mix (the quota
    complement of :func:`stratified_sample`'s rate-based rebalance:
    a cap bounds the group absolutely, a rate only scales it).

    ``order_cols`` must be a TOTAL order (end it with the id column) or
    the kept set is nondeterministic at the cap boundary.

    Scale shape: ``row_number`` over (group, order) with the ``<= k``
    filter directly on it compiles to Spark's WindowGroupLimit, which
    pushes the limit below the exchange — every task pre-selects its
    local top-k per group BEFORE the shuffle (asserted in
    tests/test_curation.py), so the exchange carries at most
    tasks×k rows per group, never the group's full mass — the hot-domain
    skew bound falls out of the plan itself.
    """
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order_cols)
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= int(k))
            .drop("__rn"))


def corpus_mix(df: DataFrame, id_col: str, stratum_col: str,
               rates: dict[str, float], default_rate: float = 1.0,
               salt: str = "mix:", buckets: int = 1 << 20) -> DataFrame:
    """Deterministic training-mix construction with UPSAMPLING: each row
    is emitted ``floor(rate)`` times, plus one more iff its md5 bucket
    falls below the fractional part of its stratum's rate — so a rate of
    2.25 means every row appears twice and a deterministic quarter of
    rows appear a third time (expected output mass = rate × input mass,
    exact in the bucket limit).

    This is the mixing step of every LLM data recipe — epochs > 1 for
    scarce high-quality sources (books, reference text), < 1 to
    downsample bulk crawl — realized without RNG: membership of the
    fractional copy is the same md5-bucket arithmetic as
    :func:`stratified_sample`, so the mix is reproducible, stable under
    corpus growth, and every emitted copy is attributable. Rate 0 drops
    the stratum entirely.

    The output carries an ``epoch`` column (0-based copy index) so
    downstream shuffling/packing can salt on (id, epoch) and repeated
    copies land in different batches rather than adjacent ones.

    Scale shape: map-only rate lookup (a when-chain over the handful of
    strata) + a bounded ``explode(sequence(...))`` fan-out of at most
    ``ceil(rate)`` copies per row — ZERO shuffles; rows with
    n_copies = 0 are filtered BEFORE the sequence so the
    sequence(0, -1) step-direction trap never fires.
    """
    bad = {s: r for s, r in {**rates, "<default>": default_rate}.items()
           if r < 0}
    if bad:
        raise ValueError(f"corpus_mix rates must be >= 0, got {bad}")
    rate: Column = F.lit(float(default_rate))
    for stratum, r in rates.items():
        rate = F.when(F.col(stratum_col) == stratum,
                      F.lit(float(r))).otherwise(rate)
    whole = F.floor(rate).cast("long")
    frac_thresh = F.floor((rate - F.floor(rate)) * F.lit(float(buckets))
                          ).cast("long")
    bucket = F.pmod(hash32(F.col(id_col), salt), F.lit(buckets))
    n_copies = whole + F.when(bucket < frac_thresh, F.lit(1)).otherwise(
        F.lit(0)).cast("long")
    return (df.withColumn("__n_copies", n_copies)
            .where(F.col("__n_copies") > 0)
            .withColumn("epoch",
                        F.explode(F.sequence(F.lit(0).cast("long"),
                                             F.col("__n_copies") - 1)))
            .drop("__n_copies"))
