"""Cross-column association & distribution-conformity profiling.

Validation-tier operators that ask not "is this column healthy?" but
"do these columns (or this distribution) relate the way the contract
says they should" — the cross-column complement of the per-column
profile (profiling.py) and the drift metrics (drift.py):

- ``corr_matrix``      — pairwise Pearson correlation + covariance over
  numeric columns, ONE map-combinable aggregate pass (sums / squares /
  cross-products), no window, no second scan.
- ``cramers_v``        — categorical association (chi-squared / Cramér's
  V) between two low-cardinality columns; the corpus collapses in the
  first groupBy, everything after is |a|x|b| rows.
- ``zipf_fit``         — log-log OLS fit of token frequency vs rank over
  the top-K head; a corpus-conformity check (natural text follows
  Zipf with slope ~ -1; template/boilerplate spam and synthetic filler
  flatten or steepen the head).
- ``key_skew_profile`` — shuffle-key skew diagnosis: top-1 share, hot
  ratio, and entropy of the key histogram, all plain aggregates over
  the count table (the same no-global-window shape column_profile uses).
- ``cohen_kappa``      — inter-labeler agreement beyond chance between
  two categorical label columns (declared label vs content-derived, or
  two annotation providers on the same rows); everything after the
  first groupBy runs on the contingency table.
- ``key_comissingness``— pairwise phi coefficient of embedded-JSON key
  *presence*: which optional fields appear / go missing together. The
  reference tolerates unknown/missing keys per document
  (/root/reference/internal/dirtyjson/decoder.go:221-226); this lifts
  that tolerance to a corpus-level structure question.

Scale notes (100 TB): every operator here is a single scan followed by
map-combinable aggregation; intermediates are bounded by the schema
(pairs of columns), the categorical cardinality, or an explicit top-K —
never by the corpus. No Python UDFs, no ``Window.partitionBy()`` over
unbounded tables, no collect of data-sized frames.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def corr_matrix(df: DataFrame, cols: list[str],
                decimals: int = 6) -> DataFrame:
    """Pairwise Pearson correlation + population covariance.

    One aggregate pass: for every unordered pair (a, b) the moments
    n, Σa, Σb, Σa², Σb², Σab are computed over rows where BOTH are
    non-null (pairwise deletion, the standard corr contract), then the
    closed forms

        covar_pop = Σab/n − (Σa/n)(Σb/n)
        corr      = (nΣab − ΣaΣb) / sqrt((nΣa²−(Σa)²)(nΣb²−(Σb)²))

    are evaluated on the single result row and exploded to one row per
    pair. All moments are map-combinable sums → partial aggregation on
    every executor, one 1-row exchange. Output rows = C(|cols|, 2),
    bounded by the schema.
    """
    aggs: list[Column] = []
    for a, b in combinations(cols, 2):
        both = F.col(a).isNotNull() & F.col(b).isNotNull()
        x = F.when(both, F.col(a).cast("double"))
        y = F.when(both, F.col(b).cast("double"))
        tag = f"{a}__{b}"
        aggs += [
            F.count(x).alias(f"n__{tag}"),
            F.sum(x).alias(f"sx__{tag}"),
            F.sum(y).alias(f"sy__{tag}"),
            F.sum(x * x).alias(f"sxx__{tag}"),
            F.sum(y * y).alias(f"syy__{tag}"),
            F.sum(x * y).alias(f"sxy__{tag}"),
        ]
    one = df.agg(*aggs)

    pair_structs = []
    for a, b in combinations(cols, 2):
        tag = f"{a}__{b}"
        n = F.col(f"n__{tag}").cast("double")
        sx, sy = F.col(f"sx__{tag}"), F.col(f"sy__{tag}")
        sxx, syy = F.col(f"sxx__{tag}"), F.col(f"syy__{tag}")
        sxy = F.col(f"sxy__{tag}")
        cov = sxy / n - (sx / n) * (sy / n)
        den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        corr = F.when(den > 0, (n * sxy - sx * sy) / den)
        pair_structs.append(F.struct(
            F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
            F.col(f"n__{tag}").alias("n_pairs"),
            F.round(cov, decimals).alias("covar_pop"),
            F.round(corr, decimals).alias("corr"),
        ))
    return one.select(F.inline(F.array(*pair_structs)))


def cramers_v(df: DataFrame, col_a: str, col_b: str,
              decimals: int = 6) -> DataFrame:
    """Chi-squared association between two categorical columns.

    The corpus collapses in the first ``groupBy(a, b).count()``;
    marginals, the full r×c cell grid (zero-observed cells included —
    they contribute their expected count to chi²), chi², dof and
    Cramér's V are all computed on that contingency table, whose size
    is bounded by the categorical cardinalities, not the corpus.
    Null categories participate as their own level (validation wants
    missingness association too).
    """
    a, b = F.col(col_a), F.col(col_b)
    cont = (df.select(F.coalesce(a.cast("string"), F.lit("<null>"))
                      .alias("__a"),
                      F.coalesce(b.cast("string"), F.lit("<null>"))
                      .alias("__b"))
            .groupBy("__a", "__b").count())
    row_m = cont.groupBy("__a").agg(F.sum("count").alias("__ra"))
    col_m = cont.groupBy("__b").agg(F.sum("count").alias("__cb"))
    # full grid: every (a-level, b-level), observed count defaulted to 0
    grid = (row_m.crossJoin(col_m)
            .join(cont, ["__a", "__b"], "left")
            .withColumn("count", F.coalesce("count", F.lit(0))))
    tot = cont.agg(F.sum("count").alias("__n"),
                   F.countDistinct("__a").alias("__r"),
                   F.countDistinct("__b").alias("__c"))
    g = grid.crossJoin(F.broadcast(tot))
    exp = F.col("__ra") * F.col("__cb") / F.col("__n")
    cell = (F.col("count") - exp) * (F.col("count") - exp) / exp
    out = (g.agg(
        F.first(F.lit(col_a)).alias("col_a"),
        F.first(F.lit(col_b)).alias("col_b"),
        F.first("__n").alias("n_rows"),
        F.first((F.col("__r") - 1) * (F.col("__c") - 1)).alias("dof"),
        F.sum(cell).alias("__chi2"),
        F.first(F.least(F.col("__r"), F.col("__c")) - 1).alias("__k"),
    ))
    return out.select(
        "col_a", "col_b", "n_rows", "dof",
        F.round("__chi2", decimals).alias("chi2"),
        F.round(F.sqrt(F.col("__chi2") / F.col("n_rows") / F.col("__k")),
                decimals).alias("cramers_v"))


def zipf_fit(df: DataFrame, text_col: str, top_k: int = 1000,
             decimals: int = 6) -> DataFrame:
    """OLS fit of ln(count) vs ln(rank) over the top-K token head.

    Natural-language corpora follow Zipf's law (slope ≈ −1 over the
    head); template spam, synthetic filler, or a broken tokenizer bend
    the line. Shape: explode collapses in ONE map-combinable token
    count; the head is taken with orderBy(...).limit(K) — Spark plans
    TakeOrderedAndProject (per-partition top-K + a K-row reduce), never
    a full sort; ranking and the OLS moments then run on K rows. Tie
    order is pinned by (count DESC, token ASC) on both engines.
    """
    toks = (df.select(F.explode(F.split(F.col(text_col), " "))
                      .alias("tok"))
            .where(F.col("tok") != ""))
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    head = counts.orderBy(F.desc("cnt"), F.asc("tok")).limit(top_k)
    # K rows from here on — the coalesce(1) sort inside row_number is
    # bounded by top_k, not the vocabulary.
    from pyspark.sql.window import Window
    w = Window.orderBy(F.desc("cnt"), F.asc("tok"))
    ranked = head.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"))
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"))
    n = F.col("n").cast("double")
    sx, sy, sxx, syy, sxy = (F.col(c) for c in
                             ("sx", "sy", "sxx", "syy", "sxy"))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2num = (n * sxy - sx * sy) * (n * sxy - sx * sy)
    r2den = (n * sxx - sx * sx) * (n * syy - sy * sy)
    return m.select(
        F.col("n").alias("n_ranks"),
        F.round(slope, decimals).alias("slope"),
        F.round(intercept, decimals).alias("intercept"),
        F.round(r2num / r2den, decimals).alias("r2"))


def key_skew_profile(df: DataFrame, key_cols: list[str],
                     decimals: int = 6) -> DataFrame:
    """Shuffle-key skew diagnosis for prospective join/agg keys.

    For each candidate key column: distinct-key count, the heaviest
    key's row count and share, the hot ratio max_cnt/(n_rows/n_keys)
    (1.0 = perfectly uniform), and the entropy of the key histogram in
    bits plus its normalized form entropy/log2(n_keys) (1.0 = uniform).
    A key with top-share ≫ 1/n_keys or norm_entropy ≪ 1 will straggle
    a shuffle at scale — this is the pre-flight check that decides
    salting / AQE skew-join before the expensive job runs.

    Shape per column: one map-combinable count aggregate (corpus →
    cardinality rows), then ONE plain aggregate over the count table —
    entropy via log2(N) − (Σ n·log2 n)/N, max and sums likewise; no
    global window anywhere (the column_profile lesson, VERDICT r2 #2).
    Nulls are excluded (they never co-locate as a join key).
    """
    outs = []
    for k in key_cols:
        counts = (df.where(F.col(k).isNotNull())
                  .groupBy(k).agg(F.count(F.lit(1)).alias("cnt")))
        agg = counts.agg(
            F.sum("cnt").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("cnt").alias("max_cnt"),
            F.sum(F.col("cnt").cast("double")
                  * F.log2(F.col("cnt").cast("double"))).alias("snln"))
        n = F.col("n_rows").cast("double")
        kk = F.col("n_keys").cast("double")
        entropy = F.log2(n) - F.col("snln") / n
        outs.append(agg.select(
            F.lit(k).alias("key_col"),
            "n_rows", "n_keys", "max_cnt",
            F.round(F.col("max_cnt") / n, decimals).alias("top1_share"),
            F.round(F.col("max_cnt") / (n / kk), decimals)
            .alias("hot_ratio"),
            F.round(entropy, decimals).alias("entropy_bits"),
            F.round(F.when(kk > 1, entropy / F.log2(kk)), decimals)
            .alias("norm_entropy")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def cohen_kappa(df: DataFrame, col_a: str, col_b: str,
                decimals: int = 6) -> DataFrame:
    """Inter-labeler agreement beyond chance (Cohen's kappa).

    Two categorical label columns over the same rows — a declared
    provider label vs a content-derived one (e.g. the stored ``lang``
    vs ``predict_lang(text)``), or two annotation vendors on the same
    clips. Raw agreement po overstates consensus when the label
    distribution is skewed; kappa subtracts the chance-agreement floor:

        po    = Σ_diag c / n
        pe    = Σ_label ra(label)·cb(label) / n²
        kappa = (po − pe) / (1 − pe)

    Shape: the corpus collapses in ``groupBy(a, b).count()`` (partial+
    final hash agg); marginals, the diagonal mass, and the pe cross
    terms all run on the contingency table, bounded by label
    cardinality² — never the corpus. Null labels participate as their
    own ``<null>`` level (two labelers agreeing to abstain IS
    agreement a validation engine should count).

    Cross-engine determinism: all mass terms are exact integer sums;
    po, pe, kappa are single IEEE divisions / subtractions in a pinned
    order — po = agree/n, pe = src/(n·n), kappa = (po−pe)/(1−pe) — so
    a DuckDB replay is bit-identical. kappa is null when pe = 1 (one
    label level on both sides — undefined by definition).
    """
    a = F.coalesce(F.col(col_a).cast("string"), F.lit("<null>"))
    b = F.coalesce(F.col(col_b).cast("string"), F.lit("<null>"))
    cont = (df.select(a.alias("__a"), b.alias("__b"))
            .groupBy("__a", "__b").count())
    marg_a = cont.groupBy("__a").agg(F.sum("count").alias("__ra"))
    marg_b = cont.groupBy("__b").agg(F.sum("count").alias("__cb"))
    tot = cont.agg(F.sum("count").alias("__nl"))
    agree = (cont.where(F.col("__a") == F.col("__b"))
             .agg(F.coalesce(F.sum("count"), F.lit(0)).alias("__agree")))
    # pe cross terms: only labels present on BOTH sides contribute
    src = (marg_a.join(marg_b, marg_a["__a"] == marg_b["__b"])
           .agg(F.coalesce(F.sum(F.col("__ra") * F.col("__cb")),
                           F.lit(0)).alias("__src")))
    row = (tot.crossJoin(F.broadcast(agree)).crossJoin(F.broadcast(src)))
    n = F.col("__nl").cast("double")
    po = F.col("__agree").cast("double") / n
    pe = F.col("__src").cast("double") / (n * n)
    kappa = F.when(pe < 1.0, (po - pe) / (F.lit(1.0) - pe))
    return row.select(
        F.lit(col_a).alias("col_a"), F.lit(col_b).alias("col_b"),
        F.col("__nl").alias("n_rows"),
        F.round(po, decimals).alias("po"),
        F.round(pe, decimals).alias("pe"),
        F.round(kappa, decimals).alias("kappa"))


def key_comissingness(keyed: DataFrame, keys_col: str,
                      key_universe: list[str],
                      decimals: int = 6) -> DataFrame:
    """Pairwise presence/absence association of embedded-JSON keys.

    Input: a frame with an array-of-strings column (the document's key
    set, e.g. from ``F.json_object_keys``) and a declared key universe.
    For every unordered key pair the 2×2 presence table (n11 both
    present, n10/n01 one-sided, n00 both absent) is computed as sums of
    indicator products — one map-combinable aggregate pass — and the
    phi coefficient

        phi = (n11·n00 − n10·n01) / sqrt(r1·r0·c1·c0)

    is evaluated on the single result row. phi = +1 means the fields
    always travel together, −1 means they are mutually exclusive
    (e.g. a v2 field replacing a legacy one), 0 independent. Output
    rows = C(|universe|, 2) — bounded by the declared schema.
    """
    ind = keyed.select(*[
        F.array_contains(F.col(keys_col), k).cast("long").alias(f"__i{j}")
        for j, k in enumerate(key_universe)])
    aggs: list[Column] = []
    pairs = list(combinations(range(len(key_universe)), 2))
    for ja, jb in pairs:
        a, b = F.col(f"__i{ja}"), F.col(f"__i{jb}")
        t = f"{ja}_{jb}"
        aggs += [
            F.sum(a * b).alias(f"n11__{t}"),
            F.sum(a * (1 - b)).alias(f"n10__{t}"),
            F.sum((1 - a) * b).alias(f"n01__{t}"),
            F.sum((1 - a) * (1 - b)).alias(f"n00__{t}"),
        ]
    one = ind.agg(*aggs)
    structs = []
    for ja, jb in pairs:
        t = f"{ja}_{jb}"
        n11 = F.col(f"n11__{t}").cast("double")
        n10 = F.col(f"n10__{t}").cast("double")
        n01 = F.col(f"n01__{t}").cast("double")
        n00 = F.col(f"n00__{t}").cast("double")
        den = F.sqrt((n11 + n10) * (n01 + n00) * (n11 + n01)
                     * (n10 + n00))
        phi = F.when(den > 0, (n11 * n00 - n10 * n01) / den)
        structs.append(F.struct(
            F.lit(key_universe[ja]).alias("key_a"),
            F.lit(key_universe[jb]).alias("key_b"),
            F.col(f"n11__{t}").alias("n_both"),
            F.col(f"n10__{t}").alias("n_a_only"),
            F.col(f"n01__{t}").alias("n_b_only"),
            F.col(f"n00__{t}").alias("n_neither"),
            F.round(phi, decimals).alias("phi"),
        ))
    return one.select(F.inline(F.array(*structs)))
