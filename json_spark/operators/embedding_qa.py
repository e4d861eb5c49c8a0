"""Embedding-column QA: per-dimension health and norm-distribution stats.

The validation-suite view of an `array<float>` column — the checks a
training pipeline runs BEFORE trusting embeddings for dedup/ANN:
collapsed (dead) dimensions, zero-norm vectors, and norm drift.

Scale shapes:
- dimension_stats : posexplode → ONE partial+final hash aggregate keyed
                    by position. The explode multiplies rows ×dim, but
                    map-side combine collapses every task to ≤dim rows
                    before the shuffle, so the exchange carries
                    |tasks| × dim tiny rows no matter the corpus size.
- norm_stats      : per-row sequential fold (dot_fold, doubles) → one
                    global aggregate; map-only until a single-row
                    reduction. The fold is the same op sequence as the
                    DuckDB oracle's list_reduce, so norms are
                    bit-identical cross-engine (operators/dedup.py:410).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import dot_fold

#: a dimension whose sample stddev falls below this is "dead" — it
#: carries no signal and silently shrinks every cosine's effective rank
DEAD_STDDEV = 1e-6


def dimension_stats(df: DataFrame, vec_col: str) -> DataFrame:
    """Per-dimension (pos, n, mean, stddev, n_zero, is_dead) over an
    array column. ``pos`` is 0-based and cast to long (Spark's posexplode
    emits int32; the oracle's range() emits int64)."""
    x = (df.select(F.posexplode(vec_col).alias("pos", "v"))
         .select(F.col("pos").cast("long").alias("pos"),
                 F.col("v").cast("double").alias("v")))
    return x.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("v"), 6).alias("mean"),
        F.round(F.stddev_samp("v"), 6).alias("stddev"),
        F.sum((F.col("v") == 0.0).cast("long")).alias("n_zero"),
    ).withColumn("is_dead", F.col("stddev") < DEAD_STDDEV)


def norm_stats(df: DataFrame, vec_col: str) -> DataFrame:
    """Corpus norm distribution in one row: (n_vecs, n_zero_norm,
    min_norm, mean_norm, max_norm). Zero-norm vectors make every cosine
    against them NaN — they must be 0 before the embedding column feeds
    dedup or ANN."""
    v = F.col(vec_col)
    nrm = F.sqrt(dot_fold(v, v))
    return df.select(nrm.alias("nrm")).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum((F.col("nrm") == 0.0).cast("long")).alias("n_zero_norm"),
        F.round(F.min("nrm"), 6).alias("min_norm"),
        F.round(F.avg("nrm"), 6).alias("mean_norm"),
        F.round(F.max("nrm"), 6).alias("max_norm"))


def label_coherence(df: DataFrame, label_col: str,
                    vec_col: str) -> DataFrame:
    """Labeled-embedding coherence: per label, does the label's own
    centroid explain its members? Emits (label, n_vectors, n_top1_own,
    avg_own_cos, min_own_cos) where ``n_top1_own`` counts vectors whose
    NEAREST centroid (cosine, over all labels) is their own label — the
    kNN-classifier sanity check that exposes label/embedding column
    mismatches, shuffled join keys, and collapsed clusters long before
    a model trains on them.

    Count robustness: top-1 decisions are only meaningful when the
    best-vs-second margin dwarfs float noise — measured ≥ 2.8e-5 on the
    driver tables (vs ~1e-15 summation-order noise), so the count is
    deterministic cross-engine; continuous outputs are rounded to 6 dp.

    Scale shape: ONE posexplode partial+final aggregate builds the
    |labels|×dim centroid table (map-side combine bounds the exchange
    at ≤ dim rows per label per task); centroids then collapse to a
    SINGLE broadcast row of (label, vec) structs, and every per-vector
    computation — own-cos, all-centroid argmax — is a higher-order-
    function fold on that broadcast array, map-only, no per-vector
    shuffle; the final rollup is a |labels|-key map-combinable agg.
    """
    x = df.select(F.col(label_col).cast("long").alias("label"),
                  F.col(vec_col).alias("v"))
    cent_long = (
        x.select("label", F.posexplode("v").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("cval")))
    cents = (
        cent_long.groupBy("label")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cval"))),
            lambda s: s["cval"]).alias("cvec"))
        .select(F.col("label").alias("clabel"), "cvec"))
    cents_row = cents.agg(
        F.collect_list(F.struct("clabel", "cvec")).alias("cents"))

    vnorm = F.sqrt(dot_fold(F.col("v"), F.col("v")))
    sims = F.transform(
        F.col("cents"),
        lambda c: F.struct(
            c["clabel"].alias("clabel"),
            (dot_fold(F.col("v"), c["cvec"])
             / (vnorm * F.sqrt(dot_fold(c["cvec"], c["cvec"]))))
            .alias("cos")))
    best = F.aggregate(
        sims,
        F.struct(F.lit(-1).cast("long").alias("clabel"),
                 F.lit(-2.0).alias("cos")),
        lambda acc, s: F.when(s["cos"] > acc["cos"], s).otherwise(acc))
    own = F.element_at(
        F.filter(sims, lambda s: s["clabel"] == F.col("label")), 1)["cos"]
    per_vec = (x.join(F.broadcast(cents_row))
               .select("label",
                       (best["clabel"] == F.col("label")).alias("top1_own"),
                       own.alias("own_cos")))
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(F.col("top1_own").cast("long")).alias("n_top1_own"),
        F.round(F.avg("own_cos"), 6).alias("avg_own_cos"),
        F.round(F.min("own_cos"), 6).alias("min_own_cos"))


SPECTRUM_SCHEMA = ("dim int, n_vectors long, m1 double, m2 double, "
                   "m3 double, top_share double, eff_rank double")


def spectrum_moments(df: DataFrame, vec_col: str) -> DataFrame:
    """Covariance-spectrum health of an embedding column in ONE pass:
    eigenvalues of the population covariance summarize how the corpus
    actually uses its dimensions — a collapsed (near-rank-1) spectrum
    means every cosine is dominated by one direction and dedup/ANN
    quality silently degrades even when per-dim variances look fine.

    Emits one row: (dim, n_vectors, m1, m2, m3, top_share, eff_rank)
    where m_k = Σ λ^k are the spectrum's power sums — mathematically
    equal to trace(C^k), which a relational engine can compute by pure
    join-aggregate matrix algebra WITHOUT an eigensolver; the driver
    oracle does exactly that, so the whole pipeline (Arrow partial
    X^T X, merge, covariance, eigh) is pinned by an independent
    implementation. ``top_share`` = λ_max / Σλ and ``eff_rank`` =
    exp(entropy of λ/Σλ) are eigensolver-only outputs, pinned in
    pytest against a numpy twin.

    Scale shape: one map-only Arrow stage computes per-batch partials
    (count, Σx vector, X^T X matrix — BLAS matmul per batch, emitted as
    a single flattened row per batch); a posexplode partial+final sum
    merges them with an exchange bounded by tasks × dim² scalars; the
    dim×dim eigh runs once inside a final 1-row Arrow stage — nothing
    corpus-sized ever reaches the driver or shuffles.
    """
    import pyarrow as pa

    def partials(batches):
        for batch in batches:
            vecs = batch.column(0)
            arr = np.asarray(vecs.flatten(), dtype=np.float64)
            n = batch.num_rows
            if n == 0:
                continue
            d = len(arr) // n
            x = arr.reshape(n, d)
            yield pa.RecordBatch.from_arrays(
                [pa.array([n], pa.int64()),
                 pa.array([x.sum(axis=0).tolist()],
                          pa.list_(pa.float64())),
                 pa.array([(x.T @ x).ravel().tolist()],
                          pa.list_(pa.float64()))],
                ["n", "sx", "xtx"])

    part = df.select(vec_col).mapInArrow(
        partials, "n long, sx array<double>, xtx array<double>")
    # element-wise merge of ALL partial state in ONE pass: stack
    # [n, sx..., xtx...] into a single (1 + dim + dim^2)-long array and
    # posexplode once — three separate consumers of `part` would make
    # Spark recompute the Arrow partials stage (and rescan the source)
    # three times. The exchange carries <= (1 + dim + dim^2) rows/task.
    comb = part.select(F.posexplode(
        F.concat(F.array(F.col("n").cast("double")),
                 F.col("sx"), F.col("xtx"))).alias("pos", "v"))
    merged = (comb.groupBy("pos").agg(F.sum("v").alias("v"))
              .agg(F.transform(
                  F.array_sort(F.collect_list(F.struct("pos", "v"))),
                  lambda s: s["v"]).alias("state")))

    def finalize(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue  # mapInArrow can hand empty batches on empty partitions
            state = np.asarray(batch.column(0)[0].as_py(),
                               dtype=np.float64)
            if len(state) < 3:
                continue  # empty source: no partials, emit no row
            # length = 1 + d + d^2  =>  d = (sqrt(4L - 3) - 1) / 2
            d = int(round((np.sqrt(4 * len(state) - 3) - 1) / 2))
            n = int(round(state[0]))
            sxv = state[1:1 + d]
            xt = state[1 + d:].reshape(d, d)
            mean = sxv / n
            cov = xt / n - np.outer(mean, mean)
            lam = np.linalg.eigvalsh(cov)
            lam = np.clip(lam, 0.0, None)
            tot = lam.sum()
            share = lam / tot if tot > 0 else lam
            nz = share[share > 0]
            eff = float(np.exp(-(nz * np.log(nz)).sum())) if len(nz) else 0.0
            yield pa.RecordBatch.from_arrays(
                [pa.array([d], pa.int32()),
                 pa.array([n], pa.int64()),
                 pa.array([float(lam.sum())], pa.float64()),
                 pa.array([float((lam ** 2).sum())], pa.float64()),
                 pa.array([float((lam ** 3).sum())], pa.float64()),
                 pa.array([float(lam.max() / tot) if tot > 0 else 0.0],
                          pa.float64()),
                 pa.array([eff], pa.float64())],
                ["dim", "n_vectors", "m1", "m2", "m3",
                 "top_share", "eff_rank"])

    return merged.mapInArrow(finalize, SPECTRUM_SCHEMA)


def dimension_drift(a: DataFrame, b: DataFrame, vec_col: str,
                    yellow: float = 0.5,
                    red: float = 1.5) -> DataFrame:
    """Per-dimension distribution drift between two embedding snapshots
    — the encoder-version-change detector: a silently retrained or
    re-quantized encoder shifts individual dimensions' means long
    before any norm or dead-dimension check moves, and every cosine
    between old and new vectors quietly degrades.

    ``shift_sigmas = |mean_b - mean_a| / stddev_a`` (the reference
    snapshot's own spread is the unit, so the score is scale-free);
    verdicts band on it. Both snapshots ride ONE scan: union with a
    side tag → posexplode → a single partial+final (pos) aggregate
    with per-side conditional stats — the exchange carries
    |tasks| × dim rows regardless of corpus size (same shape as
    :func:`dimension_stats`).

    Output: pos, n_a, n_b, mean_a, mean_b, stddev_a, shift_sigmas,
    verdict — one row per dimension.
    """
    tagged = (a.select(F.lit("a").alias("side"), F.col(vec_col))
              .unionByName(
                  b.select(F.lit("b").alias("side"), F.col(vec_col))))
    x = (tagged.select("side", F.posexplode(vec_col).alias("pos", "v"))
         .select("side", F.col("pos").cast("long").alias("pos"),
                 F.col("v").cast("double").alias("v")))
    va = F.when(F.col("side") == "a", F.col("v"))
    vb = F.when(F.col("side") == "b", F.col("v"))
    g = x.groupBy("pos").agg(
        F.count(va).alias("n_a"),
        F.count(vb).alias("n_b"),
        F.avg(va).alias("__ma"),
        F.avg(vb).alias("__mb"),
        F.stddev_samp(va).alias("__sa"))
    # try_divide: a constant reference dimension has stddev 0 — the
    # shift is undefined (NULL), which never crosses a band, so an
    # unchanged constant dim stays GREEN instead of aborting under ANSI
    d = F.try_divide(F.abs(F.col("__mb") - F.col("__ma")), F.col("__sa"))
    v = (F.when(d >= red, "RED")
         .when(d >= yellow, "YELLOW")
         .otherwise("GREEN"))
    return g.select(
        "pos", "n_a", "n_b",
        F.round("__ma", 6).alias("mean_a"),
        F.round("__mb", 6).alias("mean_b"),
        F.round("__sa", 6).alias("stddev_a"),
        F.round(d, 6).alias("shift_sigmas"),
        v.alias("verdict"))


def quantization_check(df: DataFrame, vec_col: str,
                       levels: int = 127,
                       frac_threshold: float = 0.99) -> DataFrame:
    """Per-dimension quantization detection — the silent-int8 detector:
    embeddings that passed through a quantized store or a lossy
    serialization land exactly on the k/``levels`` lattice, which
    costs recall in every downstream cosine/ANN stage long before any
    mean or norm statistic moves. A dimension is QUANTIZED when ≥
    ``frac_threshold`` of its values sit on the lattice (|v·levels −
    nearest int| < 1e-5 in double — float32 storage of k/levels
    lands within 127·2⁻²⁴ ≈ 7.6e-6, inside the tolerance, while
    continuous values land within it with probability ~2·10⁻⁵ each).

    Output: pos, n, n_lattice, lattice_frac, verdict — one row per
    dimension. Same scale shape as :func:`dimension_stats`: posexplode
    → ONE partial+final (pos) hash aggregate; the exchange carries
    |tasks| × dim rows regardless of corpus size.
    """
    x = (df.select(F.posexplode(vec_col).alias("pos", "v"))
         .select(F.col("pos").cast("long").alias("pos"),
                 F.col("v").cast("double").alias("v")))
    scaled = F.col("v") * F.lit(float(levels))
    on_lattice = (F.abs(scaled - F.floor(scaled + F.lit(0.5)))
                  < F.lit(1e-5))
    g = x.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(on_lattice.cast("long")).alias("n_lattice"))
    frac = F.try_divide(F.col("n_lattice"), F.col("n"))
    return g.select(
        "pos", "n", "n_lattice",
        F.round(frac, 6).alias("lattice_frac"),
        F.when(frac >= frac_threshold, "QUANTIZED")
         .otherwise("OK").alias("verdict"))


def isotropy_stats(df: DataFrame, vec_col: str) -> DataFrame:
    """Anisotropy of an embedding column in ONE row, exactly: the mean
    pairwise cosine over all n(n-1) ordered pairs of unit-normalized
    vectors, via the identity ||Σ x̂||² = n + Σ_{i≠j} x̂_i·x̂_j — so
    mean_pairwise_cos = (||S||² − n) / (n(n−1)) with S the per-dimension
    sum of unit vectors. No pair is ever materialized: one normalize +
    posexplode pass, ONE partial+final per-dimension sum (≤ dim rows per
    task after map-side combine), then a 1-row fold of dim squares.

    Why a validation engine cares (public result — Ethayarajh 2019, Mu &
    Viswanath 2018): anisotropic embeddings ("cone" geometry, mean
    cosine ≫ 0) silently break every cosine-threshold downstream —
    near-dup detection over-fires and ANN recall-vs-threshold curves
    shift. An encoder change that collapses geometry shows up here as a
    jump in mean_pairwise_cos long before dedup metrics degrade.

    Zero-norm vectors are excluded from both S and n (their unit form is
    undefined; `norm_stats` reports them separately).
    """
    v = F.col(vec_col)
    nrm = F.sqrt(dot_fold(v, v))
    # divisor nulled when 0 (not just filtered): ConvertToLocalRelation
    # can evaluate the projection before the filter on literal inputs,
    # and ANSI mode turns x/0 into a task-killing error there
    safe = F.when(F.col("__nrm") > 0.0, F.col("__nrm"))
    unit = (df.select(v.alias("__v"), nrm.alias("__nrm"))
            .where(F.col("__nrm") > 0.0)
            .select(F.transform(
                "__v", lambda x: x.cast("double") / safe).alias("u")))
    # every surviving vector contributes exactly one value per pos, so
    # the per-pos row count IS n_vecs — ONE scan answers everything (no
    # second count branch, no 1-row join)
    dims = (unit.select(F.posexplode("u").alias("pos", "x"))
            .groupBy("pos").agg(F.sum("x").alias("s"),
                                F.count(F.lit(1)).alias("n")))
    return dims.agg(
        F.max("n").alias("n_vecs"),
        F.count(F.lit(1)).alias("dim"),
        F.round((F.sum(F.col("s") * F.col("s")) - F.max("n"))
                / (F.max("n") * (F.max("n") - F.lit(1))), 6)
        .alias("mean_pairwise_cos"))
