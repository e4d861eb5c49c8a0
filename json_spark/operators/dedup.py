"""Deduplication operators for large-scale training-data pipelines.

Six families, each expressed Spark-first (Column expressions + joins;
Arrow-batched numpy only for the vector signatures) with an independent
DuckDB oracle in plans/registry.py:

- exact dedup      : hash-groupBy on a content key (via
                     operators/uniqueness.py)
- MinHash + LSH    : shingle → minhash signature → band-bucket self-join →
                     exact-Jaccard verify of candidates; the same banding
                     also powers :func:`minhash_lsh_join`, the CROSS-corpus
                     variant (train/test contamination check)
- SimHash          : 32-bit signature over distinct token hashes;
                     chunk-banding gives GUARANTEED recall for hamming <= 3
                     (pigeonhole: 4 chunks, <=3 differing bits ⇒ one equal)
- n-gram Jaccard   : exact set similarity on shingle arrays
- embedding cosine : exact all-pairs cosine (the O(n^2) oracle twin)
- embedding LSH    : random-hyperplane buckets + exact cosine verify
                     (the production path for embedding columns)

Scale shape: every pair-generating step is a key-equality self-join
(band bucket / simhash chunk / hyperplane chunk), never a cross join; the
exact verify runs only on LSH candidates, so cost is O(candidates), not
O(n^2). Hot buckets (boilerplate shingles) are the skew risk —
``max_bucket`` caps the rows per bucket the self-join will expand (AQE
skew-join splits the rest).

Cross-engine determinism: only EXACT-verify stages are oracle-compared
(string-set Jaccard; cosine as a sequential left-fold in doubles — Spark
``aggregate`` and DuckDB ``list_reduce`` produce bit-identical results).
Signatures are engine-internal: MinHash runs on native xxhash64 shingle
hashes with seeded driver-side (a, b) literals, SimHash on text.tok32
token hashes (its chunk banding makes the FULL operator exactly
oracle-comparable), and the hyperplane matrix is regenerated from a fixed
numpy seed inside each task.
"""

from __future__ import annotations

import random
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import ensure_parallelism
from .text import tok32, tokens

#: MinHash modulus: 2^31-1 (prime). Shingle hashes are reduced mod P first
#: so a*x stays within signed-64 range (a < 2^31, x < 2^31 ⇒ a*x < 2^62).
MINHASH_P = 2_147_483_647
MINHASH_SEED = 0x5EED


def minhash_params(num_hashes: int, seed: int = MINHASH_SEED) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i(x) = (a*x + b) mod P."""
    rng = random.Random(seed)
    return [(rng.randrange(1, MINHASH_P), rng.randrange(0, MINHASH_P))
            for _ in range(num_hashes)]


def shingles(c: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a single-space-separated text.

    Documents shorter than ``n`` tokens fall back to one whole-text
    shingle so they still participate (and can only match exactly).
    """
    toks = tokens(c)
    k = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(
        F.when(k >= 1, grams).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def minhash_signature(sh: Column, num_hashes: int = 32,
                      seed: int = MINHASH_SEED) -> Column:
    """MinHash signature: array of min over the permuted shingle hashes.

    IMPORTANT: pass a MATERIALIZED column (a bound attribute from a prior
    projection), not a computed expression — the num_hashes branches each
    reference ``sh``, and higher-order functions defeat Catalyst's
    common-subexpression elimination, so an inline md5-hashing expression
    would be recomputed num_hashes times (measured 5x slowdown).
    """
    params = minhash_params(num_hashes, seed)
    return F.array(*[
        F.array_min(F.transform(
            sh, lambda x: F.pmod(x * F.lit(a) + F.lit(b), F.lit(MINHASH_P))))
        for a, b in params
    ])


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays."""
    return (F.size(F.array_intersect(a, b)).cast("double")
            / F.size(F.array_union(a, b)))


def _minhash_band_stage(params: list[tuple[int, int]], bands: int, r: int):
    """mapInArrow closure: minhash signatures + banded keys per row.

    HOF lambdas (transform/aggregate) fall back to interpreted eval — the
    32 array_min folds dominated the LSH runtime (~2s of 4.8s at sf0.1).
    Here the ragged hash arrays flatten once per Arrow batch and each
    hash function is one vectorized (a*x+b) % P + np.minimum.reduceat —
    identical integers to the SQL formulation (pure int64 math, same
    xxhash64 inputs). Band keys pack the r per-band minima into one int64
    (each min < P < 2^31, so r=2 fits: hi*P + lo < 2^62).
    """
    a_arr = np.array([a for a, _ in params], dtype=np.int64)
    b_arr = np.array([b for _, b in params], dtype=np.int64)

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = np.asarray(batch.column("__id"), dtype=np.int64)
            col = batch.column("__shh")
            offsets = np.asarray(col.offsets, dtype=np.int64)
            flat = np.asarray(col.values, dtype=np.int64)
            starts = offsets[:-1]
            # shingles() guarantees >= 1 element per doc, so every
            # reduceat segment is non-empty
            sig = np.empty((len(params), batch.num_rows), dtype=np.int64)
            for i in range(len(params)):
                h = (flat * a_arr[i] + b_arr[i]) % MINHASH_P
                sig[i] = np.minimum.reduceat(h, starts)
            keys = np.empty((bands, batch.num_rows), dtype=np.int64)
            for b in range(bands):
                k = sig[b * r]
                for j in range(1, r):
                    k = k * MINHASH_P + sig[b * r + j]
                keys[b] = k
            band_ids = np.repeat(np.arange(bands, dtype=np.int32),
                                 batch.num_rows)
            yield pa.RecordBatch.from_arrays(
                [pa.array(np.tile(ids, bands), pa.int64()),
                 pa.array(band_ids, pa.int32()),
                 pa.array(keys.ravel(), pa.int64())],
                ["__id", "__band", "__key"])

    return gen


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket: int = 200,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH + exact-Jaccard verification.

    1. per doc: distinct shingle hashes + minhash signature,
    2. explode ``bands`` band keys (concatenated signature rows),
    3. self-join on (band, key) with id_a < id_b → candidate pairs,
    4. exact Jaccard on the shingle sets, keep >= threshold.

    With r = num_hashes/bands rows per band, a pair with Jaccard j is
    missed by all bands with probability (1 - j^r)^bands — for the
    default 16x2 and j >= 0.5, < 1.8%; for j >= 0.8, < 1e-6. The verify
    step removes all false positives, so precision is exact.

    ``max_bucket`` drops degenerate buckets (boilerplate) whose self-join
    would explode quadratically; dropped buckets are a recall (not
    precision) trade recorded by the caller if needed.
    """
    r = num_hashes // bands
    if r > 2:
        raise ValueError("packed int64 band keys support r <= 2 "
                         "(num_hashes/bands); use more bands")
    # shingle STRINGS for the exact verify (collision-free, matches the
    # oracle's string-set Jaccard); their hashes feed the signatures only.
    # ensure_parallelism: signature hashing is the heavy map stage and
    # must not serialize on under-split small files (no-op at scale)
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("__id"),
        shingles(F.col(text_col), n).alias("__sh"),
    )
    # xxhash64, not md5/tok32: the signature is engine-internal (only the
    # exact string-Jaccard verify is oracle-compared), so the cheap native
    # JVM hash feeds the vectorized Arrow signature stage
    hashed = base.select(
        "__id",
        F.array_distinct(F.transform(
            F.col("__sh"),
            lambda s: F.pmod(F.xxhash64(s), F.lit(MINHASH_P)))).alias("__shh"),
    )
    banded = hashed.mapInArrow(
        _minhash_band_stage(minhash_params(num_hashes), bands, r),
        "__id long, __band int, __key long")
    # cap pathological buckets before the self-join expands them
    sized = banded.withColumn(
        "__bucket_n",
        F.count(F.lit(1)).over(Window.partitionBy("__band", "__key")),
    ).filter(F.col("__bucket_n") <= max_bucket).drop("__bucket_n")
    left = sized.alias("l")
    right = sized.alias("r")
    cand = (
        left.join(right, ["__band", "__key"])
        .filter(F.col("l.__id") < F.col("r.__id"))
        .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .distinct()
    )
    # exact verify: join the (small) candidate set back to the RAW text and
    # shingle only the joined rows — O(candidates) shingle work, not two
    # more full-corpus shingle passes. At scale the candidate side
    # broadcasts and the corpus scan stays column-pruned to (id, text).
    texts = df.select(F.col(id_col).alias("__tid"),
                      F.col(text_col).alias("__text"))
    verified = (
        cand.join(texts.withColumnRenamed("__tid", "id_a")
                  .withColumnRenamed("__text", "__t_a"), "id_a")
        .join(texts.withColumnRenamed("__tid", "id_b")
              .withColumnRenamed("__text", "__t_b"), "id_b")
        .select("id_a", "id_b",
                jaccard(shingles(F.col("__t_a"), n),
                        shingles(F.col("__t_b"), n)).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    return verified


def minhash_lsh_join(
    left_df: DataFrame,
    right_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket: int = 200,
) -> DataFrame:
    """Cross-corpus near-duplicate JOIN (train/test contamination check):
    every pair (left doc, right doc) with shingle-Jaccard >= threshold.

    The LLM-pipeline use case is leakage detection: ``left_df`` is the
    training corpus, ``right_df`` the evaluation set; any hit means the
    benchmark row is (nearly) contained in training data. Same scale
    shape as :func:`minhash_lsh_pairs` — both sides map to banded
    signature keys with IDENTICAL (a, b) params and seed, candidates come
    from a key-equality join on (band, key) (never a cross join), each
    side's degenerate buckets are capped independently before the join
    can expand them, and the exact Jaccard verify touches O(candidates)
    rows joined back to the raw texts. Returns (id_left, id_right,
    jaccard) with exact precision; recall follows the same
    (1 - j^r)^bands banding bound as the self-join.
    """
    r = num_hashes // bands
    if r > 2:
        raise ValueError("packed int64 band keys support r <= 2 "
                         "(num_hashes/bands); use more bands")
    params = minhash_params(num_hashes)

    def banded(df: DataFrame) -> DataFrame:
        base = ensure_parallelism(df).select(
            F.col(id_col).alias("__id"),
            shingles(F.col(text_col), n).alias("__sh"))
        hashed = base.select(
            "__id",
            F.array_distinct(F.transform(
                F.col("__sh"),
                lambda s: F.pmod(F.xxhash64(s), F.lit(MINHASH_P))))
            .alias("__shh"))
        sig = hashed.mapInArrow(
            _minhash_band_stage(params, bands, r),
            "__id long, __band int, __key long")
        return sig.withColumn(
            "__bucket_n",
            F.count(F.lit(1)).over(Window.partitionBy("__band", "__key")),
        ).filter(F.col("__bucket_n") <= max_bucket).drop("__bucket_n")

    lb = banded(left_df).select(F.col("__id").alias("id_left"),
                                "__band", "__key")
    rb = banded(right_df).select(F.col("__id").alias("id_right"),
                                 "__band", "__key")
    cand = (lb.join(rb, ["__band", "__key"])
            .select("id_left", "id_right").distinct())
    lt = left_df.select(F.col(id_col).alias("id_left"),
                        F.col(text_col).alias("__t_l"))
    rt = right_df.select(F.col(id_col).alias("id_right"),
                         F.col(text_col).alias("__t_r"))
    return (
        cand.join(lt, "id_left").join(rt, "id_right")
        .select("id_left", "id_right",
                jaccard(shingles(F.col("__t_l"), n),
                        shingles(F.col("__t_r"), n)).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def verify_pairs_jaccard_exhaustive(df: DataFrame, id_col: str, text_col: str,
                                    n: int = 3,
                                    threshold: float = 0.5) -> DataFrame:
    """Exact all-pairs shingle Jaccard — the O(n^2) TEST/ORACLE twin of
    :func:`minhash_lsh_pairs` (never the production path). Used to assert
    the probabilistic contract: LSH output ⊆ this set with identical
    jaccard values, and full recall on high-j pairs."""
    base = df.select(F.col(id_col).alias("__id"),
                     shingles(F.col(text_col), n).alias("__sh"))
    a = base.select(F.col("__id").alias("id_a"), F.col("__sh").alias("__sa"))
    b = base.select(F.col("__id").alias("id_b"), F.col("__sh").alias("__sb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                jaccard(F.col("__sa"), F.col("__sb")).alias("j"))
        .filter(F.col("j") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32
SIMHASH_CHUNKS = 4  # 8 bits each → guaranteed recall for hamming <= 3


def simhash_from_hashes(hashed: Column) -> Column:
    """32-bit SimHash from a MATERIALIZED distinct-token-hash array column:
    bit b is 1 iff the sum of (+1 / -1 for bit b of each hash) is >= 0.
    Pure SQL expression — identical in the DuckDB oracle. Like
    :func:`minhash_signature`, the input must be a bound column: the 32
    per-bit aggregates each reference it, and HOFs defeat CSE."""

    def bit_vote(b: int) -> Column:
        # factory binds b per bit; shift amounts must be Python ints
        return F.aggregate(
            hashed, F.lit(0),
            lambda acc, h: acc + F.when(
                F.pmod(F.shiftright(h, b), F.lit(2)) == 1, F.lit(1)
            ).otherwise(F.lit(-1)),
        )

    sim = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        sim = sim + F.when(bit_vote(b) >= 0,
                           F.lit(1 << b).cast("long")).otherwise(F.lit(0))
    return sim


def simhash32(c: Column) -> Column:
    """Convenience one-expression form for small inputs/tests; prefer the
    two-projection shape of :func:`simhash_pairs` in pipelines."""
    return simhash_from_hashes(
        F.array_distinct(F.transform(tokens(c), lambda t: tok32(t))))


def simhash_pairs(df: DataFrame, id_col: str, text_col: str,
                  max_hamming: int = 3, max_bucket: int = 500) -> DataFrame:
    """Near-duplicate pairs with hamming(simhash) <= max_hamming.

    Candidate generation by chunk banding: split the 32-bit signature into
    4 8-bit chunks; any pair within hamming <= 3 shares at least one exact
    chunk (pigeonhole), so recall is 1.0 — the oracle's exact O(n^2) scan
    and this plan agree EXACTLY, unlike probabilistic LSH.
    """
    bits_per = SIMHASH_BITS // SIMHASH_CHUNKS
    hashed = ensure_parallelism(df).select(
        F.col(id_col).alias("__id"),
        F.array_distinct(F.transform(
            tokens(F.col(text_col)), lambda t: tok32(t))).alias("__th"),
    )
    base = hashed.select(
        "__id", simhash_from_hashes(F.col("__th")).alias("__sim"))
    chunked = base.select(
        "__id", "__sim",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("chunk"),
                F.pmod(F.shiftright(F.col("__sim"), i * bits_per),
                       F.lit(1 << bits_per)).alias("key"),
            )
            for i in range(SIMHASH_CHUNKS)
        ])).alias("ck"),
    ).select("__id", "__sim", F.col("ck.chunk").alias("__chunk"),
             F.col("ck.key").alias("__key"))
    sized = chunked.withColumn(
        "__bucket_n",
        F.count(F.lit(1)).over(Window.partitionBy("__chunk", "__key")),
    ).filter(F.col("__bucket_n") <= max_bucket).drop("__bucket_n")
    left = sized.alias("l")
    right = sized.alias("r")
    return (
        left.join(right, ["__chunk", "__key"])
        .filter(F.col("l.__id") < F.col("r.__id"))
        .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"),
                F.bit_count(F.col("l.__sim").bitwiseXOR(F.col("r.__sim")))
                .alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Embedding cosine
# ---------------------------------------------------------------------------

def dot_fold(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in doubles — bit-identical to the
    oracle's list_reduce fold (same op sequence, IEEE determinism)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return dot_fold(a, b) / (F.sqrt(dot_fold(a, a)) * F.sqrt(dot_fold(b, b)))


def _normed(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, vector, norm) — the norm folded ONCE per vector (same
    expression the per-pair form would evaluate, so downstream cosines
    are bit-identical to the oracle's normed-CTE shape)."""
    return df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
    ).withColumn("__nrm", F.sqrt(dot_fold(F.col("__v"), F.col("__v"))))


def verify_pairs_cosine(cand: DataFrame, df: DataFrame, id_col: str,
                        vec_col: str, threshold: float) -> DataFrame:
    """Exact cosine over a candidate (id_a, id_b) frame: join the (small)
    candidate set back to the vectors — O(candidates) fold work — and
    keep pairs >= threshold. Bit-identical to the O(n^2) oracle on the
    pairs it sees, so LSH ∩ exact == LSH candidates that verify."""
    normed = _normed(df, id_col, vec_col)
    a = normed.select(F.col("__id").alias("id_a"),
                      F.col("__v").alias("__va"),
                      F.col("__nrm").alias("__na"))
    b = normed.select(F.col("__id").alias("id_b"),
                      F.col("__v").alias("__vb"),
                      F.col("__nrm").alias("__nb"))
    return (
        cand.join(a, "id_a").join(b, "id_b")
        .select("id_a", "id_b",
                (dot_fold(F.col("__va"), F.col("__vb"))
                 / (F.col("__na") * F.col("__nb"))).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def embedding_near_dups(df: DataFrame, id_col: str, vec_col: str,
                        threshold: float = 0.9) -> DataFrame:
    """All pairs with cosine >= threshold via self-join.

    This is the exact (verification) kernel kept O(n^2) so the DuckDB
    oracle is directly comparable; :func:`embedding_lsh_pairs` is the
    production-scale twin (bucketed candidates, same verify).

    Norms are folded ONCE per vector before the join — per-pair work
    drops from three array folds to one fold plus two multiplies
    (measured 3x at sf0.1).
    """
    normed = _normed(df, id_col, vec_col)
    left = normed.select(F.col("__id").alias("id_a"),
                         F.col("__v").alias("__va"),
                         F.col("__nrm").alias("__na"))
    right = normed.select(F.col("__id").alias("id_b"),
                          F.col("__v").alias("__vb"),
                          F.col("__nrm").alias("__nb"))
    return (
        left.join(right, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                (dot_fold(F.col("__va"), F.col("__vb"))
                 / (F.col("__na") * F.col("__nb"))).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


# ---------------------------------------------------------------------------
# Duplicate clusters: connected components over near-dup pairs
# ---------------------------------------------------------------------------

def _star_clusters(pairs: DataFrame, max_iter: int = 16) -> DataFrame:
    """Large-star/small-star contraction. Edges are kept canonical
    (a > b, deduplicated, no self-loops); each round:

    - large-star: at every node u over its FULL neighborhood N(u),
      m = min(N(u) ∪ {u}); every strictly-larger neighbor v > u is
      re-attached as (v, m). Every original edge is processed at its
      smaller endpoint, so no connectivity is lost.
    - small-star: at every node u over its smaller neighbors N⁻(u),
      m = min(N⁻(u)); u and every other smaller neighbor re-attach to m.

    The fixed point is a star forest whose centers are the component
    minima; expected rounds O(log n). Convergence is detected by a
    (count, xxhash64-sum) fingerprint of the edge set — one scalar
    aggregate per round, same driver cost as the min-label probe.
    """
    # localCheckpoint (not just persist): persist caches partitions but
    # the LOGICAL plan still nests one level per round, and an iterative
    # plan that references its input several times per round grows
    # exponentially — ~50 rounds produced a 2 GiB plan string in
    # testing. Checkpointing truncates lineage each round, keeping
    # planning O(1) per round. (On a real cluster prefer a reliable
    # checkpoint dir for executor-loss recovery; localCheckpoint trades
    # that for zero-config speed, fine for a bounded CC loop.)
    # ONE materialization of the upstream pair pipeline (the expensive
    # part: scan + banding + verify) — both the edge list and the
    # reflexive-pair ids derive from this checkpoint, so the selfies
    # pass costs a cheap re-scan of the materialized projection, never
    # a second execution of pair generation.
    canon = pairs.select(
        F.greatest("id_a", "id_b").alias("a"),
        F.least("id_a", "id_b").alias("b")).localCheckpoint(eager=True)
    # reflexive pairs carry no connectivity but DO assert membership: an
    # id seen only as (x, x) must still get a singleton label row, as the
    # minlabel twin produces (r4 ADVICE — the two engines must agree).
    selfies = (canon.filter(F.col("a") == F.col("b"))
               .select(F.col("a").alias("id")).distinct())
    edges = (canon
             .filter(F.col("a") != F.col("b")).distinct()
             .localCheckpoint(eager=True))

    def fingerprint(e: DataFrame):
        # mod-prime residues keep the ANSI int64 sum overflow-proof at
        # any edge count (residue < 1e6, so ~9e12 edges before overflow)
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.pmod(F.xxhash64("a", "b"),
                         F.lit(1000003))).alias("h")).collect()[0]
        return (row["n"], row["h"])

    fp = fingerprint(edges)
    for _ in range(max_iter):
        if fp[0] == 0:
            break
        # large-star over the full (undirected) neighborhood
        und = edges.select(F.col("a").alias("u"), F.col("b").alias("v")) \
            .unionByName(
                edges.select(F.col("b").alias("u"), F.col("a").alias("v")))
        mn = und.groupBy("u").agg(F.min("v").alias("__mv"))
        mn = mn.select("u", F.least("__mv", "u").alias("m"))
        large = (und.join(mn, "u")
                 .filter(F.col("v") > F.col("u"))
                 .select(F.col("v").alias("a"), F.col("m").alias("b"))
                 .filter(F.col("a") != F.col("b")).distinct())
        # small-star over the smaller neighbors (edges are a > b)
        mn2 = large.groupBy("a").agg(F.min("b").alias("m"))
        j = large.join(mn2, "a")
        small = (j.select(F.col("b").alias("a"), F.col("m").alias("b"))
                 .unionByName(
                     j.select(F.col("a").alias("a"), F.col("m").alias("b")))
                 .filter(F.col("a") != F.col("b")).distinct())
        small = small.localCheckpoint(eager=True)
        new_fp = fingerprint(small)
        edges.unpersist()
        edges = small
        if new_fp == fp:
            break
        fp = new_fp
    members = edges.groupBy(F.col("a").alias("id")).agg(
        F.min("b").alias("cluster_id"))
    roots = (edges.select(F.col("b").alias("id")).distinct()
             .join(members.select(F.col("id")), "id", "left_anti")
             .withColumn("cluster_id", F.col("id")))
    singletons = (selfies.join(members.select("id"), "id", "left_anti")
                  .join(roots.select("id"), "id", "left_anti")
                  .withColumn("cluster_id", F.col("id")))
    labels = members.unionByName(roots).unionByName(singletons)
    labels.persist()
    labels.count()
    edges.unpersist()
    return labels


def duplicate_clusters(pairs: DataFrame, max_iter: int = 12,
                       method: str = "star") -> DataFrame:
    """Connected components over (id_a, id_b) near-dup pairs: every
    member labeled with its component's MINIMUM id — the canonical
    representative a dedup pipeline keeps (drop rows where
    id != cluster_id).

    Two interchangeable engines (identical labels, property-tested
    against each other in tests/test_canonical.py):

    - ``method="star"`` (default): alternating large-star/small-star
      contraction (Kiveris et al., "Connected Components in MapReduce
      and Beyond") — converges in O(log n) rounds on ANY component
      shape, so an adversarial 50-link near-dup chain costs ~7 rounds
      instead of 50. Each round is two bounded joins + two
      map-combinable mins over the CURRENT edge list, which only ever
      shrinks toward one star edge per non-root member.
    - ``method="minlabel"``: min-label propagation (one join + one min
      per round, O(component diameter) rounds) — marginally cheaper per
      round for the shallow star/clique clusters real near-dup data
      produces; kept as the reference twin.

    Per-round driver work is ONE scalar (the converged? probe); frames
    are persisted each round and the previous round unpersisted, so
    lineage stays flat. The input edge list — whose lineage is the
    whole upstream near-dup pipeline (scan + banding + verify) — is
    persisted for the loop's lifetime: without that, every round's
    join re-executes pair generation from the corpus scan, the most
    expensive stage of the pipeline, once per round.
    """
    if method == "star":
        return _star_clusters(pairs, max_iter=max(max_iter, 8))
    edges = pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    und = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))).persist()
    labels = (
        und.select(F.col("u").alias("id")).distinct()
        .withColumn("cluster_id", F.col("id"))
    )
    # localCheckpoint each round (see _star_clusters): persist alone
    # leaves the logical plan nesting one level per round, and this loop
    # references `labels` twice per round — plan size doubles per round
    # and a deep run (adversarial chain near max_iter) hits GiB-sized
    # plan strings before any task runs.
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        msgs = (
            und.join(labels, und["u"] == labels["id"])
            .select(F.col("v").alias("id"), F.col("cluster_id"))
        )
        new_labels = (
            labels.select("id", "cluster_id").unionByName(msgs)
            .groupBy("id").agg(F.min("cluster_id").alias("cluster_id"))
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1).count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    # the convergence probe's limit(1) may have materialized only part
    # of the final cache — fill it before dropping the edge list, so
    # downstream consumers never re-derive the pair pipeline
    labels.count()
    und.unpersist()
    return labels


def dedup_representatives(pairs: DataFrame) -> DataFrame:
    """Cluster summary for the keep/drop decision: one row per duplicate
    cluster with its representative (min id) and member count."""
    return (
        duplicate_clusters(pairs)
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_members"))
    )


def canonical_representatives(labels: DataFrame, scored: DataFrame,
                              id_col: str, score_col: str) -> DataFrame:
    """Quality-aware canonical selection — the step AFTER clustering that
    decides which copy survives: per duplicate cluster keep the member
    with the highest ``score_col`` (min id among exact ties, so the
    choice is deterministic), instead of the blind min-id rule
    ``dedup_representatives`` applies. Near-dup clusters routinely mix a
    clean original with truncated/boilerplated copies; keeping by
    quality instead of by id measurably improves the surviving corpus.

    ``labels`` is ``duplicate_clusters`` output (id, cluster_id);
    ``scored`` carries (id_col, score_col) for at least every member.

    Output: cluster_id, kept_id, best_score, n_members, n_dropped.

    Scale shape: one equi-join of the member set against the score
    table (members ≪ corpus — the join shuffles on the id key), then
    two cluster-keyed partial+final aggregates (max-score, then
    min-id-among-ties). No windows, no collects; every exchange is
    bounded by the duplicate-member count, not the corpus.
    """
    m = labels.join(
        scored.select(F.col(id_col).alias("id"),
                      F.col(score_col).alias("__score")), "id")
    best = m.groupBy("cluster_id").agg(
        F.max("__score").alias("best_score"),
        F.count(F.lit(1)).alias("n_members"))
    return (m.join(best, "cluster_id")
            .filter(F.col("__score") == F.col("best_score"))
            .groupBy("cluster_id", "best_score", "n_members")
            .agg(F.min("id").alias("kept_id"))
            .select("cluster_id", "kept_id", "best_score", "n_members",
                    (F.col("n_members") - 1).alias("n_dropped")))


# ---------------------------------------------------------------------------
# Embedding LSH (random hyperplanes) — the 100 TB embedding-dedup path
# ---------------------------------------------------------------------------

RH_SEED = 0x9E37


def _rh_sig_stage(num_bits: int, chunks: int, seed: int, id_name: str):
    """mapInArrow closure: signed-random-projection signature per vector,
    emitted pre-exploded as (id, chunk, key) rows.

    The hyperplane matrix is regenerated from the fixed seed inside every
    task (RandomState is platform-deterministic), sized to the vector dim
    discovered from the first batch — nothing data-sized crosses the
    driver. One (batch x dim) @ (dim x num_bits) matmul per Arrow batch;
    bit packing and the explode are numpy reshapes, no per-row Python.
    """
    bits_per = num_bits // chunks

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        planes = None
        weights = (1 << np.arange(bits_per)).astype(np.int64)
        chunk_ids = None
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = np.asarray(batch.column(id_name), dtype=np.int64)
            vec_col = batch.column("__vec")
            mat = np.asarray(vec_col.flatten(), dtype=np.float64).reshape(
                batch.num_rows, -1)
            if planes is None:
                rng = np.random.RandomState(seed)
                planes = rng.standard_normal((num_bits, mat.shape[1]))
                chunk_ids = np.arange(chunks, dtype=np.int32)
            bits = (mat @ planes.T) >= 0.0            # (rows, num_bits)
            keys = (bits.reshape(batch.num_rows, chunks, bits_per)
                    .astype(np.int64) @ weights)      # (rows, chunks)
            yield pa.RecordBatch.from_arrays(
                [pa.array(np.repeat(ids, chunks), pa.int64()),
                 pa.array(np.tile(chunk_ids, batch.num_rows), pa.int32()),
                 pa.array(keys.ravel(), pa.int64())],
                [id_name, "__chunk", "__key"])

    return gen


def embedding_lsh_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    num_bits: int = 128,
    chunks: int = 16,
    seed: int = RH_SEED,
    max_bucket: int = 500,
) -> DataFrame:
    """Near-duplicate embedding pairs: random-hyperplane LSH candidates +
    exact cosine verify — the scale path :func:`embedding_near_dups`
    deliberately isn't.

    A pair at angle θ disagrees on each signature bit with p = θ/π
    (signed random projections), so it shares a given 8-bit chunk with
    probability (1-p)^8 and is missed by ALL 16 chunks with probability
    (1 - (1-p)^8)^16 — for cosine 0.97 (the planted-dup regime) that is
    ~1e-5; false positives are removed entirely by the exact verify, so
    precision is exact and recall is the only probabilistic edge.

    Scale shape: signature generation is map-only; candidate generation
    is a key-equality self-join on (chunk, key) — never a cross join —
    with ``max_bucket`` capping degenerate buckets exactly like
    :func:`minhash_lsh_pairs`; the exact verify touches O(candidates)
    vectors. Every shuffle keys on (chunk, key) or pair ids.
    """
    base = ensure_parallelism(df).select(F.col(id_col).alias("__id"),
                                         F.col(vec_col).alias("__vec"))
    sig = base.mapInArrow(
        _rh_sig_stage(num_bits, chunks, seed, "__id"),
        "__id long, __chunk int, __key long")
    sized = sig.withColumn(
        "__bucket_n",
        F.count(F.lit(1)).over(Window.partitionBy("__chunk", "__key")),
    ).filter(F.col("__bucket_n") <= max_bucket).drop("__bucket_n")
    left = sized.alias("l")
    right = sized.alias("r")
    cand = (
        left.join(right, ["__chunk", "__key"])
        .filter(F.col("l.__id") < F.col("r.__id"))
        .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
        .distinct()
    )
    return verify_pairs_cosine(cand, df, id_col, vec_col, threshold)


def ngram_overlap_join(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """Exact n-gram decontamination (the GPT-3-style eval-overlap rule):
    every (train doc, eval doc) pair sharing at least one word n-gram,
    with the shared-gram count. Complements :func:`minhash_lsh_join` —
    LSH finds NEAR duplicates above a Jaccard threshold; this finds exact
    verbatim substring leakage of length >= n tokens, however small the
    overall similarity (a benchmark answer pasted into one line of a long
    training document).

    Scale shape: the eval corpus is benchmark-sized, so its exploded
    distinct grams broadcast; the train side explodes to (doc, gram)
    pairs and the broadcast hash join filters them map-side — the only
    exchange is the final (train_id, eval_id) aggregate over actual hits.
    At 10^12 train rows that is one scan + one hit-sized shuffle. For an
    eval set too large to broadcast, drop the hint and the same plan
    degrades to a shuffle join on the gram key.

    Returns (train_id, eval_id, n_shared) — n_shared counts DISTINCT
    shared grams (both sides deduplicate their grams first, so the count
    is |gram-set intersection|, insensitive to repetition).
    """
    tr = ensure_parallelism(train_df).select(
        F.col(id_col).alias("train_id"),
        F.explode(shingles(F.col(text_col), n)).alias("__g"))
    ev = eval_df.select(
        F.col(id_col).alias("eval_id"),
        F.explode(shingles(F.col(text_col), n)).alias("__g"))
    hits = tr.join(F.broadcast(ev), "__g")
    return hits.groupBy("train_id", "eval_id").agg(
        F.count_distinct(F.col("__g")).alias("n_shared"))


def positional_shingles(c: Column, n: int = 8) -> Column:
    """Word n-grams of a single-space-separated text IN ORDER, with
    duplicates kept — the positional complement of :func:`shingles`
    (which deduplicates for set-similarity). ``posexplode`` over this
    array yields (0-based gram position, gram). Documents shorter than
    ``n`` tokens yield an empty array (they cannot contain an n-token
    span)."""
    toks = tokens(c)
    k = F.size(toks) - (n - 1)
    return F.when(k >= 1, F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )).otherwise(F.array().cast("array<string>"))


def substring_span_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    max_gram_occurrences: int = 64,
) -> DataFrame:
    """Within-corpus exact substring dedup (the Lee et al. 2022
    "Deduplicating Training Data" rule): every document pair sharing a
    verbatim token run of >= ``n`` tokens, with the DISTINCT shared-gram
    count and the LONGEST shared aligned span in tokens. A pasted
    paragraph inside two otherwise-different documents has tiny Jaccard
    (invisible to MinHash) but a long exact span — this finds it.

    Algorithm: posexplode positional n-grams; group by gram with
    collect_list of (doc, pos) occurrences; drop "spam grams" whose
    occurrence list exceeds ``max_gram_occurrences`` (the standard
    super-frequent-gram filter, which is ALSO the memory/skew bound:
    every surviving group holds <= cap structs); generate all
    cross-document occurrence pairs INSIDE the group with array
    functions (<= cap^2 per gram, no self-join); group hits per
    (pair, diagonal pa-pb) and run islands-and-gaps over consecutive
    positions — a maximal island of k aligned grams is a shared span
    of k + n - 1 tokens.

    Scale shape: the corpus is scanned ONCE and shuffled ONCE (on the
    gram key — the aggregate's partial phase shrinks nothing, but the
    spam cap bounds every reduce-side group); there is no frequency
    pre-pass and no self-join, so no duplicated subtree. Everything
    after is hit-sized and single-pass: one exchange on (id_a, id_b)
    serves the distinct-gram dense_rank, the per-diagonal run window
    (its partition keys are a superset, so only a re-sort is added),
    and both final aggregates — the distinct-shared-gram count rides
    along as max(dense_rank). Never a cross join.
    """
    g = (ensure_parallelism(df)
         .select(F.col(id_col).alias("id"),
                 F.posexplode(positional_shingles(F.col(text_col), n))
                 .alias("p", "__g")))
    return (aligned_span_pairs(g, max_gram_occurrences, span_extra=n - 1)
            .withColumnRenamed("max_span", "max_span_tokens"))


def aligned_span_pairs(g: DataFrame, max_occurrences: int = 64,
                       span_extra: int = 0) -> DataFrame:
    """Shared-span detection over any positional-token table
    ``(id, p, __g)`` — the engine behind both text substring dedup
    (tokens = word n-grams) and audio span dedup (tokens = exact PCM
    chunk digests). Emits per (id_a, id_b): ``n_shared`` distinct shared
    tokens and ``max_span`` = longest run of consecutively aligned
    positions + ``span_extra`` (n-1 for n-gram tokens, 0 for unit
    tokens like chunks).

    Occurrence lists are collect_SET per token, so exact duplicate
    (id, p) occurrences (e.g. a duplicated fixture row) collapse; the
    ``max_occurrences`` cap drops spam tokens and bounds every group.
    Scale shape: one token-key shuffle (cap-bounded reduce groups,
    pairs generated in-group — no self-join), then one exchange on
    (id_a, id_b) serving the dense_rank, the per-diagonal run window
    (superset partition keys — re-sort only), and both aggregates.
    """
    occ = (g.groupBy("__g")
           .agg(F.collect_set(F.struct("id", "p")).alias("occ"))
           .filter(F.size("occ") <= max_occurrences))
    # all i<j occurrence pairs within the (cap-bounded) token group
    pair_list = F.expr(
        "flatten(transform(occ, (x, i) -> transform("
        "  slice(occ, i + 2, greatest(0, size(occ) - i - 1)),"
        "  y -> struct(x, y))))")
    pr = occ.select("__g", F.explode(pair_list).alias("pr"))
    x_id, y_id = F.col("pr.x.id"), F.col("pr.y.id")
    x_p, y_p = F.col("pr.x.p"), F.col("pr.y.p")
    hits = (pr.filter(x_id != y_id)
            .select("__g",
                    F.when(x_id < y_id, x_id).otherwise(y_id).alias("id_a"),
                    F.when(x_id < y_id, y_id).otherwise(x_id).alias("id_b"),
                    F.when(x_id < y_id, x_p).otherwise(y_p).alias("pa"),
                    F.when(x_id < y_id, y_p).otherwise(x_p).alias("pb"))
            .withColumn("__diag", F.col("pa") - F.col("pb")))
    wg = Window.partitionBy("id_a", "id_b").orderBy("__g")
    wd = Window.partitionBy("id_a", "id_b", "__diag").orderBy("pa")
    new_run = F.when(F.col("pa") - F.lag("pa").over(wd) == 1, 0).otherwise(1)
    ranked = (hits
              .withColumn("__dr", F.dense_rank().over(wg))
              .withColumn("__run", F.sum(new_run).over(
                  wd.rowsBetween(Window.unboundedPreceding, 0))))
    return (ranked
            .groupBy("id_a", "id_b", "__diag", "__run")
            .agg(F.count(F.lit(1)).alias("__len"),
                 F.max("__dr").alias("__mdr"))
            .groupBy("id_a", "id_b")
            .agg(F.max("__mdr").cast("long").alias("n_shared"),
                 (F.max("__len") + F.lit(span_extra)).alias("max_span"))
            .select("id_a", "id_b", "n_shared", "max_span"))
