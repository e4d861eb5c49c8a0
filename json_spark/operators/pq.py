"""Product quantization (PQ) ANN — the memory-compression scale path.

At 10^12 vectors the raw float corpus (64 dims × 4 B = 256 B/vector) is
the storage bottleneck, not the scan: PQ splits each vector into ``m``
subvectors, k-means-quantizes every subspace independently, and stores
only the ``m`` code bytes (32× compression at m=8/ksub=16). Queries
score compressed codes by ADC (asymmetric distance computation): one
(m × ksub) lookup table of exact query-to-codeword dot products per
query, then every code's score is ``m`` table gathers — no float vectors
are touched until the final exact re-rank of a small candidate set.

Distributed shapes (mirroring operators/similarity.py):
- codebook training : hash-ordered exactly-ksub bootstrap (driver payload
  ksub × dim, never O(n)) + Lloyd refinement where every batch emits at
  most m × ksub partial rows (assignment is one reshape + einsum per
  batch — all m subspaces in one pass).
- encoding          : mapInArrow, one einsum per batch, codes emitted as
  a fixed-length tinyint array.
- search            : the query LUTs broadcast into an Arrow stage over
  the codes table; each batch emits its per-query top candidates
  (np.argpartition, vectorized), a window takes the global approximate
  top, and the exact cosine re-ranks only those. Shuffle volume is
  O(queries × candidates), never O(n).

Recall is probabilistic ⇒ rows-only driver check + a pytest recall floor
vs the exact baseline (PQ on an isotropic corpus is ANN's worst case;
re-ranking ``refine×k`` exact candidates restores most of it).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import cosine
from .similarity import MAX_QUERY_ROWS, _batch_matrix, check_query_bound


def _split(mat: np.ndarray, m: int) -> np.ndarray:
    """(rows × dim) → (rows × m × dsub)."""
    rows, dim = mat.shape
    return mat.reshape(rows, m, dim // m)


def _assign_codes(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Nearest codeword per subspace by L2 — one einsum for the cross
    terms, vectorized over (rows × m × ksub)."""
    sub = _split(mat, books.shape[0])                    # rows × m × dsub
    # ||x - c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per argmin
    cross = np.einsum("rmd,mkd->rmk", sub, books)
    c2 = np.sum(books ** 2, axis=2)                      # m × ksub
    return np.argmin(c2[None, :, :] - 2.0 * cross, axis=2)  # rows × m


def train_codebooks(vectors: DataFrame, id_col: str, vec_col: str,
                    m: int = 8, ksub: int = 16,
                    refine_iters: int = 2) -> np.ndarray:
    """(m × ksub × dsub) PQ codebooks. Bootstrap: the ksub hash-smallest
    vectors (TakeOrderedAndProject — bounded driver payload) seed every
    subspace; Lloyd steps assign all m subspaces in one Arrow pass and
    emit ≤ m × ksub partial rows per batch."""
    base = vectors.select(F.col(id_col).alias("__id"),
                          F.col(vec_col).alias("__vec"))
    rows = (base.orderBy(F.xxhash64("__id"), F.col("__id"))
            .limit(ksub).select("__vec").collect())
    seed = np.asarray([list(r[0]) for r in rows], dtype=np.float64)
    dim = seed.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    books = np.ascontiguousarray(
        _split(seed, m).transpose(1, 0, 2))              # m × ksub × dsub

    for _ in range(refine_iters):
        b = books

        def partials(batches: Iterator[pa.RecordBatch],
                     books_=b) -> Iterator[pa.RecordBatch]:
            mm, kk, dd = books_.shape
            for batch in batches:
                if batch.num_rows == 0:
                    continue
                mat = _batch_matrix(batch, "__vec")
                codes = _assign_codes(mat, books_)       # rows × m
                sub = _split(mat, mm)                    # rows × m × dsub
                out_sub, out_code, out_n, out_sum = [], [], [], []
                for s in range(mm):
                    counts = np.bincount(codes[:, s], minlength=kk)
                    sums = np.zeros((kk, dd))
                    np.add.at(sums, codes[:, s], sub[:, s, :])
                    nz = np.nonzero(counts)[0]
                    out_sub.extend([s] * len(nz))
                    out_code.extend(nz.tolist())
                    out_n.extend(counts[nz].tolist())
                    out_sum.extend(list(sums[nz]))
                yield pa.RecordBatch.from_arrays(
                    [pa.array(out_sub, pa.int32()),
                     pa.array(out_code, pa.int32()),
                     pa.array(out_n, pa.int64()),
                     pa.array(out_sum, pa.list_(pa.float64()))],
                    ["sub", "code", "n", "sum_vec"])

        cells = (base.select("__vec").mapInArrow(
            partials, "sub int, code int, n long, sum_vec array<double>")
            .select("sub", "code", "n",
                    F.posexplode("sum_vec").alias("pos", "val"))
            .groupBy("sub", "code", "pos")
            .agg(F.sum("val").alias("s"), F.sum("n").alias("cnt"))
            .collect())
        sums = np.zeros_like(books)
        counts = np.zeros(books.shape[:2])
        for r in cells:
            sums[r["sub"], r["code"], r["pos"]] = r["s"]
            counts[r["sub"], r["code"]] = r["cnt"]
        nz = counts > 0
        books[nz] = sums[nz] / counts[nz][:, None]

    return books


def pq_encode(vectors: DataFrame, id_col: str, vec_col: str,
              books: np.ndarray) -> DataFrame:
    """(id, codes tinyint[m]) — the compressed index, m bytes/vector."""
    def enc(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = np.asarray(batch.column("__id"), dtype=np.int64)
            codes = _assign_codes(_batch_matrix(batch, "__vec"), books)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()),
                 pa.array(list(codes.astype(np.int8)),
                          pa.list_(pa.int8()))],
                ["__id", "codes"])

    return (vectors.select(F.col(id_col).alias("__id"),
                           F.col(vec_col).alias("__vec"))
            .mapInArrow(enc, "__id long, codes array<tinyint>")
            .withColumnRenamed("__id", id_col))


def ivfpq_topk(vectors: DataFrame, queries: DataFrame, id_col: str,
               vec_col: str, centroids: list[list[float]],
               books: np.ndarray, k: int = 10, nprobe: int = 8,
               vec_nprobe: int = 2, refine: int = 4,
               max_query_rows: int = MAX_QUERY_ROWS) -> DataFrame:
    """IVF-PQ hybrid (the FAISS IVFPQ shape): vectors land in their
    ``vec_nprobe`` nearest IVF buckets carrying only their PQ codes;
    queries probe ``nprobe`` buckets; the equality join on centroid_id
    yields candidates whose ADC score is computed as a PURE COLUMN
    expression (a fold over the code array against the query's flattened
    lookup table, joined from a broadcast queries frame — no Python
    touches the joined stream); a window keeps ``refine × k`` per query
    and the exact cosine re-ranks those.

    vs plain PQ: the bucket join means only ~nprobe/n_centroids of the
    compressed index is scored per query. vs plain IVF: candidates
    shuffle as m code bytes, not dim floats — at 10^12 vectors the
    candidate traffic shrinks 32×.
    """
    from .similarity import _assign_stage

    check_query_bound(queries, max_query_rows, "ivfpq_topk")
    cents = np.asarray(centroids, dtype=np.float64)
    m, ksub, _ = books.shape

    codes_df = pq_encode(vectors, id_col, vec_col, books)
    v_in = vectors.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("__vec"))
    v_assigned = (v_in.mapInArrow(
        _assign_stage(cents, vec_nprobe, "neighbor_id"),
        "neighbor_id long, centroid_id int")
        .join(codes_df.withColumnRenamed(id_col, "neighbor_id"),
              "neighbor_id"))

    q_in = queries.select(F.col(id_col).alias("query_id"),
                          F.col(vec_col).alias("__vec"))
    q_assigned = q_in.mapInArrow(
        _assign_stage(cents, nprobe, "query_id"),
        "query_id long, centroid_id int")

    # flattened per-query LUT rides a broadcast join: lut[s*ksub + c]
    q_rows = q_in.collect()
    q_ids = [r["query_id"] for r in q_rows]
    q_mat = np.asarray([list(r["__vec"]) for r in q_rows],
                       dtype=np.float64)
    luts = np.einsum("qmd,mkd->qmk", _split(q_mat, m), books)
    spark = vectors.sparkSession
    luts_df = spark.createDataFrame(
        [(int(q), [float(x) for x in lut.ravel()])
         for q, lut in zip(q_ids, luts)],
        "query_id long, __lut array<double>")

    cand = (q_assigned.join(v_assigned, "centroid_id")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", "codes").distinct()
            .join(F.broadcast(luts_df), "query_id"))
    sub_idx = F.sequence(F.lit(0), F.lit(m - 1))
    adc = F.aggregate(
        F.zip_with(sub_idx, F.col("codes"),
                   lambda s, c: F.element_at(
                       "__lut", (s * ksub + c.cast("int") + 1).cast("int"))),
        F.lit(0.0), lambda acc, x: acc + x)
    wa = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id").asc())
    shortlist = (cand.select("query_id", "neighbor_id", adc.alias("adc"))
                 .withColumn("__r", F.row_number().over(wa))
                 .filter(F.col("__r") <= refine * k)
                 .select("query_id", "neighbor_id"))

    scored = (shortlist
              .join(v_in.withColumnRenamed("__vec", "__nv"), "neighbor_id")
              .join(F.broadcast(q_in.withColumnRenamed("__vec", "__qv")),
                    "query_id")
              .select("query_id", "neighbor_id",
                      cosine(F.col("__qv"), F.col("__nv")).alias("cos")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "cos"))


def pq_topk(vectors: DataFrame, queries: DataFrame, id_col: str,
            vec_col: str, books: np.ndarray, k: int = 10,
            refine: int = 4,
            max_query_rows: int = MAX_QUERY_ROWS) -> DataFrame:
    """ADC search over the PQ codes + exact re-rank of ``refine × k``
    candidates per query. Queries (and their LUTs) ride the closure —
    queries ≪ corpus always; candidates shuffle, vectors never."""
    check_query_bound(queries, max_query_rows, "pq_topk")
    q_rows = queries.select(F.col(id_col).alias("query_id"),
                            F.col(vec_col).alias("__qv")).collect()
    q_ids = np.asarray([r["query_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.asarray([list(r["__qv"]) for r in q_rows], dtype=np.float64)
    # LUT[q, s, c] = q_sub(s) · codeword(s, c) — ADC then sums m gathers
    luts = np.einsum("qmd,mkd->qmk", _split(q_mat, books.shape[0]), books)
    n_cand = refine * k
    codes_df = pq_encode(vectors, id_col, vec_col, books)

    def adc(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        nq = luts.shape[0]
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = np.asarray(batch.column(id_col), dtype=np.int64)
            codes_col = batch.column("codes")
            if isinstance(codes_col, pa.ChunkedArray):
                codes_col = codes_col.combine_chunks()
            codes = np.asarray(codes_col.flatten(), dtype=np.int64).reshape(
                batch.num_rows, -1)                      # rows × m
            # scores[q, r] = Σ_s LUT[q, s, codes[r, s]] — pure gathers
            scores = luts[:, np.arange(codes.shape[1])[None, :],
                          codes].sum(axis=2)             # nq × rows
            keep = min(n_cand, scores.shape[1])
            top = np.argpartition(-scores, keep - 1, axis=1)[:, :keep]
            qi = np.repeat(q_ids, keep)
            ni = ids[top.ravel()]
            sc = np.take_along_axis(scores, top, axis=1).ravel()
            mask = qi != ni
            yield pa.RecordBatch.from_arrays(
                [pa.array(qi[mask], pa.int64()),
                 pa.array(ni[mask], pa.int64()),
                 pa.array(sc[mask], pa.float64())],
                ["query_id", "neighbor_id", "adc"])

    cand = codes_df.mapInArrow(
        adc, "query_id long, neighbor_id long, adc double")
    wa = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id").asc())
    shortlist = (cand.withColumn("__r", F.row_number().over(wa))
                 .filter(F.col("__r") <= n_cand)
                 .select("query_id", "neighbor_id"))

    v_in = vectors.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("__nv"))
    q_in = queries.select(F.col(id_col).alias("query_id"),
                          F.col(vec_col).alias("__qv"))
    scored = (shortlist.join(v_in, "neighbor_id")
              .join(F.broadcast(q_in), "query_id")
              .select("query_id", "neighbor_id",
                      cosine(F.col("__qv"), F.col("__nv")).alias("cos")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "cos"))
