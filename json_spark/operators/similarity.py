"""Approximate-nearest-neighbor search over embedding columns.

Two paths, mirroring the brief's similarity-search requirement:

- ``cosine_topk``  : exact brute-force top-k per query — the correctness
  baseline, DuckDB-oracle-checked (plans/registry.py). Queries are
  broadcast; the scan over the vector table is embarrassingly parallel;
  per-query top-k is a window over the (small) query-candidate product.
- ``ivf_topk``     : IVF (inverted-file) variant — the 100 TB path.
  A deterministic centroid subset partitions the space; every vector is
  assigned to its nearest centroid by a VECTORIZED numpy matmul inside a
  ``mapInArrow`` stage (one BLAS call per Arrow batch — no per-row
  Python); queries probe only the ``nprobe`` nearest centroid lists, so
  the exact-cosine work drops from O(n_q * n) to O(n_q * n * nprobe/n_c).
  Probabilistic recall ⇒ rows-only driver check + a pytest recall floor
  vs the brute-force baseline.

The exact kernel (``dedup.cosine``) is a sequential double fold so the
oracle (list_reduce) matches bit-for-bit; ranking ties are broken by id.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import cosine


def cosine_topk(vectors: DataFrame, queries: DataFrame, id_col: str,
                vec_col: str, k: int = 10) -> DataFrame:
    """Exact top-k neighbors per query by cosine (desc), ties by neighbor
    id (asc); the query itself is excluded. ``queries`` is broadcast —
    at corpus scale the query batch is always << the vector table."""
    q = F.broadcast(queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")))
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nv"))
    scored = (
        q.crossJoin(v)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                cosine(F.col("__qv"), F.col("__nv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )


def _assign_stage(centroids: np.ndarray, nprobe: int, id_name: str):
    """mapInArrow closure: nearest-``nprobe`` centroid ids per vector via
    one (batch x dim) @ (dim x n_centroids) matmul per Arrow batch."""
    cnorm = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    def assign(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(id_name)
            vec_col = batch.column("__vec")
            # zero-copy flatten of the fixed-dim list<float> column
            mat = np.asarray(vec_col.flatten(), dtype=np.float64).reshape(
                batch.num_rows, -1)
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ cnorm.T                      # vectorized, no per-row
            top = np.argsort(-sims, axis=1)[:, :nprobe]
            out_ids, out_cent = [], []
            for j in range(len(top)):
                for c in top[j]:
                    out_ids.append(ids[j].as_py())
                    out_cent.append(int(c))
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_ids, ids.type), pa.array(out_cent, pa.int32())],
                [id_name, "centroid_id"])

    return assign


def pick_centroids(vectors: DataFrame, id_col: str, vec_col: str,
                   every: int = 37) -> list[list[float]]:
    """Deterministic centroid subset: every ``every``-th id. (Production
    would k-means-refine these; a fixed subset keeps runs reproducible
    and is the standard IVF bootstrap.)"""
    rows = (vectors.filter(F.pmod(id_col, F.lit(every)) == 0)
            .orderBy(id_col).select(vec_col).collect())
    return [list(r[0]) for r in rows]


def ivf_topk(vectors: DataFrame, queries: DataFrame, id_col: str,
             vec_col: str, centroids: list[list[float]], k: int = 10,
             nprobe: int = 3) -> DataFrame:
    """IVF ANN: centroid-bucketed candidate generation + exact re-rank.

    vectors → 1 bucket each (nprobe=1); queries → ``nprobe`` buckets;
    equality join on centroid_id yields the candidate lists, the exact
    cosine + window re-ranks. All shuffles key on centroid_id — at
    corpus scale that is the partitioning axis of the index table.
    """
    cents = np.asarray(centroids, dtype=np.float64)
    v_in = vectors.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("__vec"))
    q_in = queries.select(F.col(id_col).alias("query_id"),
                          F.col(vec_col).alias("__vec"))
    v_assigned = v_in.mapInArrow(
        _assign_stage(cents, 1, "neighbor_id"),
        "neighbor_id long, centroid_id int")
    q_assigned = q_in.mapInArrow(
        _assign_stage(cents, nprobe, "query_id"),
        "query_id long, centroid_id int")
    cand = (
        q_assigned.join(v_assigned, "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id").distinct()
    )
    scored = (
        cand.join(v_in.withColumnRenamed("__vec", "__nv"), "neighbor_id")
        .join(F.broadcast(q_in.withColumnRenamed("__vec", "__qv")), "query_id")
        .select("query_id", "neighbor_id",
                cosine(F.col("__qv"), F.col("__nv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )
