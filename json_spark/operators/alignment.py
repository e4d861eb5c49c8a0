"""Word-level sequence alignment: WER (word error rate) + edit-op counts.

The brief's per-row invariant is transcript EQUALITY (repo:BASELINE.json
input_hint — "decoded-PCM allclose (SNR>=30dB) + transcript equality"),
the lifted form of the reference's strict string semantics
(internal/dirtyjson/dirtytypes.go:284-296: a String decodes strictly or
not at all). Equality is the GREEN/RED boundary; this module adds the
graded YELLOW band every ASR/training pipeline actually reports: the
word-level Levenshtein distance between a reference transcript and a
hypothesis, normalized to WER = distance / |ref words|, plus the
substitution / insertion / deletion decomposition from the DP backtrace.
A re-punctuation (WER ~0.02) and a rewrite (WER ~0.8) stop being the
same "not equal" verdict — mirroring how the engine's coercion ladder
splits the reference's single decode-error into YELLOW (recovered) vs
RED (lossy), result.go:4-18.

Kernel: classic O(n*m) DP over whitespace tokens, vectorized one DP row
at a time in numpy inside ``mapInArrow`` (Arrow batches in, Arrow
batches out — no per-row Python at the boundary). Transcripts are
short (bounded words per row), so the per-row cost is a small constant;
there is NO shuffle — the stage is map-only over the source
partitioning, and the output is 5 scalars per row.

Backtrace tie-break (deterministic, documented): diagonal match first,
then substitution, then deletion (ref word dropped), then insertion.
Ties can genuinely occur on adversarial pairs; op counts are therefore
"a minimal script", while ``distance`` itself is unique.

Scale shape at 10^12 rows: map-only, no exchange, no driver state;
the aggregate consumers (per-mode / per-partition WER rollups) reduce
to map-combinable sums before any shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

STAT_FIELDS = ("n_ref int, distance int, "
               "n_sub int, n_del int, n_ins int")


def _align(a: list[str], b: list[str]) -> tuple[int, int, int, int]:
    """(distance, n_sub, n_del, n_ins) for ref tokens ``a`` -> hyp ``b``.

    Full DP matrix (rows = ref prefix, cols = hyp prefix), numpy row
    sweep; backtrace prefers match > substitution > deletion > insertion.
    """
    n, m = len(a), len(b)
    if n == 0:
        return m, 0, 0, m
    if m == 0:
        return n, 0, n, 0
    bv = np.array(b, dtype=object)
    idx = np.arange(1, m + 1, dtype=np.int32)
    dp = np.empty((n + 1, m + 1), dtype=np.int32)
    dp[0] = np.arange(m + 1, dtype=np.int32)
    g = np.empty(m + 1, dtype=np.int32)
    for i in range(1, n + 1):
        dp[i, 0] = i
        sub = dp[i - 1, :-1] + (bv != a[i - 1]).astype(np.int32)
        # delete ref word i-1: dp[i-1, j] + 1 ; insert hyp word: left + 1
        best = np.minimum(sub, dp[i - 1, 1:] + 1)
        # insertion recurrence row[j] = min(best[j-1], row[j-1]+1) is a
        # prefix-min in disguise: row[j] = j + min_{t<=j} g_t with
        # g_0 = i, g_t = best[t-1] - t — one numpy accumulate, no
        # per-cell Python loop
        g[0] = i
        g[1:] = best - idx
        dp[i, 1:] = np.minimum.accumulate(g)[1:] + idx
    dist = int(dp[n, m])
    n_sub = n_del = n_ins = 0
    i, j = n, m
    while i > 0 or j > 0:
        if i > 0 and j > 0 and dp[i, j] == dp[i - 1, j - 1] \
                and a[i - 1] == b[j - 1]:
            i -= 1
            j -= 1
        elif i > 0 and j > 0 and dp[i, j] == dp[i - 1, j - 1] + 1:
            n_sub += 1
            i -= 1
            j -= 1
        elif i > 0 and dp[i, j] == dp[i - 1, j] + 1:
            n_del += 1
            i -= 1
        else:
            n_ins += 1
            j -= 1
    return dist, n_sub, n_del, n_ins


def word_edit_stats(df: DataFrame, ref_col: str, hyp_col: str,
                    passthrough: list[str] | None = None) -> DataFrame:
    """Per-row word-level alignment stats: (*passthrough, n_ref,
    distance, n_sub, n_del, n_ins). Null ref or hyp yields null stats
    (the clean-first ladder's "undecodable -> null" stance, not a task
    kill). ``passthrough`` columns (ids, group keys) are echoed through
    the Arrow kernel untouched so downstream rollups need no re-join.

    Tokenization is single-space split, matching operators/text.py
    ``tokens`` and the corpus contract (single-space separated).
    """
    passthrough = passthrough or []
    cols = df.select(*passthrough, ref_col, hyp_col)
    n_pass = len(passthrough)
    pass_ddl = "".join(
        f"{f.name} {f.dataType.simpleString()}, "
        for f in cols.schema.fields[:n_pass])
    out_names = passthrough + ["n_ref", "distance",
                               "n_sub", "n_del", "n_ins"]

    def kern(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            refs = batch.column(n_pass).to_pylist()
            hyps = batch.column(n_pass + 1).to_pylist()
            o_n, o_d, o_s, o_dl, o_i = [], [], [], [], []
            for r, h in zip(refs, hyps):
                if r is None or h is None:
                    o_n.append(None)
                    o_d.append(None)
                    o_s.append(None)
                    o_dl.append(None)
                    o_i.append(None)
                    continue
                ra = r.split(" ") if r else []
                ha = h.split(" ") if h else []
                d, s, dl, ins = _align(ra, ha)
                o_n.append(len(ra))
                o_d.append(d)
                o_s.append(s)
                o_dl.append(dl)
                o_i.append(ins)
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(n_pass)]
                + [pa.array(o_n, pa.int32()), pa.array(o_d, pa.int32()),
                   pa.array(o_s, pa.int32()), pa.array(o_dl, pa.int32()),
                   pa.array(o_i, pa.int32())],
                out_names)

    return cols.mapInArrow(
        kern, pass_ddl + STAT_FIELDS)


def plant_word_edits(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Deterministic planted-edit hypothesis frame for the WER queries:
    each doc becomes (id, text, mode, k, n, hyp) by ``id % 4`` — clean
    copy / k out-of-vocab substitutions at distinct positions / k
    trailing deletions / k sentinel appends, k = 1 + (id div 4) % 3.
    Every sentinel costs exactly one edit op and never matches, so the
    true word-level Levenshtein distance is provably exactly k.

    k is clamped to n-1 (r3 ADVICE): on a foreign fixture with <10-word
    docs the surgery stays safe (no modulo-by-zero, no negative slice)
    and the distance==k invariant still holds — pinned for short docs in
    tests/test_alignment.py. Pure Column surgery (split/transform/
    slice), codegen end to end; no Python.
    """
    from pyspark.sql import functions as F

    prepared = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"),
        F.expr(f"CASE {id_col} % 4 WHEN 0 THEN 'clean' WHEN 1 THEN 'sub' "
               "WHEN 2 THEN 'del' ELSE 'ins' END").alias("mode"),
        F.expr(f"CASE WHEN {id_col} % 4 = 0 THEN 0 "
               f"ELSE least(1 + ({id_col} div 4) % 3, "
               f"           greatest(size(split({text_col}, ' ')) - 1, 0)) "
               "END").cast("int").alias("k"),
        F.size(F.split(text_col, " ")).alias("n"))
    return prepared.withColumn("hyp", F.expr("""
        CASE
          WHEN mode = 'clean' OR k = 0 THEN text
          WHEN mode = 'sub' THEN array_join(
            transform(split(text, ' '), (x, i) ->
              CASE WHEN i % (n div k) = 0 AND (i div (n div k)) < k
                   THEN concat('#s', i, '#') ELSE x END), ' ')
          WHEN mode = 'del' THEN array_join(
            slice(split(text, ' '), 1, n - k), ' ')
          ELSE concat(text, ' ', array_join(
            slice(array('#i0#', '#i1#', '#i2#'), 1, k), ' '))
        END"""))
