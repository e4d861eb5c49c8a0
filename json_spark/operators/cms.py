"""Count-Min Sketch frequency estimation — the third mergeable sketch.

The engine's sketch family covers distinct counts (HLL++,
operators/uniqueness.py), quantiles (KLL, functions/kll.py) and now
FREQUENCIES: a d×w counter grid where each of d independent hashes
buckets every token into w slots, and a point estimate is the MIN of a
token's d counters — always an overestimate, within εN of truth with
probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉ (Cormode & Muthukrishnan,
J. Algorithms 55(1), 2005). Unlike the exact top-k
(curation.py:token_heavy_hitters) whose state is vocabulary-sized, the
CMS state is a FIXED d×w grid regardless of vocabulary — the shape that
survives a 10^12-token corpus with an adversarial vocabulary.

Everything is JVM Column arithmetic: the seeded hash is the md5-lower-32
trick shared with operators/text.py:tok32, so DuckDB computes the
IDENTICAL grid and estimates — the oracle pins the full sketch build +
query path bit-for-bit (determinism check; the ε-bound and merge laws
are pinned in pytest against an exact twin).

Scale shape: explode → one (seed, slot)-keyed partial+final count whose
exchange is bounded by d×w rows per task; estimates join candidates
against the BROADCAST d×w grid. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

CMS_DEPTH = 3
CMS_WIDTH = 64


def cms_hash(c: Column, seed, width: int) -> Column:
    """Seeded slot hash: lower 32 bits of md5(seed || token) mod width —
    identical integers in Spark and DuckDB. ``seed`` may be a Python int
    or an integer Column (the build path fans seeds out columnarly)."""
    s = seed.cast("string") if isinstance(seed, Column) else F.lit(str(seed))
    h = F.conv(F.substring(F.md5(F.concat(s, c)), 1, 8),
               16, 10).cast("long")
    return F.pmod(h, F.lit(width))


def cms_build(df: DataFrame, text_col: str,
              depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Build the d×w counter grid over whitespace tokens: one row per
    (seed, slot) with its count. Fixed-size output (≤ depth·width rows)
    whatever the corpus."""
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("t"))
    # Tokenize ONCE: fan the d seeds out from a literal array on the
    # already-exploded token rows, instead of unioning d projections of
    # the token table (which would scan + explode the corpus d times).
    stacked = toks.select(
        F.col("t"),
        F.explode(F.array(*[F.lit(s) for s in range(depth)])).alias("seed"))
    return (stacked
            .select(F.col("seed"),
                    cms_hash(F.col("t"), F.col("seed"), width).alias("slot"))
            .groupBy("seed", "slot").agg(F.count(F.lit(1)).alias("n")))


def cms_estimate(grid: DataFrame, candidates: DataFrame, token_col: str,
                 depth: int = CMS_DEPTH,
                 width: int = CMS_WIDTH) -> DataFrame:
    """Point-estimate each candidate token: min over seeds of its slot
    counter. ``grid`` is the cms_build output (broadcast — it is at most
    d×w rows); returns candidates + ``cms_n``."""
    t = F.col(token_col)
    out = candidates
    for s in range(depth):
        g = (grid.where(F.col("seed") == s)
             .select(F.col("slot").alias(f"__slot{s}"),
                     F.col("n").alias(f"__n{s}")))
        out = out.join(F.broadcast(g),
                       cms_hash(t, s, width) == F.col(f"__slot{s}"),
                       "left").drop(f"__slot{s}")
    est = F.least(*[F.coalesce(F.col(f"__n{s}"), F.lit(0))
                    for s in range(depth)])
    return out.select(*candidates.columns, est.alias("cms_n"))
