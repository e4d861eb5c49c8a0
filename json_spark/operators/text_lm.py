"""Corpus bigram language model + surprisal scoring — the statistical
quality signal a curation pipeline uses after the cheap ratio filters:
documents whose token transitions are improbable under the corpus's own
bigram distribution (gibberish, wrong-language leakage, mangled OCR)
score high; boilerplate scores low.

Two deliberate passes over the corpus, because the LM is a reusable
artifact:
1. TRAIN: explode adjacent bigrams → one partial+final hash aggregate to
   (w1, w2, count); unigram (context) counts re-aggregate the bigram
   table — vocabulary-sized, never a second corpus scan.
2. SCORE: re-explode bigrams, join the probability table, and reduce to
   a per-group mean surprisal. The LM join is broadcast when the
   vocabulary fits (the common case: vocab ≪ corpus) and a plain
   equality shuffle join otherwise — never anything worse.

surprisal(w1 w2) = -log2( count(w1,w2) / count(w1,*) ), i.e. the
maximum-likelihood conditional with no smoothing — every scored bigram
was seen in training (the corpus scores itself), so probabilities are
exact rationals both engines compute identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_filters import bigrams
from .text import tokens


def bigram_counts(df: DataFrame, text_col: str,
                  broadcast_lm: bool = True) -> DataFrame:
    """(w1, w2, n2, n1) — bigram count plus its context (w1) total, the
    sufficient statistics of the conditional bigram LM. The context
    totals re-aggregate the bigram table (vocab², tiny), not the corpus.
    ``broadcast_lm=False`` drops the context-join broadcast hint for
    vocabularies too large to ship whole (AQE then picks the join).
    """
    pairs = (df.select(F.explode(bigrams(tokens(F.col(text_col))))
                       .alias("bg"))
             .select(F.split("bg", " ")[0].alias("w1"),
                     F.split("bg", " ")[1].alias("w2")))
    c2 = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = c2.groupBy("w1").agg(F.sum("n2").alias("n1"))
    return c2.join(F.broadcast(c1) if broadcast_lm else c1, "w1")


def surprisal_scores(df: DataFrame, text_col: str,
                     group_cols: list[str],
                     lm: DataFrame | None = None,
                     broadcast_lm: bool = True) -> DataFrame:
    """Mean bigram surprisal per group: every adjacent bigram occurrence
    is scored -log2(n2/n1) against ``lm`` (default: a model trained on
    ``df`` itself) and averaged. Emits (group..., n_bigrams,
    avg_surprisal).

    ``broadcast_lm=True`` (default) hints the LM join broadcast — right
    whenever the vocabulary fits in executor memory, the common case.
    Pass ``False`` for a huge vocabulary: the hint is dropped and
    AQE/Catalyst picks the join (a plain equality shuffle join at worst),
    instead of OOMing the driver on a forced broadcast.
    """
    if lm is None:
        lm = bigram_counts(df, text_col, broadcast_lm=broadcast_lm)
    occ = (df.select(*group_cols,
                     F.explode(bigrams(tokens(F.col(text_col))))
                     .alias("bg"))
           .select(*group_cols,
                   F.split("bg", " ")[0].alias("w1"),
                   F.split("bg", " ")[1].alias("w2")))
    scored = occ.join(F.broadcast(lm) if broadcast_lm else lm,
                      ["w1", "w2"])
    s = -F.log2(F.col("n2") / F.col("n1"))
    return scored.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg(s), 6).alias("avg_surprisal"))
