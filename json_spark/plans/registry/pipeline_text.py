"""Registry section: training-data pipeline: text analysis, deduplication, ANN similarity (exact + IVF/PQ).

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
    _PCM_SAMPLES_CTE,
    _SNR_N,
)

# =========================================================================
# Training-data pipeline operators (brief: dedup / similarity / multimodal
# / text analysis). Text + dedup + ANN-exact are DuckDB-oracle-checked;
# probabilistic ANN (IVF) and binary-decode stages are rows-only with
# golden assertions in tests/.
# =========================================================================

from ...operators.dedup import (          # noqa: E402
    cosine,
    duplicate_clusters,
    embedding_lsh_pairs,
    embedding_near_dups,
    jaccard,
    minhash_lsh_join,
    minhash_lsh_pairs,
    shingles,
    simhash_pairs,
)
from ...operators.similarity import cosine_topk, ivf_topk, pick_centroids  # noqa: E402
from ...operators.text import (           # noqa: E402
    BPE_RE,
    fingerprint,
    predict_lang,
    quality_features,
    token_counts,
)
from ...operators.uniqueness import uniqueness_summary  # noqa: E402

# ---- text analysis ------------------------------------------------------

@register("text_token_stats", oracle="""
SELECT source,
       count(*) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens_ws,
       CAST(sum(len(regexp_extract_all(
           text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))) AS BIGINT)
         AS sum_tokens_bpe,
       round(avg(length(text)), 6) AS avg_chars
FROM documents GROUP BY source
""")
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = token_counts(F.col("text"))
    return d.select(
        "source",
        t["n_tokens_ws"].alias("ws"),
        t["n_tokens_bpe"].alias("bpe"),
        F.length("text").alias("nc"),
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws").alias("sum_tokens_ws"),
        F.sum("bpe").alias("sum_tokens_bpe"),
        F.round(F.avg("nc"), 6).alias("avg_chars"),
    )


@register("text_quality", oracle="""
WITH f AS (
  SELECT source,
         len(string_split(text, ' ')) AS n_tokens,
         length(text) AS n_chars,
         len(list_filter(string_split(text, ' '),
             t -> t IN ('the','a','of','and','to','in','is','it'))) AS n_stop,
         len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_punct
  FROM documents),
s AS (
  SELECT source,
         least(1.0, n_tokens / 50.0) * 0.5
         + (n_stop::DOUBLE / n_tokens) * 0.3
         + (1.0 - n_punct::DOUBLE / n_chars) * 0.2 AS score
  FROM f)
SELECT source, count(*) AS n_docs,
       round(avg(score), 6) AS avg_quality,
       round(min(score), 6) AS min_quality,
       round(max(score), 6) AS max_quality
FROM s GROUP BY source
""")
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    q = quality_features(F.col("text"))
    return d.select("source", q["quality_score"].alias("score")).groupBy(
        "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("score"), 6).alias("avg_quality"),
        F.round(F.min("score"), 6).alias("min_quality"),
        F.round(F.max("score"), 6).alias("max_quality"),
    )


@register("text_langid", oracle="""
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
  SELECT lang,
    CASE
      WHEN s_en = greatest(s_en,s_de,s_fr,s_es) AND greatest(s_en,s_de,s_fr,s_es) >= 1 THEN 'en'
      WHEN s_de = greatest(s_en,s_de,s_fr,s_es) AND greatest(s_en,s_de,s_fr,s_es) >= 1 THEN 'de'
      WHEN s_fr = greatest(s_en,s_de,s_fr,s_es) AND greatest(s_en,s_de,s_fr,s_es) >= 1 THEN 'fr'
      WHEN s_es = greatest(s_en,s_de,s_fr,s_es) AND greatest(s_en,s_de,s_fr,s_es) >= 1 THEN 'es'
      ELSE 'und' END AS predicted_lang
  FROM sc)
SELECT lang, predicted_lang, count(*) AS n FROM p GROUP BY lang, predicted_lang
""")
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "lang", predict_lang(F.col("text")).alias("predicted_lang")
    ).groupBy("lang", "predicted_lang").agg(F.count(F.lit(1)).alias("n"))


@register("text_fingerprint", oracle="""
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT,
           [('0x' || substr(md5(t), 1, 8))::BIGINT
            for t in string_split(text, ' ')]),
         (acc, h) -> (acc * 131 + h) % 2147483647) AS fp
FROM documents
""")
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint(F.col("text")).alias("fp"))


@register("text_tfidf", oracle="""
WITH dt AS (
  SELECT doc_id, t AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        FROM documents)
  GROUP BY doc_id, term),
dfq AS (SELECT term, count(*) AS df FROM dt GROUP BY term),
nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
ranked AS (
  SELECT dt.doc_id, dt.term, dt.tf, dfq.df,
         dt.tf * ln(nd.n_docs / dfq.df) AS score,
         row_number() OVER (
           PARTITION BY dt.doc_id
           ORDER BY dt.tf * ln(nd.n_docs / dfq.df) DESC, dt.term ASC)
           AS rank
  FROM dt JOIN dfq USING (term) CROSS JOIN nd)
SELECT doc_id, rank, term, tf, df, round(score, 6) AS tfidf
FROM ranked WHERE rank <= 3
""")
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction (operators/text.py:tfidf_topk): every
    document's top-3 terms by tf · ln(N/df) — keyword tagging and
    boilerplate discovery in one windowed-top-k pass. tf/df/N are exact
    integers; the single float op ln(N/df) runs on the identical double
    quotient in both engines and ties (equal tf and df) break on the
    term itself, so the selected top-k set — not just the scores — is
    engine-independent. Scale shape: explode → map-combinable
    (doc, term) hash agg; document frequency re-aggregates THAT frame
    (vocabulary-sized, broadcast back); the rank window shuffles the
    (doc, term) aggregate on doc_id, never raw tokens.
    """
    from ...operators.text import tfidf_topk
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return tfidf_topk(d, "text", "doc_id", k=3)


# ---- deduplication ------------------------------------------------------

def _docs_with_planted_copies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ exact copies (every 10th doc, id+100000) — both engines
    derive the identical union, then each runs its own dedup."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = d.filter(F.pmod("doc_id", F.lit(10)) == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text")
    return d.unionByName(copies)


@register("dedup_exact", oracle="""
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0),
counts AS (SELECT md5(text) AS k, count(*) AS c FROM all_docs GROUP BY 1)
SELECT CAST(sum(c) AS BIGINT) AS n_rows, count(*) AS n_keys,
       count(*) FILTER (WHERE c > 1) AS n_dup_keys,
       CAST(coalesce(sum(c) FILTER (WHERE c > 1), 0) AS BIGINT) AS n_dup_rows
FROM counts
""")
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_with_planted_copies(spark, sf_dir)
    return uniqueness_summary(docs.select(F.md5("text").alias("k")), "k")


_SHINGLE3_SQL = """
  SELECT doc_id,
         list_distinct(CASE WHEN len(toks) >= 3
           THEN [array_to_string(toks[i:i+2], ' ')
                 for i in generate_series(1, len(toks) - 2)]
           ELSE [array_to_string(toks, ' ')] END) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
"""


@register("dedup_minhash_lsh", oracle=f"""
WITH s AS ({_SHINGLE3_SQL})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.sh, b.sh))::DOUBLE
             / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
""")
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "doc_id", "text", n=3,
                              num_hashes=32, bands=16, threshold=0.5)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


@register("dedup_canonical", oracle=f"""
WITH RECURSIVE s AS ({_SHINGLE3_SQL}),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
        / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs),
reach(id, lbl) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.id),
labels AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id),
scored AS (
  SELECT doc_id AS id,
         least(1.0, n_tokens / 50.0) * 0.5
         + (n_stop::DOUBLE / n_tokens) * 0.3
         + (1.0 - n_punct::DOUBLE / n_chars) * 0.2 AS score
  FROM (SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               length(text) AS n_chars,
               len(list_filter(string_split(text, ' '),
                   t -> t IN ('the','a','of','and','to','in','is','it')))
                 AS n_stop,
               len(regexp_extract_all(text, '[^a-z0-9 ]')) AS n_punct
        FROM documents)),
m AS (SELECT l.cluster_id, l.id, sc.score
      FROM labels l JOIN scored sc USING (id)),
best AS (SELECT cluster_id, max(score) AS best_score,
                CAST(count(*) AS BIGINT) AS n_members
         FROM m GROUP BY cluster_id)
SELECT m.cluster_id, CAST(min(m.id) AS BIGINT) AS kept_id,
       round(b.best_score, 6) AS best_score, b.n_members,
       b.n_members - 1 AS n_dropped
FROM m JOIN best b USING (cluster_id)
WHERE m.score = b.best_score
GROUP BY m.cluster_id, b.best_score, b.n_members
""")
def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection over text near-dup clusters
    (operators/dedup.py:canonical_representatives) — the keep/drop
    decision a curation pipeline actually ships: per duplicate cluster
    keep the highest-quality member (text.py:quality_features score;
    min doc_id among exact ties — identical copies tie exactly), not
    the blind min-id representative. Pair generation is the PRODUCTION
    path (MinHash-banded candidates + exact Jaccard verify, the same
    contract dedup_minhash_lsh pins); the oracle closes the exhaustive
    pair set with a recursive CTE and replays the score arithmetic the
    text_quality oracle already proves bit-identical.

    Scale shape: LSH pair generation (banded equality self-join), min-
    label propagation (O(diameter) rounds over the member set), one
    member×score equi-join, two cluster-keyed map-combinable aggs —
    every post-banding exchange is bounded by the duplicate-member
    count, never the corpus.
    """
    from ...operators.dedup import canonical_representatives
    from ...operators.text import quality_features

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "doc_id", "text", n=3,
                              num_hashes=32, bands=16, threshold=0.5)
    labels = duplicate_clusters(pairs)
    scored = d.select(
        "doc_id",
        quality_features(F.col("text"))["quality_score"].alias("score"))
    out = canonical_representatives(labels, scored, "doc_id", "score")
    return out.select("cluster_id", "kept_id",
                      F.round("best_score", 6).alias("best_score"),
                      "n_members", "n_dropped")


_TEST_SHINGLE3_SQL = """
  SELECT doc_id,
         list_distinct(CASE WHEN len(toks) >= 3
           THEN [array_to_string(toks[i:i+2], ' ')
                 for i in generate_series(1, len(toks) - 2)]
           ELSE [array_to_string(toks, ' ')] END) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM test_docs)
"""


@register("contamination_check", oracle=f"""
WITH test_docs AS (
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 200000 AS doc_id,
         array_to_string(list_reverse(string_split(text, ' ')), ' ') AS text
  FROM documents WHERE doc_id % 10 = 5),
tr AS ({_SHINGLE3_SQL}),
te AS ({_TEST_SHINGLE3_SQL})
SELECT a.doc_id AS train_id, b.doc_id AS test_id,
       round(len(list_intersect(a.sh, b.sh))::DOUBLE
             / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
FROM tr a JOIN te b
  ON len(list_intersect(a.sh, b.sh))::DOUBLE
     / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
""")
def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination: cross-corpus near-dup JOIN
    (operators/dedup.py:minhash_lsh_join). The synthetic eval set is
    derived deterministically in BOTH engines — every 10th doc leaked
    verbatim (id+100000) plus every (10k+5)-th doc token-REVERSED
    (id+200000, a non-leaked control whose 3-gram shingles share nothing
    with the source unless the doc is shorter than 3 tokens). The oracle
    runs the exhaustive exact cross Jaccard; the Spark plan is banded-LSH
    candidates (key-equality join, never a cross join) + exact verify.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    test = d.filter(F.pmod("doc_id", F.lit(10)) == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    ).unionByName(
        d.filter(F.pmod("doc_id", F.lit(10)) == 5).select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.concat_ws(" ", F.reverse(F.split("text", " "))).alias("text")))
    pairs = minhash_lsh_join(d, test, "doc_id", "text", n=3,
                             num_hashes=32, bands=16, threshold=0.5)
    return pairs.select(F.col("id_left").alias("train_id"),
                        F.col("id_right").alias("test_id"),
                        F.round("jaccard", 6).alias("jaccard"))


@register("contamination_ngram_exact", oracle="""
WITH test_docs AS (
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 200000 AS doc_id,
         array_to_string(list_reverse(string_split(text, ' ')), ' ') AS text
  FROM documents WHERE doc_id % 10 = 5),
g8 AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(toks) >= 8
           THEN [array_to_string(toks[i:i+7], ' ')
                 for i in generate_series(1, len(toks) - 7)]
           ELSE [array_to_string(toks, ' ')] END) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
t8 AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(toks) >= 8
           THEN [array_to_string(toks[i:i+7], ' ')
                 for i in generate_series(1, len(toks) - 7)]
           ELSE [array_to_string(toks, ' ')] END) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM test_docs))
SELECT a.doc_id AS train_id, b.doc_id AS eval_id,
       len(list_intersect(a.sh, b.sh)) AS n_shared
FROM g8 a JOIN t8 b ON len(list_intersect(a.sh, b.sh)) >= 1
""")
def q_contamination_ngram_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram decontamination (operators/dedup.py:
    ngram_overlap_join): flags verbatim >=8-token substring leakage from
    the eval set into training data — the standard used to decontaminate
    LLM benchmarks, complementing `contamination_check`'s Jaccard-
    threshold near-dup rule (a pasted benchmark line in a long document
    has tiny Jaccard but certain 8-gram overlap). Same deterministic eval
    derivation as contamination_check: every 10th doc leaked verbatim,
    every (10k+5)-th token-reversed as a non-leaked control. The oracle
    computes the full exact gram-set intersection per pair; the Spark
    plan is explode + broadcast hash join + one hit-sized aggregate —
    never a cross join.
    """
    from ...operators.dedup import ngram_overlap_join
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    test = d.filter(F.pmod("doc_id", F.lit(10)) == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    ).unionByName(
        d.filter(F.pmod("doc_id", F.lit(10)) == 5).select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.concat_ws(" ", F.reverse(F.split("text", " "))).alias("text")))
    return ngram_overlap_join(d, test, "doc_id", "text", n=8)


@register("dedup_substring", oracle="""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 300000 AS doc_id,
         array_to_string(
           list_concat(toks[1:26], list_reverse(toks[27:])), ' ') AS text
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
  WHERE doc_id % 7 = 0),
docs AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM corpus),
g AS (
  SELECT d.doc_id, s.i - 1 AS p,
         array_to_string(d.toks[s.i:s.i+7], ' ') AS gm
  FROM docs d,
       LATERAL (SELECT unnest(range(1, len(d.toks) - 6)) AS i) s
  WHERE len(d.toks) >= 8),
kept AS (
  SELECT * FROM g
  WHERE gm IN (SELECT gm FROM g GROUP BY gm HAVING count(*) <= 64)),
hits AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.gm,
         a.p AS pa, a.p - b.p AS diag
  FROM kept a JOIN kept b ON a.gm = b.gm AND a.doc_id < b.doc_id),
runs AS (
  SELECT id_a, id_b, diag, pa,
         CASE WHEN pa - lag(pa) OVER
                     (PARTITION BY id_a, id_b, diag ORDER BY pa) = 1
              THEN 0 ELSE 1 END AS new_run
  FROM hits),
islands AS (
  SELECT id_a, id_b, diag, pa,
         SUM(new_run) OVER (PARTITION BY id_a, id_b, diag ORDER BY pa
                            ROWS UNBOUNDED PRECEDING) AS run_id
  FROM runs),
spans AS (
  SELECT id_a, id_b, CAST(MAX(cnt) + 7 AS BIGINT) AS max_span_tokens
  FROM (SELECT id_a, id_b, diag, run_id, count(*) AS cnt
        FROM islands GROUP BY id_a, id_b, diag, run_id)
  GROUP BY id_a, id_b),
shared AS (
  SELECT id_a, id_b, CAST(count(DISTINCT gm) AS BIGINT) AS n_shared
  FROM hits GROUP BY id_a, id_b)
SELECT s.id_a, s.id_b, sh.n_shared, s.max_span_tokens
FROM spans s JOIN shared sh USING (id_a, id_b)
""")
def q_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-corpus exact substring dedup (Lee et al. 2022's
    repeated-span rule, operators/dedup.py:substring_span_pairs): every
    document pair sharing a verbatim >=8-token run, with the distinct
    shared-gram count and the longest shared aligned span. Complements
    dedup_minhash_lsh (set similarity misses a pasted paragraph inside
    two long, otherwise-different documents) and contamination_ngram_
    exact (cross-corpus; this is the within-corpus variant with SPAN
    LENGTHS, not just overlap counts). The corpus is documents plus a
    deterministic plagiarism set: every 7th doc re-enters with its
    first 26 tokens verbatim and the tail token-reversed, so each
    derived doc shares exactly its prefix run with its source. The
    oracle replays the full pipeline in SQL — positional grams via
    LATERAL range, the same 64-occurrence spam-gram cap (which is also
    the skew bound: per-gram join buckets are <= cap^2), and
    islands-and-gaps over the (pair, diagonal) alignment — an
    independent window-function formulation of the Spark plan.
    """
    from ...operators.dedup import substring_span_pairs
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split("text", " ")
    derived = d.filter(F.pmod("doc_id", F.lit(7)) == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.concat_ws(" ", F.concat(
            F.slice(toks, 1, 26),
            F.reverse(F.slice(toks, 27,
                              F.greatest(F.lit(0), F.size(toks) - 26)))
        )).alias("text"))
    corpus = d.unionByName(derived)
    return substring_span_pairs(corpus, "doc_id", "text", n=8,
                                max_gram_occurrences=64)


@register("dedup_audio_span", oracle=f"""
WITH {_PCM_SAMPLES_CTE},
w AS (
  SELECT i, GREATEST(1, (CAST(sr_hz AS BIGINT) * 20) // 1000) AS w
  FROM clean),
od AS (
  SELECT s.clip_id AS id, s.j // c.w AS p,
         CAST(count(*) AS BIGINT) AS n, CAST(SUM(s.v) AS BIGINT) AS sv,
         CAST(SUM(abs(s.v)) AS BIGINT) AS sa,
         CAST(SUM((s.j % c.w) * s.v) AS BIGINT) AS jv
  FROM samples s JOIN w c USING (i)
  GROUP BY s.i, s.clip_id, s.j // c.w),
dd AS (
  SELECT s.clip_id || '-cut' AS id, (s.j - 2*c.w) // c.w AS p,
         CAST(count(*) AS BIGINT) AS n, CAST(SUM(s.v) AS BIGINT) AS sv,
         CAST(SUM(abs(s.v)) AS BIGINT) AS sa,
         CAST(SUM(((s.j - 2*c.w) % c.w) * s.v) AS BIGINT) AS jv
  FROM samples s JOIN w c USING (i) JOIN seeded sd USING (i)
  WHERE sd.seed % 5 = 0 AND s.j >= 2*c.w
  GROUP BY s.i, s.clip_id, (s.j - 2*c.w) // c.w),
tok AS (
  SELECT DISTINCT id, p,
         n || ':' || sv || ':' || sa || ':' || jv AS gm
  FROM (SELECT * FROM od UNION ALL SELECT * FROM dd)),
kept AS (
  SELECT * FROM tok
  WHERE gm IN (SELECT gm FROM tok GROUP BY gm HAVING count(*) <= 64)),
hits AS (
  SELECT a.id AS id_a, b.id AS id_b, a.gm,
         a.p AS pa, a.p - b.p AS diag
  FROM kept a JOIN kept b ON a.gm = b.gm AND a.id < b.id),
runs AS (
  SELECT id_a, id_b, diag, pa,
         CASE WHEN pa - lag(pa) OVER
                     (PARTITION BY id_a, id_b, diag ORDER BY pa) = 1
              THEN 0 ELSE 1 END AS new_run
  FROM hits),
islands AS (
  SELECT id_a, id_b, diag, pa,
         SUM(new_run) OVER (PARTITION BY id_a, id_b, diag ORDER BY pa
                            ROWS UNBOUNDED PRECEDING) AS run_id
  FROM runs),
spans AS (
  SELECT id_a, id_b, CAST(MAX(cnt) AS BIGINT) AS max_span_chunks
  FROM (SELECT id_a, id_b, diag, run_id, count(*) AS cnt
        FROM islands GROUP BY id_a, id_b, diag, run_id)
  GROUP BY id_a, id_b),
shared AS (
  SELECT id_a, id_b, CAST(count(DISTINCT gm) AS BIGINT) AS n_shared
  FROM hits GROUP BY id_a, id_b)
SELECT s.id_a, s.id_b, sh.n_shared, s.max_span_chunks
FROM spans s JOIN shared sh USING (id_a, id_b)
""")
def q_dedup_audio_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial audio-copy detection — the repeated-span dedup rule in
    the PCM DOMAIN: clip pairs sharing a verbatim run of 20 ms
    grid-aligned audio chunks, with the longest shared run length.
    Byte-exact dedup (audio_content_dedup) only catches whole-payload
    copies; perceptual dedup catches transformed whole clips; this
    catches a clip CONTAINING another clip's audio (a re-used segment,
    a truncated re-upload). Tokens are exact per-chunk int64 digest
    quadruples (operators/segmentation.py:pcm_chunk_digests, ungated —
    no reference needed, works on derived ids) fed to the same
    aligned-span engine as text (dedup.py:aligned_span_pairs;
    span_extra=0 since chunks are unit tokens).

    The corpus adds deterministic partial copies: every clip with
    crc32(clip_id) % 5 == 0 (excluding the planted-noise set, so the
    oracle stays analytic) re-enters as a head-cut derived clip —
    decode, drop the first 2 chunks of samples, re-encode
    (segmentation.py:slice_clips; exact int16 round-trip) — which
    therefore shares exactly its chunk grid shifted by 2 with its
    source. The oracle recomputes every original AND derived chunk
    digest from pure SQL trigonometry (the pcm_content_exact pinning),
    selects the derived set via the CRC-32 fold, and replays the
    islands alignment — no byte is read; a hash match proves decode,
    slicing, re-encode, digesting, and span alignment end-to-end.
    Noise clips sit in the corpus on the Spark side but pair with
    nothing (their digests are unique), matching their absence from
    the analytic oracle.

    Scale shape: two map-only Arrow stages (derive + digest; payloads
    never shuffle), one digest-key shuffle with cap-bounded groups,
    one (id_a, id_b) exchange — same plan family as dedup_substring.
    """
    from ...fixtures.gen import generate_clips
    from ...operators.dedup import aligned_span_pairs
    from ...operators.segmentation import pcm_chunk_digests, slice_clips
    clips = generate_clips(spark, _SNR_N, partitions=8)
    i_col = F.substring("clip_id", 6, 12).cast("long")
    sel = clips.filter(
        (F.crc32(F.encode(F.col("clip_id"), "utf-8")) % 5 == 0)
        & (F.pmod(i_col, F.lit(997)) != 996))
    corpus = clips.select("clip_id", "bytes").unionByName(
        slice_clips(sel, drop_chunks=2, chunk_ms=20)
        .select("clip_id", "bytes"))
    d = pcm_chunk_digests(corpus, chunk_ms=20)
    g = d.select(
        F.col("clip_id").alias("id"), F.col("chunk_idx").alias("p"),
        F.concat_ws(":", "n_samples", "pcm_sum", "pcm_abs_sum",
                    "pcm_jv_sum").alias("__g"))
    return (aligned_span_pairs(g, max_occurrences=64, span_extra=0)
            .withColumnRenamed("max_span", "max_span_chunks"))


@register("dedup_simhash", oracle="""
WITH d AS (
  SELECT doc_id,
         list_distinct([('0x' || substr(md5(t), 1, 8))::BIGINT
                        for t in string_split(text, ' ')]) AS hs
  FROM documents),
sh AS (
  SELECT doc_id,
         list_reduce(list_prepend(0::BIGINT,
           [CASE WHEN list_sum([CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END
                                for h in hs]) >= 0
                 THEN (1::BIGINT << b) ELSE 0::BIGINT END
            for b in generate_series(0, 31)]),
           (a, x) -> a + x) AS sim
  FROM d)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.sim, b.sim))::BIGINT AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sim, b.sim)) <= 3
""")
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return simhash_pairs(d, "doc_id", "text", max_hamming=3).select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


@register("dedup_ngram_jaccard", oracle="""
WITH s AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(toks) >= 2
           THEN [array_to_string(toks[i:i+1], ' ')
                 for i in generate_series(1, len(toks) - 1)]
           ELSE [array_to_string(toks, ' ')] END) AS sh
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
j AS (
  SELECT len(list_intersect(a.sh, b.sh))::DOUBLE
         / len(list_distinct(list_concat(a.sh, b.sh))) AS jac
  FROM s a JOIN s b ON b.doc_id = a.doc_id + 1)
SELECT CAST(floor(10 * jac) AS BIGINT) AS bucket, count(*) AS n
FROM j GROUP BY bucket
""")
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    s = d.select("doc_id", shingles(F.col("text"), 2).alias("sh"))
    a = s.alias("a")
    b = s.select((F.col("doc_id") - 1).alias("doc_id"),
                 F.col("sh").alias("sh_b")).alias("b")
    pairs = a.join(b, "doc_id").select(
        jaccard(F.col("sh"), F.col("sh_b")).alias("jac"))
    return pairs.groupBy(
        F.floor(10 * F.col("jac")).cast("long").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))


_EMB_FOLD_DOT = """
  list_reduce(list_prepend(0.0::DOUBLE,
    [CAST(a.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE)
     for i in generate_series(1, len(a.v))]), (x, y) -> x + y)
"""

_EMB_BASE_SQL = """
  base AS (
    SELECT vec_id, embedding AS v FROM embeddings
    UNION ALL
    SELECT vec_id + 100000,
           [CAST(embedding[i] AS DOUBLE)
            + CASE WHEN i = 1 THEN 0.25 ELSE 0.0 END
            for i in generate_series(1, len(embedding))]
    FROM embeddings WHERE vec_id % 10 = 0),
  normed AS (
    SELECT vec_id, v,
           sqrt(list_reduce(list_prepend(0.0::DOUBLE,
             [CAST(v[i] AS DOUBLE) * CAST(v[i] AS DOUBLE)
              for i in generate_series(1, len(v))]), (x, y) -> x + y)) AS nrm
    FROM base)
"""


def _emb_with_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = e.filter(F.pmod("vec_id", F.lit(10)) == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x.cast("double")
            + F.when(i == 0, F.lit(0.25)).otherwise(F.lit(0.0)),
        ).alias("embedding"),
    )
    return e.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    ).unionByName(planted)


@register("dedup_embedding_cosine", oracle=f"""
WITH {_EMB_BASE_SQL}
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({_EMB_FOLD_DOT} / (a.nrm * b.nrm), 6) AS cos
FROM normed a JOIN normed b ON a.vec_id < b.vec_id
WHERE {_EMB_FOLD_DOT} / (a.nrm * b.nrm) >= 0.9
""")
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _emb_with_planted(spark, sf_dir)
    return embedding_near_dups(base, "vec_id", "embedding", 0.9).select(
        "id_a", "id_b", F.round("cos", 6).alias("cos"))


@register("dedup_clusters", oracle=f"""
WITH RECURSIVE {_EMB_BASE_SQL},
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM normed a JOIN normed b ON a.vec_id < b.vec_id
  WHERE {_EMB_FOLD_DOT} / (a.nrm * b.nrm) >= 0.9),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs),
reach(id, lbl) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.id)
SELECT id, CAST(min(lbl) AS BIGINT) AS cluster_id
FROM reach GROUP BY id
""")
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over embedding near-dup pairs: the keep/drop
    labeling of a dedup pipeline (keep id == cluster_id). Pair generation
    is the PRODUCTION path — LSH-bucketed candidates with an exact cosine
    verify (embedding_lsh_pairs), not the O(n^2) self-join — while the
    oracle closes the exhaustive pairs with a recursive CTE: the two
    agree because the exact verify makes LSH precision exact and
    tests/test_pipeline.py pins LSH recall == exact on the planted
    fixture (per-pair miss probability ~1e-5 at the planted cosine).
    Spark runs min-label propagation (O(diameter) rounds)."""
    base = _emb_with_planted(spark, sf_dir)
    pairs = embedding_lsh_pairs(base, "vec_id", "embedding", 0.9)
    return duplicate_clusters(pairs).select("id", "cluster_id")


@register("dedup_embedding_lsh", oracle=f"""
WITH {_EMB_BASE_SQL}
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({_EMB_FOLD_DOT} / (a.nrm * b.nrm), 6) AS cos
FROM normed a JOIN normed b ON a.vec_id < b.vec_id
WHERE {_EMB_FOLD_DOT} / (a.nrm * b.nrm) >= 0.9
""")
def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the bucketed production path, held to the SAME exhaustive oracle as
    # dedup_embedding_cosine: the exact verify makes precision exact, and
    # the planted-pair cosine (~0.97) puts per-pair LSH miss probability
    # at ~1e-5 with the seeded hyperplanes — tests/test_pipeline.py
    # additionally asserts LSH == exact on the planted fixture
    base = _emb_with_planted(spark, sf_dir)
    return embedding_lsh_pairs(base, "vec_id", "embedding", 0.9).select(
        "id_a", "id_b", F.round("cos", 6).alias("cos"))


# ---- similarity search --------------------------------------------------

@register("ann_cosine_topk", oracle="""
WITH normed AS (
  SELECT vec_id, embedding AS v,
         sqrt(list_reduce(list_prepend(0.0::DOUBLE,
           [CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
            for i in generate_series(1, len(embedding))]), (x, y) -> x + y))
           AS nrm
  FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         list_reduce(list_prepend(0.0::DOUBLE,
           [CAST(q.v[i] AS DOUBLE) * CAST(n.v[i] AS DOUBLE)
            for i in generate_series(1, len(q.v))]), (x, y) -> x + y)
           / (q.nrm * n.nrm) AS cos
  FROM normed q JOIN normed n ON n.vec_id <> q.vec_id
  WHERE q.vec_id % 50 = 0),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos
FROM ranked WHERE rank <= 10
""")
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.pmod("vec_id", F.lit(50)) == 0)
    out = cosine_topk(e, queries, "vec_id", "embedding", k=10)
    return out.select("query_id", F.col("rank").cast("long").alias("rank"),
                      "neighbor_id", F.round("cos", 6).alias("cos"))


#: IVF index cache: centroids are deterministic in (data, k, iters) —
#: hash-ordered bootstrap + seedless Lloyd — so re-deriving them per call
#: only re-pays the index build a production system persists alongside
#: the assigned-vectors table
_IVF_CENTROIDS: dict[tuple, list] = {}


_PQ_BOOKS: dict = {}


@register("ann_pq_topk")
def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/pq.py): 8 subspaces × 64
    codewords — 8 int8 codes per 64-float vector (32× compression, the
    storage answer at 10^12 vectors), ADC lookup-table scoring over the
    compressed index, exact cosine re-rank of 8×k candidates. Recall is
    probabilistic ⇒ rows-only driver check; tests/test_pq.py pins
    recall@10 ≥ 0.8 vs the exact baseline (measured 0.96 on the
    isotropic fixture — PQ's worst case).
    """
    from ...operators.pq import pq_topk, train_codebooks
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.pmod("vec_id", F.lit(50)) == 0)
    key = (sf_dir, 8, 64)
    if key not in _PQ_BOOKS:
        _PQ_BOOKS[key] = train_codebooks(
            e, "vec_id", "embedding", m=8, ksub=64, refine_iters=3)
    return pq_topk(e, queries, "vec_id", "embedding", _PQ_BOOKS[key],
                   k=10, refine=8)


@register("ann_ivfpq_topk")
def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ hybrid ANN (operators/pq.py:ivfpq_topk — the FAISS IVFPQ
    shape): queries probe 8/16 IVF buckets, candidates carry only their
    8 PQ code bytes through the bucket join (32× less candidate traffic
    than floats), ADC scoring is a pure Column fold against a broadcast
    per-query lookup table, exact cosine re-ranks 8×k. Rows-only driver
    check; tests/test_pq.py pins recall@10 ≥ 0.75 vs the exact baseline
    (measured 0.88 on the isotropic fixture at half the index scanned).
    """
    from ...operators.pq import ivfpq_topk, train_codebooks
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.pmod("vec_id", F.lit(50)) == 0)
    ckey = (sf_dir, 16, 2)
    if ckey not in _IVF_CENTROIDS:
        _IVF_CENTROIDS[ckey] = pick_centroids(
            e, "vec_id", "embedding", k=16, refine_iters=2)
    bkey = (sf_dir, 8, 64)
    if bkey not in _PQ_BOOKS:
        _PQ_BOOKS[bkey] = train_codebooks(
            e, "vec_id", "embedding", m=8, ksub=64, refine_iters=3)
    return ivfpq_topk(e, queries, "vec_id", "embedding",
                      _IVF_CENTROIDS[ckey], _PQ_BOOKS[bkey],
                      k=10, nprobe=8, vec_nprobe=2, refine=8)


@register("ann_ivf_topk")
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # probabilistic recall ⇒ rows-only driver check; tests/test_pipeline.py
    # asserts recall vs the exact baseline
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.pmod("vec_id", F.lit(50)) == 0)
    key = (sf_dir, 16, 2)
    if key not in _IVF_CENTROIDS:
        _IVF_CENTROIDS[key] = pick_centroids(
            e, "vec_id", "embedding", k=16, refine_iters=2)
    return ivf_topk(e, queries, "vec_id", "embedding", _IVF_CENTROIDS[key],
                    k=10, nprobe=8, vec_nprobe=2)


@register("ann_recall_report")
def q_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible ANN recall: recall@10 of the three production
    index shapes (IVF, PQ, IVF-PQ) against the exact brute-force top-k
    (``ann_cosine_topk``, itself oracle-proven), joined on
    (query_id, neighbor_id). One row per method with the measured recall
    and its pytest floor — so the recall contract shows up in the
    CORRECTNESS/BENCH artifacts, not only in tests. Probabilistic values
    ⇒ rows-only driver check; floors are asserted here as a hard
    ``passes`` column and in tests/test_pq.py / test_pipeline.py.
    """
    exact = q_ann_cosine_topk(spark, sf_dir) \
        .select("query_id", "neighbor_id").persist()
    frames = []
    for method, fn, floor in (("ivf", q_ann_ivf_topk, 0.85),
                              ("pq", q_ann_pq_topk, 0.80),
                              ("ivfpq", q_ann_ivfpq_topk, 0.75)):
        approx = fn(spark, sf_dir).select(
            "query_id", "neighbor_id").distinct()
        j = exact.join(approx.withColumn("__hit", F.lit(1)),
                       ["query_id", "neighbor_id"], "left")
        hits = F.coalesce(F.sum("__hit"), F.lit(0))
        frames.append(j.agg(
            F.lit(method).alias("method"),
            F.countDistinct("query_id").alias("n_queries"),
            F.lit(10).cast("long").alias("k"),
            F.count(F.lit(1)).alias("n_exact_pairs"),
            hits.cast("long").alias("n_hits"),
            F.round(hits / F.count(F.lit(1)), 4).alias("recall_at_10"),
            F.lit(floor).alias("recall_floor"),
            (F.round(hits / F.count(F.lit(1)), 4) >= floor).alias("passes"),
        ))
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf)
    return out


