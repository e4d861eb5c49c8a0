"""Text-analysis operators for large-scale training-data pipelines.

Everything here is pure ``pyspark.sql.functions`` Column expressions —
whole-stage codegen applies, no Python reaches the hot path. The same
semantics are re-implemented independently in ANSI SQL by the oracle
entries in plans/registry.py, so every operator is DuckDB-checked.

Cross-engine determinism rules (shared with operators/dedup.py):
- token hash = lower 32 bits of md5 (``tok32``) — both engines compute
  the identical integer, unlike murmur3 (Spark) vs DuckDB's hash().
- rolling fingerprint = left fold with fixed modulus; Spark ``aggregate``
  and DuckDB ``list_reduce`` are both left folds, so values match bit-for-bit.

Operators (brief: language-ID n-gram heuristic, quality scoring, token
counting whitespace + BPE-ish regex, document fingerprinting rolling hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: BPE-ish pre-tokenizer: word pieces | digit runs | single punctuation
BPE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
PUNCT_RE = r"[^a-z0-9 ]"

EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

#: marker words per language for the n-gram/stopword language-ID heuristic;
#: order is the deterministic tie-break (first wins)
LANG_MARKERS = (
    ("en", ("the", "a", "of", "and", "is")),
    ("de", ("der", "die", "das", "und", "ist")),
    ("fr", ("le", "les", "des", "et", "est")),
    ("es", ("el", "los", "las", "y", "es")),
)

FINGERPRINT_MOD = 2_147_483_647  # 2^31 - 1
FINGERPRINT_MULT = 131


def tok32(c: Column) -> Column:
    """Stable 32-bit token hash both engines can compute: lower 32 bits of
    md5. DuckDB equivalent: ``('0x' || substr(md5(t),1,8))::BIGINT``."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def tokens(c: Column) -> Column:
    """Whitespace tokens (corpus is single-space separated)."""
    return F.split(c, " ")


def token_counts(c: Column) -> dict[str, Column]:
    """Whitespace token count + BPE-ish subword count (regex pieces)."""
    return {
        "n_tokens_ws": F.size(tokens(c)),
        "n_tokens_bpe": F.size(F.regexp_extract_all(c, F.lit(BPE_RE), F.lit(0))),
    }


def quality_features(c: Column) -> dict[str, Column]:
    """Quality-scoring features + composite score in [0, 1].

    The score formula is intentionally simple arithmetic over counts so the
    oracle reproduces it exactly: longer docs (up to 50 tokens), higher
    stopword share, and lower punctuation share score higher.
    """
    toks = tokens(c)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    n_punct = F.size(F.regexp_extract_all(c, F.lit(PUNCT_RE), F.lit(0)))
    stop_ratio = n_stop.cast("double") / n_tokens
    punct_ratio = n_punct.cast("double") / n_chars
    # single-space-separated ⇒ total token chars = n_chars - (n_tokens - 1)
    mean_tok_len = (n_chars - n_tokens + 1).cast("double") / n_tokens
    score = (
        F.least(F.lit(1.0), n_tokens.cast("double") / F.lit(50.0)) * 0.5
        + stop_ratio * 0.3
        + (F.lit(1.0) - punct_ratio) * 0.2
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "stopword_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
        "mean_token_len": mean_tok_len,
        "quality_score": score,
    }


def lang_scores(c: Column) -> dict[str, Column]:
    """Marker-word hit count per language over DISTINCT tokens."""
    distinct_toks = F.array_distinct(tokens(c))
    return {
        lang: F.size(F.array_intersect(
            distinct_toks, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS
    }


def predict_lang(c: Column, min_hits: int = 1) -> Column:
    """argmax over lang_scores with first-wins tie-break; 'und' when no
    language reaches ``min_hits`` markers."""
    scores = lang_scores(c)
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # build the when-chain in REVERSE priority so earlier langs win ties
    for lang, _ in reversed(LANG_MARKERS):
        out = F.when((scores[lang] == best) & (best >= min_hits),
                     F.lit(lang)).otherwise(out)
    return out


def fingerprint(c: Column) -> Column:
    """Rolling polynomial hash over token hashes:
    ``h = fold(tokens, 0, (acc, t) -> (acc*131 + tok32(t)) % (2^31-1))``.

    Order-sensitive (unlike a bag-of-words hash) so token reordering
    changes the fingerprint — the document-identity primitive for exact
    near-line dedup and incremental re-validation.
    """
    hashed = F.transform(tokens(c), lambda t: tok32(t))
    return F.aggregate(
        hashed,
        F.lit(0).cast("long"),
        lambda acc, h: F.pmod(acc * FINGERPRINT_MULT + h, F.lit(FINGERPRINT_MOD)),
    )


def text_profile(df: DataFrame, text_col: str, group_cols: list[str]) -> DataFrame:
    """One-pass per-group text profile (counts + quality + langid share)."""
    c = F.col(text_col)
    q = quality_features(c)
    t = token_counts(c)
    enriched = df.select(
        *group_cols,
        t["n_tokens_ws"].alias("n_tokens_ws"),
        t["n_tokens_bpe"].alias("n_tokens_bpe"),
        q["n_chars"].alias("n_chars"),
        q["quality_score"].alias("quality_score"),
        predict_lang(c).alias("predicted_lang"),
    )
    return enriched.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens_ws").alias("sum_tokens_ws"),
        F.sum("n_tokens_bpe").alias("sum_tokens_bpe"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.round(F.avg("quality_score"), 6).alias("avg_quality"),
        F.sum((F.col("predicted_lang") == "en").cast("long")).alias("n_pred_en"),
    )


def tfidf_topk(docs: DataFrame, text_col: str, id_col: str,
               k: int = 3) -> DataFrame:
    """TF-IDF keyword extraction: the top-``k`` terms of every document
    by tf · ln(N/df) — the classic curation primitive behind keyword
    tagging, topic hints, and template/boilerplate discovery (a term
    with huge tf but tiny idf across docs is boilerplate).

    Determinism contract (cross-engine, mirrors text_lm.py): tf, df and
    N are exact integers; the only float op is ln(N/df) on the identical
    double quotient, multiplied by an integer tf — both engines produce
    the same IEEE double, and ranking ties (same tf and df) break on the
    term itself, so the top-k set is engine-independent.

    Scale shape at 10^12 docs: explode → (doc, term) hash aggregate
    (map-side combine collapses repeated terms per task before the
    shuffle); the document-frequency table aggregates the same frame
    down to vocabulary size and broadcasts back; N is a 1-row broadcast
    cross join. The only corpus-sized exchanges are the (doc, term) agg
    and the per-doc rank window (both keyed on the document id), and
    Spark 4's WindowGroupLimit pushes the top-k bound below that window
    exchange, so it carries ≤ k+? rows per (task, doc), not the full
    term list. Honest caveat: without caching, Catalyst evaluates the
    df branch as its own subtree (the corpus is scanned/exploded twice);
    at 10^12 docs persist the (doc, term) aggregate first — the operator
    stays correct either way, this is a cost knob, not a semantics one.
    """
    c = F.col(text_col)
    dt = (docs
          .select(F.col(id_col).alias("doc_id"),
                  F.explode(tokens(c)).alias("term"))
          .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")))
    df_tbl = dt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(
        F.countDistinct(F.col(id_col)).alias("n_docs"))
    scored = (dt.join(F.broadcast(df_tbl), "term")
              .join(F.broadcast(n_docs))
              .withColumn(
                  "score",
                  F.col("tf") * F.log(F.col("n_docs") / F.col("df"))))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc())
    return (scored
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("doc_id", "rank", "term", "tf", "df",
                    F.round("score", 6).alias("tfidf")))



def lexical_diversity(df: DataFrame, text_col: str,
                      group_cols: list[str],
                      low_ttr: float = 0.6) -> DataFrame:
    """Lexical-diversity QA per group: type-token ratio (distinct/total
    tokens) and the Guiraud index (distinct/sqrt(total) — less
    length-sensitive, so long docs aren't penalized for Zipfian reuse).
    Repetitive/boilerplate text scores low on both; ``n_low_diversity``
    counts docs whose TTR falls below ``low_ttr`` (template spam that
    per-doc length/punct stats miss, complementing text_repetition's
    adjacent-duplication view with a bag-of-words one).

    Scale shape: both features are per-row array expressions (split +
    array_distinct, whole-stage codegen, no explode — the token array
    never leaves its row), then ONE map-combinable aggregation; shuffle
    volume is |groups| x O(1) counters.
    """
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    n_dis = F.size(F.array_distinct(toks))
    ttr = n_dis.cast("double") / n_tok
    guiraud = n_dis / F.sqrt(n_tok.cast("double"))
    return df.select(*group_cols, ttr.alias("__ttr"),
                     guiraud.alias("__gui")).groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("__ttr"), 6).alias("avg_ttr"),
        F.round(F.min("__ttr"), 6).alias("min_ttr"),
        F.round(F.avg("__gui"), 6).alias("avg_guiraud"),
        F.sum((F.col("__ttr") < low_ttr).cast("long"))
        .alias("n_low_diversity"),
    )

def encoding_features(c: Column) -> dict[str, Column]:
    """Encoding-health detectors: per-document counts of the four classic
    text-corpus encoding defects, each a JVM-side regexp count (no
    Python anywhere):

    - ``n_replacement``: U+FFFD replacement characters — a decoder
      already gave up upstream; the byte content is unrecoverable.
    - ``n_control``: C0 control characters other than tab/newline/CR —
      binary junk or terminal escapes inside "text".
    - ``n_mojibake``: UTF-8 bytes decoded as Latin-1 ('\\u00c3' followed
      by a Latin-1 continuation char — the 'Ã©'-for-'é' family), the
      most common double-encoding artifact in web crawl.
    - ``n_zero_width``: zero-width space/joiner/non-joiner and stray
      BOMs — invisible characters that split tokens silently and leak
      into generated text.

    A clean pipeline wants all four at 0; any hit routes the document to
    re-extraction rather than training. Map-only, pure codegen.
    """
    return {
        "n_replacement": F.regexp_count(c, F.lit("\uFFFD")),
        "n_control": F.regexp_count(
            c, F.lit("[\u0000-\u0008\u000B\u000C\u000E-\u001F]")),
        "n_mojibake": F.regexp_count(
            c, F.lit("\u00C3[\u0080-\u00BF]")),
        "n_zero_width": F.regexp_count(
            c, F.lit("[\u200B\u200C\u200D\uFEFF]")),
    }


def top_vocab(df: DataFrame, text_col: str, k: int) -> DataFrame:
    """The corpus's top-``k`` token vocabulary by frequency, tiebreak on
    the token itself — a TOTAL order, so the vocabulary SET is
    deterministic and engine-independent. Returns (term, term_count).

    Scale shape: explode → (term) hash aggregate shrinks the corpus to
    vocabulary size map-side; the global top-k then runs on the
    vocabulary-sized table only (TakeOrderedAndProject, never a full
    sort of corpus rows).
    """
    counts = (df.select(F.explode(tokens(F.col(text_col))).alias("term"))
              .groupBy("term").agg(F.count(F.lit(1)).alias("term_count")))
    return counts.orderBy(F.col("term_count").desc(),
                          F.col("term").asc()).limit(int(k))


def vocab_coverage(df: DataFrame, text_col: str, group_cols: list[str],
                   vocab: DataFrame) -> DataFrame:
    """Out-of-vocabulary rate per group against a reference vocabulary —
    the tokenizer-coverage QA every corpus runs before training: a
    language or source whose OOV share spikes is about to shred into
    byte fallbacks (token inflation) or <unk> mass (signal loss), which
    no length/quality stat detects.

    ``vocab`` is a (term, ...) frame, typically :func:`top_vocab` of a
    reference corpus — measuring corpus B against corpus A's vocabulary
    also quantifies domain shift at the lexical level.

    Emits per group: n_docs, n_tokens, n_oov, oov_rate, plus the
    distinct-token view (n_distinct_tokens, n_distinct_oov) — token-mass
    OOV says how much TEXT is affected, distinct OOV how much of the
    LEXICON is missing.

    Scale shape: one corpus explode into a broadcast LEFT join against
    the k-bounded vocabulary (map-only — the corpus never shuffles on
    the term), then a per-(group, term) distinct aggregate that shrinks
    to group × vocabulary size before the final group rollup.
    """
    toks = df.select(*group_cols,
                     F.explode(tokens(F.col(text_col))).alias("term"))
    marked = toks.join(
        F.broadcast(vocab.select("term", F.lit(1).alias("__in_vocab"))),
        "term", "left")
    oov = F.col("__in_vocab").isNull().cast("long")
    per_term = marked.groupBy(*group_cols, "term").agg(
        F.count(F.lit(1)).alias("__n"),
        F.max(oov).alias("__oov"))
    docs = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_docs"))
    cov = per_term.groupBy(*group_cols).agg(
        F.sum("__n").alias("n_tokens"),
        F.sum(F.col("__n") * F.col("__oov")).alias("n_oov"),
        F.count(F.lit(1)).alias("n_distinct_tokens"),
        F.sum("__oov").alias("n_distinct_oov"))
    return (docs.join(cov, list(group_cols))
            .select(*group_cols, "n_docs", "n_tokens", "n_oov",
                    F.round(F.col("n_oov").cast("double")
                            / F.col("n_tokens").cast("double"), 6)
                    .alias("oov_rate"),
                    "n_distinct_tokens", "n_distinct_oov"))


def encoding_verdict(c: Column) -> Column:
    """GREEN/YELLOW/RED verdict Column over :func:`encoding_features` —
    the rule form the streaming validator consumes (a pure stateless
    Column, so the SAME rule runs on batch frames and append-only
    streams unchanged): RED on replacement chars, control chars, or
    mojibake (the text is corrupted — re-extract), YELLOW on zero-width
    characters only (tokenization hazard, content recoverable), GREEN
    otherwise.
    """
    f = encoding_features(c)
    hard = (f["n_replacement"] + f["n_control"] + f["n_mojibake"]) > 0
    return (F.when(hard, F.lit("RED"))
            .when(f["n_zero_width"] > 0, F.lit("YELLOW"))
            .otherwise(F.lit("GREEN")))


def vocab_growth(df: DataFrame, id_col: str, text_col: str,
                 n_points: int = 10) -> DataFrame:
    """Heaps'-law vocabulary growth: distinct vocabulary size V(N) at
    ``n_points`` corpus prefixes (by ``id_col`` order) and the log-log
    OLS slope β of V ≈ K·N^β. Natural corpora grow β ≈ 0.4–0.7;
    template spam and synthetic floods saturate early (β → 0) because
    new documents stop bringing new words — a corpus-shape signal no
    per-document quality score sees.

    Exact with no distinct-over-prefix rescans: each term contributes
    its FIRST prefix bucket (min id's bucket, one map-combinable min
    per term), the per-bucket first-appearance counts cumsum into V(N)
    on an ``n_points``-row frame, and the OLS fit runs on those few
    (ln N, ln V) pairs — deterministic doubles from exact integers.
    Emits one row per prefix (bucket, n_docs, vocab) plus the fitted
    beta repeated (the driver-friendly long shape).

    Scale shape: explode collapses into a (term → min id) aggregate —
    vocabulary-sized, map-combinable; everything after runs on
    ``n_points`` rows. The id→bucket rule uses the table's max id (a
    1-row broadcast), not a sort.
    """
    mx = df.agg(F.max(F.col(id_col)).alias("__mx"))
    with_b = (df.join(F.broadcast(mx))
              .select((F.least(F.lit(n_points - 1),
                               F.floor(F.col(id_col) * n_points
                                       / (F.col("__mx") + 1))))
                      .cast("long").alias("__b"),
                      F.col(text_col).alias("__t")))
    docs_per = with_b.groupBy("__b").agg(F.count(F.lit(1)).alias("__nd"))
    first_b = (with_b.select("__b", F.explode(tokens(F.col("__t")))
                             .alias("term"))
               .groupBy("term").agg(F.min("__b").alias("__fb")))
    new_per = first_b.groupBy(F.col("__fb").alias("__b")).agg(
        F.count(F.lit(1)).alias("__nv"))
    w = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, 0)
    grid = (docs_per.join(new_per, "__b", "left")
            .select("__b", "__nd", F.coalesce("__nv", F.lit(0))
                    .alias("__nv"))
            .withColumn("n_docs", F.sum("__nd").over(w))
            .withColumn("vocab", F.sum("__nv").over(w)))
    pts = grid.select("__b", "n_docs", "vocab",
                      F.log(F.col("n_docs").cast("double")).alias("__x"),
                      F.log(F.col("vocab").cast("double")).alias("__y"))
    fit = pts.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__x").alias("__sx"), F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"))
    beta = ((F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy"))
            / (F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")))
    b = fit.select(F.round(beta, 6).alias("heaps_beta"))
    return (pts.join(F.broadcast(b))
            .select(F.col("__b").alias("bucket"), "n_docs", "vocab",
                    "heaps_beta")
            .orderBy("bucket"))
