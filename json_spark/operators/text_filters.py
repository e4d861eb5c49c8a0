"""Second-generation text filters for training-data curation: PII
surface scanning and repetition/boilerplate detection (the
MassiveText/Gopher-style repetition heuristics, re-expressed as pure
Column arithmetic).

Everything is whole-stage-codegen Column expressions over the token
array — no explode, no shuffle, no Python: the repetition features that
nominally need a per-token group-by (top-token share) are computed
per-row with array higher-order functions instead, O(distinct × length)
per document, which beats a corpus-wide (doc, token) shuffle for any
realistic document length. The DuckDB oracles re-implement the same
features with list comprehensions, so every ratio is cross-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

#: deliberately simple, RE2-and-Java-compatible surface patterns — a PII
#: *scan* flags candidates for review; it does not claim extraction-grade
#: precision
PII_PATTERNS = {
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "phone": r"[0-9]{3}-[0-9]{4}",
    "ipv4": r"([0-9]{1,3}\.){3}[0-9]{1,3}",
}


def pii_counts(c: Column) -> dict[str, Column]:
    """Per-document candidate-PII hit counts, one column per pattern."""
    return {
        name: F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
        for name, pat in PII_PATTERNS.items()
    }


def pii_scan(df: DataFrame, text_col: str,
             group_cols: list[str]) -> DataFrame:
    """Per-group PII exposure report: document counts, documents with any
    hit, and per-pattern totals. Map-only until the tiny group aggregate.
    """
    counts = pii_counts(F.col(text_col))
    hit_any = sum(
        (cnt > 0).cast("long") for cnt in counts.values()) > 0
    enriched = df.select(
        *group_cols, hit_any.cast("long").alias("__any"),
        *[cnt.alias(f"__{name}") for name, cnt in counts.items()])
    return enriched.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__any").alias("docs_with_pii"),
        *[F.sum(f"__{name}").alias(f"{name}_hits")
          for name in PII_PATTERNS])


def bigrams(toks: Column) -> Column:
    """Adjacent-token bigram array (length n-1), built with zip_with over
    two slices — no explode."""
    n = F.size(toks)
    return F.zip_with(
        F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b))


def repetition_features(c: Column) -> dict[str, Column]:
    """Per-document repetition metrics:

    - distinct_ratio      : |distinct tokens| / |tokens| — low means the
                            doc keeps re-using the same words;
    - top_token_share     : occurrences of the most frequent token /
                            |tokens| — computed per-row via a counted
                            filter over the distinct set (no shuffle);
    - dup_bigram_fraction : 1 - |distinct bigrams| / |bigrams| — the
                            classic boilerplate signal (repeated phrases,
                            not just repeated words).
    """
    toks = tokens(c)
    n = F.size(toks)
    distinct = F.array_distinct(toks)
    occ = F.transform(
        distinct, lambda t: F.size(F.filter(toks, lambda x: x == t)))
    bg = bigrams(toks)
    # single-token docs have no bigrams: define their dup fraction as 0
    # explicitly (the driver session runs ANSI mode, where a bare /0 throws)
    dup_bg = F.when(
        F.size(bg) > 0,
        F.lit(1.0) - F.size(F.array_distinct(bg)) / F.size(bg),
    ).otherwise(F.lit(0.0))
    return {
        "n_tokens": n,
        "distinct_ratio": F.size(distinct) / n,
        "top_token_share": F.array_max(occ) / n,
        "dup_bigram_fraction": dup_bg,
    }


#: Latin -> Cyrillic homoglyph pairs (visually near-identical glyphs);
#: the classic spoof/canary corruption a crawl picks up from SEO spam
CONFUSABLE_LATIN = "aeopcyx"
CONFUSABLE_CYRILLIC = "аеорсух"

CYRILLIC_RE = "[Ѐ-ӿ]"
LATIN_RE = "[A-Za-z]"


def script_mix_features(c: Column) -> dict[str, Column]:
    """Per-document Unicode script profile:

    - cyr_chars     : count of Cyrillic codepoints
    - latin_chars   : count of ASCII letters
    - mixed_tokens  : tokens containing BOTH scripts — the homoglyph
                      spoof signal (a token like "hеllo" renders
                      identically to "hello" but tokenizes, hashes and
                      dedups differently, silently fragmenting vocab
                      and defeating exact dedup)
    - cyr_share     : Cyrillic fraction of all characters

    Pure Column regex arithmetic — counts via length-difference after
    regexp_replace, token scan via a filter() higher-order function;
    no explode, no Python, no shuffle.
    """
    n = F.length(c)
    cyr = n - F.length(F.regexp_replace(c, CYRILLIC_RE, ""))
    latin = n - F.length(F.regexp_replace(c, LATIN_RE, ""))
    mixed = F.size(F.filter(
        tokens(c),
        lambda w: w.rlike(CYRILLIC_RE) & w.rlike(LATIN_RE)))
    return {
        "cyr_chars": cyr,
        "latin_chars": latin,
        "mixed_tokens": mixed,
        "cyr_share": F.when(n > 0, cyr / n).otherwise(F.lit(0.0)),
    }


def script_mix_report(df: DataFrame, text_col: str,
                      group_cols: list[str]) -> DataFrame:
    """Per-group mixed-script exposure: document counts, documents with
    at least one mixed-script token (spoofed), total mixed tokens and
    Cyrillic characters, and the worst per-document Cyrillic share.
    Map-only until the tiny group aggregate — same scale shape as
    ``pii_scan``."""
    feats = script_mix_features(F.col(text_col))
    enriched = df.select(
        *group_cols,
        (feats["mixed_tokens"] > 0).cast("long").alias("__spoofed"),
        feats["mixed_tokens"].cast("long").alias("__mixed"),
        feats["cyr_chars"].cast("long").alias("__cyr"),
        feats["cyr_share"].alias("__share"))
    return enriched.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__spoofed").alias("spoofed_docs"),
        F.sum("__mixed").alias("mixed_tokens"),
        F.sum("__cyr").alias("cyr_chars"),
        F.round(F.max("__share"), 6).alias("max_cyr_share"))


def repetition_report(df: DataFrame, id_col: str, text_col: str,
                      max_top_share: float = 0.2,
                      min_distinct_ratio: float = 0.3) -> DataFrame:
    """Per-document repetition row + the boilerplate verdict a filter
    stage would gate on. Pure map — composes with stratified_sample /
    curate_corpus without adding a shuffle."""
    feats = repetition_features(F.col(text_col))
    flagged = ((feats["top_token_share"] > max_top_share)
               | (feats["distinct_ratio"] < min_distinct_ratio))
    return df.select(
        F.col(id_col),
        feats["n_tokens"].cast("long").alias("n_tokens"),
        F.round(feats["distinct_ratio"], 6).alias("distinct_ratio"),
        F.round(feats["top_token_share"], 6).alias("top_token_share"),
        F.round(feats["dup_bigram_fraction"], 6)
        .alias("dup_bigram_fraction"),
        flagged.alias("flagged"))
