"""Mixed-script / homoglyph detection (operators/text_filters.py:
script_mix_features): per-token both-scripts flagging, share math, and
the planted-confusable query contract."""

from pyspark.sql import functions as F

from json_spark.operators.text_filters import (
    CONFUSABLE_CYRILLIC,
    CONFUSABLE_LATIN,
    script_mix_features,
    script_mix_report,
)


def _feat_row(spark, text):
    feats = script_mix_features(F.col("text"))
    return spark.createDataFrame([(text,)], "text string").select(
        *[v.alias(k) for k, v in feats.items()]).collect()[0]


def test_pure_scripts_not_mixed(spark):
    r = _feat_row(spark, "hello world")
    assert r["cyr_chars"] == 0 and r["mixed_tokens"] == 0
    r = _feat_row(spark, "привет мир")  # pure Cyrillic: no MIXED tokens
    assert r["mixed_tokens"] == 0
    assert r["cyr_chars"] == 9 and r["latin_chars"] == 0
    assert abs(r["cyr_share"] - 9 / 10) < 1e-9


def test_homoglyph_token_flagged(spark):
    # Cyrillic е inside an otherwise-Latin token: the spoof signature
    r = _feat_row(spark, "hеllo world")
    assert r["mixed_tokens"] == 1
    assert r["cyr_chars"] == 1 and r["latin_chars"] == 9


def test_confusable_table_is_bijective():
    assert len(CONFUSABLE_LATIN) == len(CONFUSABLE_CYRILLIC)
    assert len(set(CONFUSABLE_CYRILLIC)) == len(CONFUSABLE_CYRILLIC)
    # every replacement really is Cyrillic (falls in U+0400-U+04FF)
    assert all(0x0400 <= ord(ch) <= 0x04FF for ch in CONFUSABLE_CYRILLIC)
    assert all(ord(ch) < 128 for ch in CONFUSABLE_LATIN)


def test_report_groups_and_planted_rate(spark):
    df = spark.createDataFrame(
        [("en", "the cat"), ("en", "thе cat"), ("de", "der hund")],
        "lang string, text string")
    rows = {r["lang"]: r for r in
            script_mix_report(df, "text", ["lang"]).collect()}
    assert rows["en"]["n_docs"] == 2 and rows["en"]["spoofed_docs"] == 1
    assert rows["de"]["spoofed_docs"] == 0


def test_query_flags_only_planted_docs(spark, sf_dir):
    from json_spark.plans.registry import QUERIES
    rows = QUERIES["text_script_mix"](spark, sf_dir).collect()
    total = sum(r["n_docs"] for r in rows)
    spoofed = sum(r["spoofed_docs"] for r in rows)
    # every 5th doc is planted; every planted doc contains at least one
    # confusable (corpus words all carry a/e/o), no clean doc any
    assert spoofed * 5 == total or abs(spoofed * 5 - total) < 5
    assert all(r["max_cyr_share"] < 1.0 for r in rows)
