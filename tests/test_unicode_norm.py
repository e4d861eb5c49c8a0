"""NFC normalization-form QA (operators/unicode_norm.py): detection of
decomposed text, null handling, and the planted-divergence query."""

import unicodedata

from json_spark.operators.unicode_norm import nfc_divergence


def test_composed_vs_decomposed(spark):
    composed = "café résumé"            # NFC already
    decomposed = unicodedata.normalize("NFD", composed)  # e + U+0301
    assert composed != decomposed and len(decomposed) == len(composed) + 3
    df = spark.createDataFrame(
        [("a", composed), ("b", decomposed), ("c", "plain ascii"),
         ("d", None)],
        "grp string, text string")
    rows = {r["grp"]: r for r in
            nfc_divergence(df, "text", ["grp"]).collect()}
    assert rows["a"]["n_denorm_docs"] == 0
    assert rows["b"]["n_denorm_docs"] == 1
    assert rows["b"]["chars_shrunk"] == 3
    assert rows["b"]["max_doc_shrink"] == 3
    assert rows["c"]["chars_shrunk"] == 0
    assert rows["d"]["n_docs"] == 1 and rows["d"]["chars_shrunk"] == 0


def test_query_plants_every_seventh(spark, sf_dir):
    from json_spark.plans.registry import QUERIES
    rows = QUERIES["text_unicode_norm"](spark, sf_dir).collect()
    total = sum(r["n_docs"] for r in rows)
    denorm = sum(r["n_denorm_docs"] for r in rows)
    # every 7th doc is decomposed; every corpus doc contains an 'e'
    assert abs(denorm * 7 - total) < 7
    assert all(r["chars_shrunk"] >= r["n_denorm_docs"] for r in rows)
