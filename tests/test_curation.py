"""Curation operators (operators/curation.py) vs brute-force twins:
hashlib-recomputed sample membership, Counter-based heavy hitters,
numpy median/MAD outliers (exact AND the approx production path), and
funnel invariants for the end-to-end curation pipeline."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from json_spark.operators.curation import (
    curate_corpus,
    heavy_hitters,
    robust_outliers,
    stratified_sample,
    token_heavy_hitters,
)


def _md5_bucket(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % mod


def test_stratified_sample_matches_hashlib(spark):
    rows = [(i, ["en", "zh", "de"][i % 3]) for i in range(600)]
    df = spark.createDataFrame(rows, "id long, lang string")
    rates = {"en": 200, "zh": 800}
    got = {r["id"] for r in
           stratified_sample(df, "id", "lang", rates,
                             default_per_mille=500).collect()}
    want = {i for i, lang in rows
            if _md5_bucket(f"sample:{i}", 1000) < rates.get(lang, 500)}
    assert got == want
    # head language really is downsampled relative to the tail
    n_en = sum(1 for i, g in rows if g == "en" and i in got)
    n_zh = sum(1 for i, g in rows if g == "zh" and i in got)
    assert n_en < n_zh
    # membership is per-id, so partitioning cannot change the result
    again = {r["id"] for r in
             stratified_sample(df.repartition(13), "id", "lang", rates,
                               default_per_mille=500).collect()}
    assert again == got


def test_heavy_hitters_vs_counter(spark):
    from collections import Counter
    items = [(g, f"w{(i * i) % 17}") for g in ("a", "b")
             for i in range(g == "b", 300)]
    df = spark.createDataFrame(items, "g string, item string")
    got = {(r["g"], r["rk"]): (r["item"], r["n"])
           for r in heavy_hitters(df, ["g"], "item", k=3).collect()}
    for g in ("a", "b"):
        cnt = Counter(it for gg, it in items if gg == g)
        # rank by (count desc, item asc) — the operator's tie-break
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for rk, (item, n) in enumerate(ranked, start=1):
            assert got[(g, rk)] == (item, n)
    assert all(isinstance(rk, int) for _, rk in got)  # rk is long, top-3 only
    assert len(got) == 6


def test_token_heavy_hitters_counts_duplicated_tokens(spark):
    df = spark.createDataFrame(
        [("en", "the cat the dog the"), ("en", "a cat")],
        "lang string, text string")
    got = {r["rk"]: (r["tok"], r["n"]) for r in
           token_heavy_hitters(df, "text", ["lang"], k=2).collect()}
    assert got[1] == ("the", 3)
    assert got[2] == ("cat", 2)


@pytest.mark.parametrize("approx", [False, True])
def test_robust_outliers_vs_numpy(spark, approx):
    rng = np.random.default_rng(7)
    base = rng.normal(50, 5, 400)
    spikes = np.array([500.0, -400.0, 800.0])  # blatant outliers
    vals = np.concatenate([base, spikes])
    df = spark.createDataFrame(
        [("g", float(v)) for v in vals], "grp string, value double")
    row = robust_outliers(df, "value", ["grp"], z=3.0,
                          approx=approx).collect()[0]
    med = np.median(vals)
    mad = np.median(np.abs(vals - med))
    n_out = int(np.sum(np.abs(vals - med) > 3 * 1.4826 * mad))
    assert row["n"] == len(vals)
    if approx:
        # production sketch path: small drift allowed, spikes still caught
        assert abs(row["median_value"] - med) < 0.5
        assert abs(row["mad"] - mad) < 0.5
        assert abs(row["n_outliers"] - n_out) <= 2
        assert row["n_outliers"] >= len(spikes)
    else:
        assert row["median_value"] == round(med, 6)
        assert row["mad"] == round(mad, 6)
        assert row["n_outliers"] == n_out


def test_robust_outliers_immune_to_contamination(spark):
    # mean/stddev would be dragged by the spike; median/MAD must not be
    vals = [10.0] * 99 + [10_000.0]
    df = spark.createDataFrame([("g", v) for v in vals],
                               "grp string, value double")
    row = robust_outliers(df, "value", ["grp"], z=3.0).collect()[0]
    assert row["median_value"] == 10.0
    assert row["n_outliers"] == 1


def test_curate_corpus_funnel_invariants(spark):
    docs = [
        # passes both gates; has one exact duplicate (id 100)
        (1, "the cat and the dog sat of the mat and it is a fine day in town"),
        (100, "the cat and the dog sat of the mat and it is a fine day in town"),
        # language gate drops it: no marker words at all
        (2, "zzz qqq www rrr ttt"),
        # quality gate drops it: marker present but heavy punctuation
        (3, "the !!! ??? ;;; ::: %%% &&& ((( ))) @@@"),
        # passes, unique
        (4, "a man of the town and a dog in the house is it not fine and good"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = curate_corpus(df, min_quality=0.4)
    rows = out.collect()
    assert sum(r["n_docs"] for r in rows) == 2        # 1 and 4 survive
    assert sum(r["n_dups_removed"] for r in rows) == 1  # the planted copy
    tok = lambda s: len(s.split(" "))  # noqa: E731
    assert sum(r["sum_tokens"] for r in rows) == tok(docs[0][1]) + tok(docs[4][1])
    assert set(out.columns) == {"split", "n_docs", "sum_tokens",
                                "n_dups_removed"}


def test_temperature_sample_rebalances(spark):
    """alpha=0.5 temperature sampling: head strata keep a SMALLER fraction
    than tail strata, overall kept mass ~= keep_frac, and membership is
    deterministic (same rows on re-run)."""
    from json_spark.operators.curation import temperature_sample

    rows = [(i, "head" if i % 10 < 7 else ("mid" if i % 10 < 9 else "tail"))
            for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept, rates = temperature_sample(df, "doc_id", "lang",
                                     alpha=0.5, keep_frac=0.5)
    r = {x["lang"]: x for x in rates.collect()}
    assert r["head"]["n_before"] == 3500
    # derived keep-rate ordering: tail keeps the largest fraction
    frac = {k: v["thresh"] / (1 << 20) for k, v in r.items()}
    assert frac["tail"] > frac["mid"] > frac["head"]
    k = kept.count()
    assert abs(k - 2500) < 250          # ~keep_frac of the corpus
    ids1 = sorted(x["doc_id"] for x in kept.collect())
    kept2, _ = temperature_sample(df, "doc_id", "lang",
                                  alpha=0.5, keep_frac=0.5)
    assert ids1 == sorted(x["doc_id"] for x in kept2.collect())
    # sanity: expected-count arithmetic — per-stratum kept ~= thresh/2^20 * n
    for lang, v in r.items():
        exp = frac[lang] * v["n_before"]
        got = kept.filter(F.col("lang") == lang).count()
        assert abs(got - exp) < 4 * (exp ** 0.5 + 1)


def test_weighted_sample_matches_hashlib_replay(spark):
    from json_spark.operators.curation import weighted_sample
    rows = [(i, (i % 7) * 10) for i in range(800)]    # integer weights, some 0
    df = spark.createDataFrame(rows, "id long, w int")
    kept = {r["id"] for r in
            weighted_sample(df, "id", "w", keep_frac=0.3).collect()}
    n = len(rows)
    sw = sum(w for _, w in rows)
    want = set()
    for i, w in rows:
        p = min(1.0, ((0.3 * float(w)) * float(n)) / float(sw))
        thresh = math.floor(p * float(1 << 20))
        if _md5_bucket(f"wsample:{i}", 1 << 20) < thresh:
            want.add(i)
    assert kept == want
    # zero-weight rows are never kept
    assert all(rows[i][1] > 0 for i in kept)
    # heavier strata keep a larger fraction
    def frac(wv):
        ids = [i for i, w in rows if w == wv]
        return sum(1 for i in ids if i in kept) / len(ids)
    assert frac(60) > frac(10)
    # repartitioning cannot change membership
    again = {r["id"] for r in
             weighted_sample(df.repartition(11), "id", "w",
                             keep_frac=0.3).collect()}
    assert again == kept


def test_weighted_sample_saturates_at_p1(spark):
    from json_spark.operators.curation import weighted_sample
    # one giant weight saturates at p=1 -> always kept
    rows = [(0, 10_000)] + [(i, 1) for i in range(1, 100)]
    df = spark.createDataFrame(rows, "id long, w int")
    kept = {r["id"] for r in
            weighted_sample(df, "id", "w", keep_frac=0.5).collect()}
    assert 0 in kept


def test_group_cap_vs_python_twin(spark):
    from json_spark.operators.curation import group_cap
    rows = [(i, f"s{i % 3}", (i * 37) % 50) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n long")
    kept = group_cap(df, ["source"],
                     [F.col("n").desc(), F.col("doc_id").asc()], 5)
    got = {(r["source"], r["doc_id"]) for r in kept.collect()}
    exp = set()
    for s in ("s0", "s1", "s2"):
        grp = sorted((r for r in rows if r[1] == s),
                     key=lambda r: (-r[2], r[0]))[:5]
        exp |= {(s, r[0]) for r in grp}
    assert got == exp
    # groups smaller than k survive whole
    small = spark.createDataFrame([(1, "x", 9)], "doc_id long, source string, n long")
    assert group_cap(small, ["source"],
                     [F.col("n").desc(), F.col("doc_id")], 5).count() == 1


def test_group_cap_plan_uses_window_group_limit(spark):
    from json_spark.operators.curation import group_cap
    df = spark.createDataFrame([(1, "s", 2)], "doc_id long, source string, n long")
    kept = group_cap(df, ["source"],
                     [F.col("n").desc(), F.col("doc_id").asc()], 5)
    plan = kept._jdf.queryExecution().optimizedPlan().toString()
    # the rank<=k filter must push below the exchange as WindowGroupLimit
    assert "WindowGroupLimit" in plan


def test_weighted_sample_invariants_random(spark):
    """Randomized invariants: kept ⊆ input; zero-weight rows never kept;
    rows whose inclusion probability hits the p=1 ceiling are ALWAYS
    kept; kept mass is weight-tilted (mean kept weight ≥ mean overall)."""
    import numpy as np
    from json_spark.operators.curation import weighted_sample

    rng = np.random.default_rng(7)
    rows = [(f"d{i}", int(w)) for i, w in
            enumerate(rng.integers(0, 200, size=800))]
    rows += [(f"z{i}", 0) for i in range(20)]            # zero weight
    rows += [(f"big{i}", 100000) for i in range(5)]      # p capped at 1
    df = spark.createDataFrame(rows, "id string, w long")
    kept = {r["id"] for r in
            weighted_sample(df, "id", "w", keep_frac=0.25).collect()}
    all_ids = {i for i, _ in rows}
    assert kept <= all_ids
    assert not {i for i, w in rows if w == 0} & kept
    assert {f"big{i}" for i in range(5)} <= kept
    w_by_id = dict(rows)
    mean_kept = sum(w_by_id[i] for i in kept) / len(kept)
    mean_all = sum(w for _, w in rows) / len(rows)
    assert mean_kept > mean_all
    # determinism: a second run returns the identical set
    kept2 = {r["id"] for r in
             weighted_sample(df, "id", "w", keep_frac=0.25).collect()}
    assert kept2 == kept


class TestCorpusMix:
    def _docs(self, spark, n=600):
        rows = [(f"d{i}", ["a", "b", "c"][i % 3]) for i in range(n)]
        return spark.createDataFrame(rows, "id string, s string")

    def test_rates_whole_frac_zero(self, spark):
        from json_spark.operators.curation import corpus_mix
        df = self._docs(spark)
        out = corpus_mix(df, "id", "s",
                         {"a": 2.0, "b": 0.5, "c": 0.0}).collect()
        by_s = {}
        for r in out:
            by_s.setdefault(r["s"], []).append(r)
        # stratum a: every row exactly twice, epochs 0 and 1
        a_rows = by_s["a"]
        assert len(a_rows) == 2 * 200
        from collections import Counter
        eps = Counter((r["id"], r["epoch"]) for r in a_rows)
        assert set(eps.values()) == {1}
        assert {e for _, e in eps} == {0, 1}
        # stratum b: a deterministic ~half subset, each exactly once
        b_rows = by_s["b"]
        assert 0.3 * 200 < len(b_rows) < 0.7 * 200
        assert all(r["epoch"] == 0 for r in b_rows)
        # stratum c: dropped entirely
        assert "c" not in by_s

    def test_fractional_upsample_mass(self, spark):
        from json_spark.operators.curation import corpus_mix
        df = self._docs(spark, 900)
        out = corpus_mix(df, "id", "s", {}, default_rate=1.25)
        n = out.count()
        # every row at least once; about a quarter twice
        assert 900 * 1.15 < n < 900 * 1.35
        # determinism
        assert out.count() == n

    def test_no_shuffle_plan(self, spark):
        from json_spark.operators.curation import corpus_mix
        df = self._docs(spark)
        plan = (corpus_mix(df, "id", "s", {"a": 2.25})
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan
        assert "Generate" in plan      # the bounded explode fan-out


def test_corpus_mix_rejects_negative_rate(spark):
    import pytest as _pytest
    from json_spark.operators.curation import corpus_mix
    df = spark.createDataFrame([("d", "s")], "id string, s string")
    with _pytest.raises(ValueError, match="must be >= 0"):
        corpus_mix(df, "id", "s", {"s": -1.0})
    with _pytest.raises(ValueError, match="must be >= 0"):
        corpus_mix(df, "id", "s", {}, default_rate=-0.5)


def test_split_divergence_hash_split_green_biased_split_flags(spark):
    """A hash-bucketed split draws both halves from the same
    distribution (PSI ~ 0); a topic-biased split shows up immediately."""
    from json_spark.operators.drift import psi
    from json_spark.operators.text import tokens, top_vocab
    rows = []
    for i in range(400):
        topic = "alpha beta gamma" if i % 2 == 0 else "delta epsilon zeta"
        rows.append((i, topic))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def run(split_col):
        lab = df.select(split_col.alias("split"), "text").filter(
            F.col("split").isin("train", "val"))
        vocab = top_vocab(lab, "text", 10).select("term")
        tok = lab.select(
            "split", F.explode(tokens(F.col("text"))).alias("term"))
        mapped = (tok.join(F.broadcast(
            vocab.withColumn("__hit", F.lit(1))), "term", "left")
            .select("split", F.when(F.col("__hit").isNull(), "__OOV")
                    .otherwise(F.col("term")).alias("category")))
        counts = mapped.groupBy("split", "category").agg(
            F.count(F.lit(1)).alias("n"))
        from pyspark.sql import Window
        h = counts.withColumn(
            "share",
            F.col("n") / F.sum("n").over(Window.partitionBy("split")))
        return psi(h.filter(F.col("split") == "val")
                   .select("category", "share"),
                   h.filter(F.col("split") == "train")
                   .select("category", "share"),
                   on=["category"]).collect()[0]["psi"]

    from json_spark.operators.packing import assign_split
    fair = run(assign_split(F.col("doc_id"), train_per_mille=500,
                            val_per_mille=1000))
    assert fair < 0.05     # same distribution both halves (sampling noise)
    biased = run(F.when(F.col("doc_id") % 2 == 0, "train").otherwise("val"))
    assert biased > 1.0                     # disjoint topic vocabularies


def test_vocab_growth_natural_vs_template(spark):
    """A corpus with ever-new words grows (beta near 1); a template
    corpus repeating the same words saturates (beta near 0)."""
    from json_spark.operators.text import vocab_growth
    natural = spark.createDataFrame(
        [(i, f"w{i}a w{i}b common") for i in range(400)],
        "doc_id long, text string")
    rows_n = vocab_growth(natural, "doc_id", "text").collect()
    beta_n = rows_n[0]["heaps_beta"]
    template = spark.createDataFrame(
        [(i, "buy now limited offer") for i in range(400)],
        "doc_id long, text string")
    beta_t = vocab_growth(template, "doc_id", "text") \
        .collect()[0]["heaps_beta"]
    assert beta_n > 0.9          # ~2 new words per doc
    assert beta_t < 0.05         # vocabulary fixed after bucket 0
    # V(N) is cumulative and exact
    assert [r["bucket"] for r in rows_n] == list(range(10))
    assert rows_n[-1]["vocab"] == 801       # 2*400 + 'common'
    assert rows_n[-1]["n_docs"] == 400
