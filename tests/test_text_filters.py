"""Text filters v2 (operators/text_filters.py) and bigram-LM surprisal
(operators/text_lm.py) vs python brute-force twins."""

import math
from collections import Counter

from pyspark.sql import functions as F

from json_spark.operators.text_filters import (
    pii_scan,
    repetition_report,
)
from json_spark.operators.text_lm import bigram_counts, surprisal_scores


def test_pii_scan_counts_and_doc_flags(spark):
    docs = [
        ("a", "mail me at bob@example.com or sue@test.io"),   # 2 emails
        ("a", "call 555-0142 and 555-9999"),                  # 2 phones
        ("b", "server 10.0.0.1 and printer 192.168.1.254"),   # 2 ips
        ("b", "nothing sensitive here at all"),
    ]
    df = spark.createDataFrame(docs, "src string, text string")
    got = {r["src"]: r.asDict()
           for r in pii_scan(df, "text", ["src"]).collect()}
    assert got["a"] == {"src": "a", "n_docs": 2, "docs_with_pii": 2,
                        "email_hits": 2, "phone_hits": 2, "ipv4_hits": 0}
    assert got["b"] == {"src": "b", "n_docs": 2, "docs_with_pii": 1,
                        "email_hits": 0, "phone_hits": 0, "ipv4_hits": 2}


def _brute_repetition(text):
    t = text.split(" ")
    n = len(t)
    cnt = Counter(t)
    bg = [f"{a} {b}" for a, b in zip(t, t[1:])]
    return {
        "n_tokens": n,
        "distinct_ratio": round(len(cnt) / n, 6),
        "top_token_share": round(max(cnt.values()) / n, 6),
        "dup_bigram_fraction":
            round(1.0 - len(set(bg)) / len(bg), 6) if bg else 0.0,
    }


def test_repetition_report_vs_bruteforce(spark):
    docs = [
        (1, "spam spam spam spam spam ham"),               # boilerplate
        (2, "each word here appears just once only"),      # clean
        (3, "ab cd ab cd ab cd ab cd"),                    # phrase loop
        (4, "solo"),                                       # 1 token edge
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in repetition_report(df, "doc_id", "text").collect()}
    for doc_id, text in docs:
        want = _brute_repetition(text)
        for k, v in want.items():
            assert got[doc_id][k] == v, (doc_id, k)
    assert got[1]["flagged"] and got[3]["flagged"]
    assert not got[2]["flagged"]


def test_surprisal_vs_bruteforce(spark):
    docs = [("s1", "a b a b a c"), ("s1", "b a b a"), ("s2", "a c a c a b")]
    df = spark.createDataFrame(docs, "src string, text string")

    pairs = [(src, (t[i], t[i + 1]))
             for src, txt in docs
             for t in [txt.split(" ")] for i in range(len(t) - 1)]
    c2 = Counter(p for _, p in pairs)
    c1 = Counter(p[0] for _, p in pairs)
    by_src = {}
    for src, p in pairs:
        by_src.setdefault(src, []).append(-math.log2(c2[p] / c1[p[0]]))

    got = {r["src"]: r.asDict()
           for r in surprisal_scores(df, "text", ["src"]).collect()}
    for src, scores in by_src.items():
        assert got[src]["n_bigrams"] == len(scores)
        assert got[src]["avg_surprisal"] == round(
            sum(scores) / len(scores), 6)


def test_bigram_counts_context_totals(spark):
    df = spark.createDataFrame([("x", "a b a b c")], "src string, text string")
    rows = {(r["w1"], r["w2"]): (r["n2"], r["n1"])
            for r in bigram_counts(df, "text").collect()}
    # bigrams: a-b, b-a, a-b, b-c -> n2: ab=2, ba=1, bc=1; n1: a=2, b=2
    assert rows[("a", "b")] == (2, 2)
    assert rows[("b", "a")] == (1, 2)
    assert rows[("b", "c")] == (1, 2)


def test_tfidf_topk_vs_bruteforce(spark):
    """tfidf_topk equals a python brute-force twin on a corpus designed
    to exercise ranking, the corpus-wide term ('the', idf=0 so score 0
    regardless of tf) and the (tf, df) tie broken on the term itself."""
    from json_spark.operators.text import tfidf_topk
    texts = {
        1: "the cat sat on the mat",
        2: "the dog ate the dog food",
        3: "the bird bird bird flew away",
        4: "zebra apple zebra apple the",  # tf/df tie: apple before zebra
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string")
    got = {(r.doc_id, r.rank): (r.term, r.tf, r.df, r.tfidf)
           for r in tfidf_topk(df, "text", "doc_id", k=2).collect()}

    # brute-force twin
    toks = {i: t.split(" ") for i, t in texts.items()}
    n_docs = len(texts)
    dfreq = Counter()
    for ts in toks.values():
        for term in set(ts):
            dfreq[term] += 1
    for i, ts in toks.items():
        tf = Counter(ts)
        scored = sorted(
            ((term, n, dfreq[term], n * math.log(n_docs / dfreq[term]))
             for term, n in tf.items()),
            key=lambda x: (-x[3], x[0]))
        for rank, (term, n, d, s) in enumerate(scored[:2], start=1):
            assert got[(i, rank)] == (term, n, d, round(s, 6)), \
                f"doc {i} rank {rank}: {got[(i, rank)]} != {(term, n, d, s)}"
    # 'the' appears in every doc => idf 0 => never a top keyword despite
    # being the highest-tf term in docs 1 and 2
    assert all(v[0] != "the" for v in got.values())


REPL = chr(0xFFFD)          # replacement char
BEL, ESC = chr(0x07), chr(0x1B)
MOJI = chr(0xC3) + chr(0xA9)     # 'A-tilde' + continuation = mojibake pair
ZWSP, ZWNJ, BOM = chr(0x200B), chr(0x200C), chr(0xFEFF)


class TestEncodingFeatures:
    def _feat(self, spark, texts):
        import pyspark.sql.functions as F
        from json_spark.operators.text import encoding_features
        df = spark.createDataFrame([(t,) for t in texts], "t string")
        f = encoding_features(F.col("t"))
        return df.select(*[v.alias(k) for k, v in f.items()]).collect()

    def test_clean_text_all_zero(self, spark):
        rows = self._feat(spark, ["hello world", "tabs\tand\nnewlines ok",
                                  "punct!? ok"])
        for r in rows:
            assert (r["n_replacement"], r["n_control"],
                    r["n_mojibake"], r["n_zero_width"]) == (0, 0, 0, 0)

    def test_each_detector_counts_occurrences(self, spark):
        rows = self._feat(spark, [
            f"bad {REPL} and {REPL} again",      # 2 replacement chars
            f"bell {BEL} and {ESC} esc",         # 2 control chars
            f"caf{MOJI} twice {MOJI}",           # 2 mojibake pairs
            f"zero{ZWSP}width{ZWNJ} and{BOM}",   # 3 zero-width chars
        ])
        assert rows[0]["n_replacement"] == 2
        assert rows[1]["n_control"] == 2
        assert rows[2]["n_mojibake"] == 2
        assert rows[3]["n_zero_width"] == 3
        # detectors are independent: nothing else fires on each row
        assert rows[0]["n_control"] == rows[0]["n_mojibake"] == 0
        assert rows[2]["n_replacement"] == rows[2]["n_zero_width"] == 0

    def test_legit_accents_not_mojibake(self, spark):
        # real accented text (e-acute alone, no continuation pair after
        # an A-tilde) must not flag
        e_acute = chr(0xE9)
        rows = self._feat(spark, [f"caf{e_acute} ok"])
        assert rows[0]["n_mojibake"] == 0

    def test_plan_is_pure_codegen(self, spark):
        import pyspark.sql.functions as F
        from json_spark.operators.text import encoding_features
        df = spark.createDataFrame([("x",)], "t string")
        f = encoding_features(F.col("t"))
        plan = (df.select(*[v.alias(k) for k, v in f.items()])
                ._jdf.queryExecution().executedPlan().toString())
        assert "Python" not in plan
        assert "Exchange" not in plan


class TestLexicalDiversity:
    def test_exact_values_and_low_flag(self, spark):
        from json_spark.operators.text import lexical_diversity
        rows = [
            ("a", "one two three four"),          # ttr 1.0
            ("a", "spam spam spam spam"),         # ttr 0.25 -> low
            ("b", "x y x y"),                     # ttr 0.5  -> low
        ]
        df = spark.createDataFrame(rows, "source string, text string")
        out = {r["source"]: r
               for r in lexical_diversity(df, "text", ["source"]).collect()}
        assert out["a"]["n_docs"] == 2
        assert out["a"]["avg_ttr"] == 0.625       # (1.0 + 0.25) / 2
        assert out["a"]["min_ttr"] == 0.25
        assert out["a"]["n_low_diversity"] == 1
        # guiraud: (4/sqrt(4) + 1/sqrt(4)) / 2 = (2 + 0.5) / 2
        assert out["a"]["avg_guiraud"] == 1.25
        assert out["b"]["n_low_diversity"] == 1
        assert out["b"]["avg_guiraud"] == 1.0     # 2/sqrt(4)

    def test_no_explode_no_python(self, spark):
        from json_spark.operators.text import lexical_diversity
        df = spark.createDataFrame([("a", "x y")], "source string, text string")
        plan = (lexical_diversity(df, "text", ["source"])
                ._jdf.queryExecution().executedPlan().toString())
        assert "Python" not in plan
        assert "Generate" not in plan             # token array never explodes
