"""Cross-snapshot / cross-provider consistency operators
(json_spark/operators/consistency.py): closed-form goldens on small
constructed frames plus plan-shape assertions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from json_spark.operators.consistency import (
    approx_fd,
    conflict_summary,
    label_conflicts,
    snapshot_diff,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


class TestSnapshotDiff:
    def test_statuses(self, spark):
        old = _df(spark, [(1, "a"), (2, "b"), (3, "c")], "k int, v string")
        new = _df(spark, [(2, "b"), (3, "CHANGED"), (4, "d")],
                  "k int, v string")
        got = {r["status"]: r["n_keys"]
               for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
        assert got == {"added": 1, "removed": 1, "changed": 1,
                       "unchanged": 1}

    def test_null_vs_absent_distinct(self, spark):
        # a null value and a missing column part must not collide
        old = _df(spark, [(1, None, "x")], "k int, a string, b string")
        new = _df(spark, [(1, "x", None)], "k int, a string, b string")
        got = snapshot_diff(old, new, ["k"], ["a", "b"]).collect()
        assert {r["status"] for r in got} == {"changed"}

    def test_composite_key(self, spark):
        old = _df(spark, [(1, 1, "a"), (1, 2, "b")],
                  "k1 int, k2 int, v string")
        new = _df(spark, [(1, 1, "a"), (2, 1, "b")],
                  "k1 int, k2 int, v string")
        got = {r["status"]: r["n_keys"]
               for r in snapshot_diff(old, new, ["k1", "k2"],
                                      ["v"]).collect()}
        assert got == {"unchanged": 1, "removed": 1, "added": 1}

    def test_payload_never_shuffles(self, spark):
        # the join inputs must project to (key, fingerprint) before the
        # exchange: the wide payload column may not appear in the plan's
        # exchange input
        old = _df(spark, [(1, "a", "payload")],
                  "k int, v string, big string")
        new = _df(spark, [(1, "a", "payload")],
                  "k int, v string, big string")
        plan = snapshot_diff(old, new, ["k"], ["v"])._jdf.queryExecution() \
            .optimizedPlan().toString()
        # 'big' may appear in the unprunable createDataFrame leaf, but the
        # join must consume (key, fingerprint) projections without it
        join_side_lines = [ln for ln in plan.splitlines()
                           if "Project" in ln or "Join" in ln]
        assert join_side_lines and all("big" not in ln
                                       for ln in join_side_lines)


class TestLabelConflicts:
    def test_detects_conflicts_only(self, spark):
        df = _df(spark, [
            ("k1", "t1", "c1"), ("k1", "t1", None),      # agree
            ("k2", "t2", "c2"), ("k2", "OTHER", None),   # conflict
            ("k3", "t3", "c1"),
        ], "key string, label string, codec string")
        got = label_conflicts(df, "key", "label",
                              attr_cols=["codec"]).collect()
        assert len(got) == 1
        r = got[0]
        assert (r["key"], r["n_rows"], r["n_labels"]) == ("k2", 2, 2)
        assert (r["label_lo"], r["label_hi"]) == ("OTHER", "t2")
        assert r["codec"] == "c2"  # null provider doesn't erase attribution

    def test_null_label_conflicts_with_value(self, spark):
        # countDistinct ignores nulls: (null, 'x') is 1 distinct — a null
        # label is "no label", not a contradicting one (referential checks
        # catch missing labels; this operator catches contradictions)
        df = _df(spark, [("k1", None), ("k1", "x")], "key string, label string")
        assert label_conflicts(df, "key", "label").count() == 0

    def test_summary(self, spark):
        df = _df(spark, [
            ("k1", "a", "c1"), ("k1", "b", "c1"),
            ("k2", "a", "c1"), ("k2", "b", None),
            ("k3", "a", "c2"), ("k3", "b", "c2"), ("k3", "c", "c2"),
        ], "key string, label string, codec string")
        conf = label_conflicts(df, "key", "label", attr_cols=["codec"])
        got = {r["codec"]: (r["n_conflict_keys"], r["n_conflict_rows"])
               for r in conflict_summary(conf, ["codec"]).collect()}
        assert got == {"c1": (2, 4), "c2": (1, 3)}


class TestApproxFd:
    def test_exact_fd(self, spark):
        df = _df(spark, [(1, "a"), (2, "b"), (3, "a")], "l int, r string")
        row = approx_fd(df, [("l", "r")]).collect()[0]
        assert row["g3_confidence"] == 1.0
        assert row["n_violating_groups"] == 0
        assert row["n_violating_rows"] == 0

    def test_g3_counts_minority_rows(self, spark):
        # group 1: aab -> keep 2 drop 1; group 2: cc -> keep 2
        df = _df(spark, [(1, "a"), (1, "a"), (1, "b"), (2, "c"), (2, "c")],
                 "l int, r string")
        row = approx_fd(df, [("l", "r")]).collect()[0]
        assert row["n_rows"] == 5
        assert row["n_groups"] == 2
        assert row["n_violating_groups"] == 1
        assert row["n_violating_rows"] == 1
        assert row["g3_confidence"] == pytest.approx(4 / 5)

    def test_null_rhs_is_a_value(self, spark):
        # null rhs conflicting with a non-null rhs violates the FD
        df = _df(spark, [(1, "a"), (1, None)], "l int, r string")
        row = approx_fd(df, [("l", "r")]).collect()[0]
        assert row["n_violating_groups"] == 1
        assert row["g3_confidence"] == pytest.approx(0.5)

    def test_multiple_candidates_one_frame(self, spark):
        df = _df(spark, [(1, 1, "x"), (2, 1, "y")], "a int, b int, c string")
        got = {(r["lhs"], r["rhs"]): r["g3_confidence"]
               for r in approx_fd(df, [("a", "c"), ("b", "c")]).collect()}
        assert got == {("a", "c"): 1.0, ("b", "c"): 0.5}

    def test_no_window_no_cross_join(self, spark):
        df = _df(spark, [(1, "a")], "l int, r string")
        plan = approx_fd(df, [("l", "r")])._jdf.queryExecution() \
            .optimizedPlan().toString()
        assert "Window" not in plan
        assert "Cross" not in plan


class TestDupContentIntegrity:
    def _run(self, spark, rows):
        from json_spark.operators.consistency import dup_content_integrity
        df = _df(spark, rows, "k string, h string, lbl string, m int")
        return {r["k"]: r for r in dup_content_integrity(
            df, ["k"], "h", label_cols=["lbl"], meta_cols=["m"]).collect()}

    def test_verdict_precedence_all_branches(self, spark):
        got = self._run(spark, [
            # unique key: never emitted
            ("solo", "h0", "a", 1),
            # identical copies
            ("ident", "h1", "a", 1), ("ident", "h1", "a", 1),
            # metadata only diverges (null vs value — sentinel counts)
            ("meta", "h2", "a", 1), ("meta", "h2", "a", None),
            # label diverges, content identical
            ("label", "h3", "a", 1), ("label", "h3", "b", 1),
            # content diverges — wins over a simultaneous label conflict
            ("content", "h4", "a", 1), ("content", "h5", "b", 2),
        ])
        assert "solo" not in got
        assert got["ident"]["verdict"] == "IDENTICAL"
        assert got["meta"]["verdict"] == "META_DIVERGENT"
        assert got["label"]["verdict"] == "LABEL_DIVERGENT"
        assert got["content"]["verdict"] == "CONTENT_DIVERGENT"
        assert got["content"]["n_copies"] == 2
        assert got["content"]["n_content"] == 2
        assert got["content"]["n_label"] == 2
        assert got["content"]["n_meta"] == 2

    def test_null_content_is_a_divergence(self, spark):
        # one copy lost its payload digest: that IS content divergence
        got = self._run(spark, [("k", "h1", "a", 1), ("k", None, "a", 1)])
        assert got["k"]["verdict"] == "CONTENT_DIVERGENT"

    def test_triplicate_group(self, spark):
        got = self._run(spark, [
            ("k", "h1", "a", 1), ("k", "h1", "a", 1), ("k", "h2", "a", 1)])
        assert got["k"]["n_copies"] == 3
        assert got["k"]["n_content"] == 2
        assert got["k"]["verdict"] == "CONTENT_DIVERGENT"

    def test_no_label_meta_cols_defaults_green(self, spark):
        from json_spark.operators.consistency import dup_content_integrity
        df = _df(spark, [("k", "h1", "a", 1), ("k", "h1", "b", 2)],
                 "k string, h string, lbl string, m int")
        row = dup_content_integrity(df, ["k"], "h").collect()[0]
        # without label/meta columns declared, divergence there is unseen
        assert row["verdict"] == "IDENTICAL"

    def test_plan_no_window_no_cross(self, spark):
        from json_spark.operators.consistency import dup_content_integrity
        df = _df(spark, [("k", "h", "a", 1)],
                 "k string, h string, lbl string, m int")
        plan = dup_content_integrity(
            df, ["k"], "h", label_cols=["lbl"], meta_cols=["m"]
        )._jdf.queryExecution().optimizedPlan().toString()
        assert "Window" not in plan
        assert "Cross" not in plan


def test_dup_content_integrity_random_vs_pandas_twin(spark):
    """Randomized property: 400 rows over 60 keys with random digests /
    labels / metas (nulls included) — per-key distinct counts and the
    precedence verdict must equal an independent pure-Python fold."""
    import numpy as np
    from json_spark.operators.consistency import dup_content_integrity

    rng = np.random.default_rng(20260819)
    rows = []
    for _ in range(400):
        k = f"k{rng.integers(0, 60)}"
        h = None if rng.random() < 0.05 else f"h{rng.integers(0, 3)}"
        lbl = None if rng.random() < 0.05 else f"l{rng.integers(0, 3)}"
        m = None if rng.random() < 0.2 else int(rng.integers(0, 2))
        rows.append((k, h, lbl, m))
    df = spark.createDataFrame(rows, "k string, h string, lbl string, m int")
    got = {r["k"]: r for r in dup_content_integrity(
        df, ["k"], "h", label_cols=["lbl"], meta_cols=["m"]).collect()}

    sent = lambda v: "<null>" if v is None else str(v)
    from collections import defaultdict
    groups = defaultdict(list)
    for k, h, lbl, m in rows:
        groups[k].append((sent(h), sent(lbl), sent(m)))
    n_checked = 0
    for k, g in groups.items():
        if len(g) <= 1:
            assert k not in got
            continue
        n_checked += 1
        nc = len({h for h, _, _ in g})
        nl = len({l for _, l, _ in g})
        nm = len({m for _, _, m in g})
        exp = ("CONTENT_DIVERGENT" if nc > 1 else
               "LABEL_DIVERGENT" if nl > 1 else
               "META_DIVERGENT" if nm > 1 else "IDENTICAL")
        r = got[k]
        assert (r["n_copies"], r["n_content"], r["n_label"], r["n_meta"],
                r["verdict"]) == (len(g), nc, nl, nm, exp), k
    assert n_checked >= 40      # the generator actually made dup groups


class TestDupLabelDistance:
    def _mk(self, spark, rows):
        return spark.createDataFrame(rows, "k string, t string")

    def test_distance_and_filtering(self, spark):
        from json_spark.operators.consistency import dup_label_distance
        rows = [
            ("a", "hello world"), ("a", "hello world"),   # identical: out
            ("b", "kitten"), ("b", "sitting"),            # classic lev=3
            ("c", "abc"), ("c", "abcde"),                 # suffix add: 2
            ("d", "only one copy"),                       # not duplicated
            ("e", "x"), ("e", None),                      # null excluded
        ]
        got = {r["k"]: r for r in dup_label_distance(
            self._mk(spark, rows), ["k"], "t").collect()}
        assert set(got) == {"b", "c"}
        assert (got["b"]["edit_distance"], got["b"]["n_labels"]) == (3, 2)
        assert got["c"]["edit_distance"] == 2
        assert got["c"]["rel_distance"] == round(2 / 5, 6)

    def test_three_labels_takes_extreme_pair(self, spark):
        from json_spark.operators.consistency import dup_label_distance
        rows = [("k", "aaa"), ("k", "mmm"), ("k", "zzz")]
        r = dup_label_distance(self._mk(spark, rows), ["k"], "t").collect()[0]
        assert r["n_labels"] == 3
        assert r["edit_distance"] == 3       # lev(aaa, zzz)

    def test_plan_no_window_no_cross(self, spark):
        from json_spark.operators.consistency import dup_label_distance
        plan = dup_label_distance(
            self._mk(spark, [("k", "a"), ("k", "b")]), ["k"], "t"
        )._jdf.queryExecution().optimizedPlan().toString()
        assert "Window" not in plan
        assert "Cross" not in plan

    def test_random_vs_python_dp(self, spark):
        """Randomized twin: distances equal a textbook Levenshtein DP on
        the lexicographic extreme pair of each conflicting key."""
        import numpy as np
        from json_spark.operators.consistency import dup_label_distance

        def lev(a, b):
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(min(prev[j] + 1, cur[-1] + 1,
                                   prev[j - 1] + (ca != cb)))
                prev = cur
            return prev[-1]

        rng = np.random.default_rng(20260819)
        alpha = "abcx"
        rows = []
        for _ in range(300):
            k = f"k{rng.integers(0, 40)}"
            t = "".join(alpha[i] for i in rng.integers(0, 4, size=rng.integers(1, 9)))
            rows.append((k, t))
        got = {r["k"]: r for r in dup_label_distance(
            self._mk(spark, rows), ["k"], "t").collect()}
        from collections import defaultdict
        groups = defaultdict(set)
        for k, t in rows:
            groups[k].add(t)
        for k, labels in groups.items():
            if len(labels) <= 1:
                assert k not in got
                continue
            assert got[k]["edit_distance"] == lev(min(labels), max(labels)), k


def test_agg_reconciliation_classes(spark):
    from json_spark.operators.consistency import agg_reconciliation
    parent = spark.createDataFrame(
        [(1, 100.0),      # matches exactly
         (2, 100.0),      # within 5% (child 103)
         (3, 100.0),      # mismatched (child 150)
         (4, 50.0),       # childless
         (5, 0.0),        # zero parent, zero child -> matched
         (6, 0.0)],       # zero parent, nonzero child -> mismatched
        "k long, total double")
    child = spark.createDataFrame(
        [(1, 60.0), (1, 40.0),
         (2, 103.0),
         (3, 150.0),
         (5, 0.0),
         (6, 7.0)],
        "k long, v double")
    out = agg_reconciliation(parent, child, "k", "total", "v",
                             rel_tolerance=0.05).collect()[0]
    assert out["n_parents"] == 6
    assert out["n_matched"] == 3          # keys 1, 2, 5
    assert out["n_mismatched"] == 2       # keys 3, 6
    assert out["n_childless"] == 1        # key 4
    assert out["max_rel_delta"] == 0.5    # key 3: |100-150|/100
    assert out["verdict"] == "RED"


def test_agg_reconciliation_green_when_exact(spark):
    from json_spark.operators.consistency import agg_reconciliation
    parent = spark.createDataFrame([(1, 10.0), (2, 5.5)],
                                   "k long, total double")
    child = spark.createDataFrame([(1, 4.0), (1, 6.0), (2, 5.5)],
                                  "k long, v double")
    out = agg_reconciliation(parent, child, "k", "total", "v").collect()[0]
    assert (out["n_matched"], out["verdict"]) == (2, "GREEN")
    assert out["max_rel_delta"] == 0.0


def test_agg_reconciliation_decimal_sums_order_invariant(spark):
    """Many small decimal children sum exactly — no float drift can
    push a boundary key across the tolerance."""
    from json_spark.operators.consistency import agg_reconciliation
    child = spark.createDataFrame([(1, 0.01)] * 1000, "k long, v double")
    parent = spark.createDataFrame([(1, 10.0)], "k long, total double")
    out = agg_reconciliation(parent.repartition(4), child.repartition(7),
                             "k", "total", "v").collect()[0]
    assert out["n_matched"] == 1 and out["max_rel_delta"] == 0.0


def test_orphan_value_mass(spark):
    from json_spark.operators.referential import orphan_value_mass
    parent = spark.createDataFrame([(1,), (2,)], "k long")
    child = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0), (9, 100.0), (8, 1.0)],
        "k long, v double")
    out = orphan_value_mass(child, parent, "k", "k", "v").collect()[0]
    assert out["n_rows"] == 5 and out["n_orphan_rows"] == 2
    assert float(out["orphan_value"]) == 101.0
    assert out["orphan_row_share"] == 0.4
    assert out["orphan_value_share"] == round(101.0 / 136.0, 6)


def test_orphan_value_mass_no_orphans(spark):
    from json_spark.operators.referential import orphan_value_mass
    parent = spark.createDataFrame([(1,)], "k long")
    child = spark.createDataFrame([(1, 3.0)], "k long, v double")
    out = orphan_value_mass(child, parent, "k", "k", "v").collect()[0]
    assert out["n_orphan_rows"] == 0
    assert float(out["orphan_value"]) == 0.0
    assert out["orphan_value_share"] == 0.0
