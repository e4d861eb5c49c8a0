"""FD profiling (operators/profiling.py) vs brute-force group maps."""

from pyspark.sql import functions as F  # noqa: F401

from json_spark.operators.profiling import fd_profile


def test_fd_profile_vs_bruteforce(spark):
    rows = [(1, "a", 10), (1, "a", 10), (2, "b", 20), (2, "c", 20),
            (3, "d", 20), (4, "d", 40)]
    df = spark.createDataFrame(rows, "k int, v string, w int")
    got = {(r["lhs"], r["rhs"]): r.asDict() for r in
           fd_profile(df, [("k", "v"), ("k", "w"), ("v", "w")]).collect()}

    def brute(lhs_i, rhs_i):
        groups = {}
        for row in rows:
            groups.setdefault(row[lhs_i], set()).add(row[rhs_i])
        widths = [len(s) for s in groups.values()]
        return {"n_groups": len(groups),
                "n_violating": sum(1 for wd in widths if wd > 1),
                "max_distinct": max(widths),
                "holds": max(widths) <= 1}

    for (lhs, rhs), (li, ri) in {("k", "v"): (0, 1), ("k", "w"): (0, 2),
                                 ("v", "w"): (1, 2)}.items():
        want = brute(li, ri)
        for key, val in want.items():
            assert got[(lhs, rhs)][key] == val, (lhs, rhs, key)
    # k -> v violates only at k=2; k -> w holds; v -> w violates at v=d
    assert got[("k", "v")]["n_violating"] == 1
    assert got[("k", "w")]["holds"]
    assert not got[("v", "w")]["holds"]
