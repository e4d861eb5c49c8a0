"""Domain/CHECK constraint operator (operators/domain.py).

Predicate semantics pinned against a row-by-row Python twin, plus the
suite integration (opt-in: no domain rows unless rules are configured).
"""

import pytest
from pyspark.sql import functions as F

from json_spark.operators.domain import (
    DomainRule, domain_rollup, domain_rules_from_toml,
    domain_rules_to_toml, domain_violations, rule_verdict)


@pytest.fixture(scope="module")
def toy(spark):
    rows = [
        # (key, part, num, txt)
        ("k1", "a", 10, "ab-001"),
        ("k2", "a", 50, "ab-002"),     # num at inclusive max
        ("k3", "a", 51, "ab-003"),     # num above max
        ("k4", "b", 5, "AB-004"),      # txt case-mismatch for pattern
        ("k5", "b", None, "ab-005"),   # null num
        ("k6", "b", 7, None),          # null txt
        ("k7", "b", 5, "xab-007x"),    # pattern must FULL-match
    ]
    return spark.createDataFrame(
        rows, "key string, part string, num int, txt string")


def _verdicts(df, rule):
    out = df.select("key", rule_verdict(rule).alias("v")).collect()
    return {r["key"]: r["v"] for r in out}


def test_range_inclusive_and_null_passes(toy):
    got = _verdicts(toy, DomainRule("num", min_value=5, max_value=50))
    assert got == {"k1": "GREEN", "k2": "GREEN", "k3": "RED",
                   "k4": "GREEN", "k5": "GREEN",  # NULL passes (SQL CHECK)
                   "k6": "GREEN", "k7": "GREEN"}


def test_required_flags_null_only(toy):
    got = _verdicts(toy, DomainRule("num", required=True))
    assert got["k5"] == "RED"
    assert all(v == "GREEN" for k, v in got.items() if k != "k5")


def test_pattern_full_match_not_substring(toy):
    got = _verdicts(toy, DomainRule("txt", pattern="ab-[0-9]{3}"))
    # substring hit is NOT enough; case-sensitive; null passes
    assert got == {"k1": "GREEN", "k2": "GREEN", "k3": "GREEN",
                   "k4": "RED", "k5": "GREEN", "k6": "GREEN", "k7": "RED"}


def test_in_set_and_yellow_severity(toy):
    got = _verdicts(toy, DomainRule("num", in_set=(5, 10, 50),
                                    severity="YELLOW"))
    assert got == {"k1": "GREEN", "k2": "GREEN", "k3": "YELLOW",
                   "k4": "GREEN", "k5": "GREEN", "k6": "YELLOW",
                   "k7": "GREEN"}


def test_combined_predicates_and(toy):
    # in_set AND range: value must satisfy BOTH
    got = _verdicts(toy, DomainRule("num", in_set=(5, 51), max_value=50))
    assert got["k4"] == "GREEN" and got["k7"] == "GREEN"  # 5: both hold
    assert got["k3"] == "RED"   # 51 in set but over max
    assert got["k1"] == "RED"   # 10 under max but not in set


def test_rollup_counts_match_python_twin(toy):
    rules = (
        DomainRule("num", min_value=5, max_value=50, name="range:num"),
        DomainRule("txt", pattern="ab-[0-9]{3}", severity="YELLOW",
                   name="format:txt"),
    )
    got = {(r["part"], r["check_name"]): r
           for r in domain_rollup(toy, rules, ["part"]).collect()}
    assert len(got) == 4  # 2 parts x 2 rules
    r = got[("a", "range:num")]
    assert (r["n_rows"], r["n_green"], r["n_yellow"], r["n_red"],
            r["verdict"]) == (3, 2, 0, 1, "RED")
    r = got[("b", "range:num")]
    assert (r["n_green"], r["n_red"], r["verdict"]) == (4, 0, "GREEN")
    r = got[("b", "format:txt")]
    # k4 + k7 violate at YELLOW, nulls pass
    assert (r["n_green"], r["n_yellow"], r["n_red"], r["verdict"]) == (
        2, 2, 0, "YELLOW")


def test_violations_shape_and_truncation(spark, toy):
    long_txt = "x" * 80
    df = toy.unionByName(spark.createDataFrame(
        [("k8", "a", 1, long_txt)], toy.schema))
    rules = (DomainRule("txt", pattern="ab-[0-9]{3}", name="format:txt"),)
    viols = {r["clip_id"]: r
             for r in domain_violations(df, rules, "key", "part").collect()}
    assert set(viols) == {"k4", "k7", "k8"}
    assert viols["k8"]["offending_value_trunc50"] == "x" * 50
    assert viols["k4"]["check_name"] == "format:txt"
    assert viols["k4"]["partition_id"] == "b"
    assert "format" in viols["k4"]["reason"]


def test_suite_domain_integration(spark):
    from json_spark.fixtures.gen import generate_clips
    from json_spark.plans.suite import SuiteConfig, ValidationSuite

    rules = (
        DomainRule("dur_ms", required=True, name="required:dur_ms"),
        DomainRule("sr_hz", in_set=(8000, 16000, 22050, 44100, 48000),
                   name="set:sr_hz"),
    )
    clips = generate_clips(spark, 400, partitions=4)
    # default config: NO domain rows
    res0 = ValidationSuite(SuiteConfig()).run(spark, clips)
    names0 = {r["check_name"]
              for r in res0.partition_verdicts.select("check_name")
              .distinct().collect()}
    assert not any(n.startswith(("required:", "set:")) for n in names0)
    res0.unpersist()

    res = ValidationSuite(SuiteConfig(domain_rules=rules)).run(spark, clips)
    rows = {(r["partition_id"], r["check_name"]): r
            for r in res.partition_verdicts.collect()
            if r["check_name"] in ("required:dur_ms", "set:sr_hz")}
    # one row per (codec partition, rule)
    parts = {p for p, _ in rows}
    assert all((p, "required:dur_ms") in rows and (p, "set:sr_hz") in rows
               for p in parts)
    # generator plants NULL dur_ms at i%101==100 -> 3 nulls in 400 rows
    total_red = sum(r["n_red"] for (p, c), r in rows.items()
                    if c == "required:dur_ms")
    assert total_red == 3
    assert all(r["verdict"] == "GREEN" for (p, c), r in rows.items()
               if c == "set:sr_hz")
    # violations carry the planted null rows
    dviols = res.violations.filter(
        F.col("check_name") == "required:dur_ms").collect()
    assert len(dviols) == 3
    assert all(v["offending_value_trunc50"] == "<null>" for v in dviols)
    res.unpersist()


def test_when_sql_implication(toy):
    # constraint applies only where the gate holds; NULL gate exempts
    rule = DomainRule("num", max_value=9,
                      when_sql="txt like 'ab-%'")
    got = _verdicts(toy, rule)
    # k1 num=10 txt=ab-001: gated in, violates; k4 AB-004: gated out
    assert got["k1"] == "RED"
    assert got["k4"] == "GREEN"   # gate false -> exempt despite num ok anyway
    assert got["k6"] == "GREEN"   # NULL gate -> exempt
    assert got["k3"] == "RED"     # 51 > 9, gated in
    assert got["k2"] == "RED"     # 50 > 9, gated in
    assert got["k5"] == "GREEN"   # null value passes (not required)
    assert "when(" in rule.reason()


def test_suite_domain_ledger_resume(spark, tmp_path):
    """Domain rule names flow into the checkpoint ledger as per-rule
    check rows, and a fully-ledgered re-run resumes to empty."""
    from json_spark.fixtures.gen import generate_clips
    from json_spark.plans.ledger import ledger_read
    from json_spark.plans.suite import SuiteConfig, ValidationSuite

    rules = (DomainRule("dur_ms", required=True, name="required:dur_ms"),)
    cfg = SuiteConfig(domain_rules=rules)
    clips = generate_clips(spark, 200, partitions=2)
    led = str(tmp_path / "ledger")

    res = ValidationSuite(cfg).run(spark, clips, ledger_path=led,
                                   input_path="mem://clips")
    assert res.partition_verdicts.filter(
        F.col("check_name") == "required:dur_ms").count() > 0
    res.unpersist()
    lrows = ledger_read(spark, led).filter(
        F.col("check_name") == "required:dur_ms")
    assert lrows.count() > 0
    # every ledgered domain row carries the verdict metric
    assert all("verdict" in r["metrics_json"] for r in lrows.collect())

    res2 = ValidationSuite(cfg).run(spark, clips, ledger_path=led,
                                    input_path="mem://clips")
    assert res2.partition_verdicts.count() == 0
    res2.unpersist()


def test_domain_rules_from_toml():
    from json_spark.operators.domain import domain_rules_from_toml
    rules = domain_rules_from_toml(
        '[[rule]]\ncolumn = "sr_hz"\nin_set = [8000, 16000]\n'
        'severity = "YELLOW"\n\n'
        '[[rule]]\ncolumn = "dur_ms"\nmax = 190\n'
        'when = "codec = \'opus\'"\nname = "cond:x"\n')
    assert len(rules) == 2
    assert rules[0].in_set == (8000, 16000)
    assert rules[0].severity == "YELLOW"
    assert rules[1].max_value == 190
    assert rules[1].when_sql == "codec = 'opus'"
    assert rules[1].check_name == "cond:x"
    # unknown keys and bad severity rejected early
    with pytest.raises(ValueError, match="unknown keys"):
        domain_rules_from_toml('[[rule]]\ncolumn = "x"\nminn = 1\n')
    with pytest.raises(ValueError, match="column"):
        domain_rules_from_toml('[[rule]]\nmin = 1\n')
    with pytest.raises(ValueError, match="severity"):
        domain_rules_from_toml(
            '[[rule]]\ncolumn = "x"\nseverity = "ORANGE"\n')
    with pytest.raises(ValueError, match="top-level"):
        domain_rules_from_toml('[other]\nx = 1\n')


def test_toml_roundtrip_edge_cases():
    """to_toml ∘ from_toml is the identity over escaping-hostile rules."""
    from json_spark.operators.domain import (
        DomainRule,
        domain_rules_from_toml,
        domain_rules_to_toml,
    )
    rules = (
        DomainRule(column="p", pattern=r'(?s)"\d{1,3}\\x"', name="esc"),
        DomainRule(column="c", in_set=("a'b", 'say "hi"', "back\\slash")),
        DomainRule(column="v", min_value=-1.5, max_value=2.0,
                   severity="YELLOW", when_sql="codec = 'pcm_s16le'"),
        DomainRule(column="r", required=True),
        DomainRule(column="n", in_set=(1, 2, 3)),
    )
    assert domain_rules_from_toml(domain_rules_to_toml(rules)) == rules
    assert domain_rules_to_toml(()) == ""


def test_not_in_banned_values(spark):
    """not_in: the banned-values (sentinel lexicon) rule — in-band
    placeholder values flag while everything else passes; NULL passes
    unless required (SQL CHECK semantics)."""
    df = spark.createDataFrame(
        [("ok",), ("N/A",), ("null",), (None,), ("fine",)], "txt string")
    rule = DomainRule("txt", not_in=("N/A", "null", "--"),
                      severity="YELLOW", name="sentinel:txt")
    got = [r[0] for r in df.select(rule_verdict(rule)).collect()]
    assert got == ["GREEN", "YELLOW", "YELLOW", "GREEN", "GREEN"]
    assert "not_in(3)" in rule.reason()


def test_not_in_toml_roundtrip():
    toml_text = (
        '[[rule]]\ncolumn = "uid"\nnot_in = [-1, 0, 99999999]\n'
        'severity = "YELLOW"\nname = "sentinel:uid"\n')
    rules = domain_rules_from_toml(toml_text)
    assert rules[0].not_in == (-1, 0, 99999999)
    assert domain_rules_from_toml(domain_rules_to_toml(rules)) == rules
