"""Golden end-to-end decode test mirroring the reference's sample1.

The reference decodes tests/testdata/1.clean.json (all-green) and
1.dirty-yellow.json (stringified numbers/bools recovered to the same
clean struct) — tests/sample1_test.go:12-91. Here the same document
lives in an embedded-JSON string column: from_json with a stringly
nested schema, then the §2.2 coercion predicates per declared field.
The invariant is the reference's: dirty decode == clean decode, with
GREEN verdicts on the clean doc and YELLOW on every recovered field.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from json_spark.config import default_config
from json_spark.functions.embedded import EmbeddedField, decode_embedded

CFG = default_config()

#: tests/testdata/1.clean.json (values re-typed as the engine's golden)
CLEAN_DOC = {
    "id": 1,
    "name": "Item 1",
    "is_active": True,
    "details": {
        "description": "Description for item 1",
        "score": 9.5,
        "was_verified": False,
        "info": {
            "category": "Category A",
            "rating": 4,
            "features": ["fast", "reliable"],
            "options": [{"key": "priority", "value": "high"}],
        },
    },
    "tags": ["alpha", "beta"],
}

#: tests/testdata/1.dirty-yellow.json — same doc, number/bool fields
#: stringified (recoverable under the default rule set)
DIRTY_DOC = {
    "id": 1,
    "name": "Item 1",
    "is_active": "true",
    "details": {
        "description": "Description for item 1",
        "score": "9.5",
        "was_verified": "false",
        "info": {
            "category": "Category A",
            "rating": "4",
            "features": ["fast", "reliable"],
            "options": [{"key": "priority", "value": "high"}],
        },
    },
    "tags": ["alpha", "beta"],
}

#: TYPED schema — the clean-pass decode target; the dirty pass derives
#: its stringly twin automatically (functions/embedded.stringly)
TYPED_SCHEMA = (
    "id bigint, name string, is_active boolean, "
    "details struct<description string, score double, was_verified boolean, "
    "info struct<category string, rating bigint, features array<string>, "
    "options array<struct<key string, value string>>>>, "
    "tags array<string>"
)

FIELDS = [
    EmbeddedField("id", "integer"),
    EmbeddedField("is_active", "bool"),
    EmbeddedField("details.score", "number"),
    EmbeddedField("details.was_verified", "bool"),
    EmbeddedField("details.info.rating", "integer"),
]


@pytest.fixture(scope="module")
def decoded(spark):
    df = spark.createDataFrame(
        [("clean", json.dumps(CLEAN_DOC)), ("dirty", json.dumps(DIRTY_DOC))],
        "variant string, raw string",
    )
    results = decode_embedded(F.col("raw"), TYPED_SCHEMA, FIELDS, CFG)
    alias = {"id": "id", "is_active": "is_active", "details_score": "score",
             "details_was_verified": "was_verified",
             "details_info_rating": "rating"}
    typed = F.from_json("raw", TYPED_SCHEMA).alias("d")
    rows = df.select(
        "variant",
        typed.getField("name").alias("name"),
        typed.getField("details").getField("description").alias("description"),
        typed.getField("details").getField("info").getField("category").alias("category"),
        typed.getField("details").getField("info").getField("features").alias("features"),
        typed.getField("tags").alias("tags"),
        *[c for name, res in results.items()
          for c in res.with_prefix(alias[name])],
    ).collect()
    return {r["variant"]: r for r in rows}


def test_clean_doc_is_all_green(decoded):
    c = decoded["clean"]
    for f in ("id", "is_active", "score", "was_verified", "rating"):
        assert c[f + "__verdict"] == "GREEN", f


def test_dirty_doc_recovers_to_clean_values(decoded):
    c, d = decoded["clean"], decoded["dirty"]
    # every coerced dirty value equals the clean decode (sample1_test.go:72-90)
    for f in ("id", "is_active", "score", "was_verified", "rating"):
        assert d[f + "__coerced"] == c[f + "__coerced"], f
    # untouched fields pass through identically
    for f in ("name", "description", "category", "features", "tags"):
        assert d[f] == c[f], f


def test_dirty_doc_fields_are_yellow(decoded):
    d = decoded["dirty"]
    # id stays a clean JSON number in 1.dirty-yellow.json → GREEN
    assert d["id__verdict"] == "GREEN"
    for f in ("is_active", "score", "was_verified", "rating"):
        assert d[f + "__verdict"] == "YELLOW", f


def test_expected_golden_values(decoded):
    c = decoded["clean"]
    assert c["id__coerced"] == 1
    assert c["is_active__coerced"] is True
    assert c["score__coerced"] == 9.5
    assert c["was_verified__coerced"] is False
    assert c["rating__coerced"] == 4
    assert c["tags"] == ["alpha", "beta"]


# ---------------------------------------------------------------------------
# chameleon-keys golden — the e2e the reference itself skips
# (tests/sample1_test.go:93-145, t.Skip) — working here
# ---------------------------------------------------------------------------

#: tests/testdata/1.dirty-yellow.keys.json — same doc, keys re-cased
#: across camel/kebab/upper conventions, values stringified
KEYS_DOC = {
    "id": 1,
    "name": "Item 1",
    "isActive": "true",
    "details": {
        "description": "Description for item 1",
        "score": "9.5",
        "was-verified": "false",
        "INFO": {
            "CATegory": "Category A",
            "rating": "4",
            "features": ["fast", "reliable"],
            "options": [
                {"KEY": "priority", "VALUE": "high"},
                {"key": "limit", "value": 10},
            ],
        },
    },
    "tags": ["alpha", "beta"],
}

#: typed schema keyed by CHAMELEON-normalized names (the driver-side twin
#: normalize_name applied to the clean model's fields)
NORM_SCHEMA = (
    "id bigint, name string, isactive boolean, "
    "details struct<description string, score double, wasverified boolean, "
    "info struct<category string, rating bigint, features array<string>, "
    "options array<struct<key string, value string>>>>, "
    "tags array<string>"
)


def test_chameleon_keys_golden(spark):
    from json_spark.functions.keys import normalize_embedded_keys

    df = spark.createDataFrame([(json.dumps(KEYS_DOC),)], "raw string")
    norm = normalize_embedded_keys(F.col("raw"), depth=4)
    fields = [
        EmbeddedField("id", "integer"),
        EmbeddedField("isactive", "bool"),
        EmbeddedField("details.score", "number"),
        EmbeddedField("details.wasverified", "bool"),
        EmbeddedField("details.info.rating", "integer"),
    ]
    res = decode_embedded(norm, NORM_SCHEMA, fields, CFG)
    typed = F.from_json(norm, NORM_SCHEMA).alias("d")
    row = df.select(
        typed.getField("name").alias("name"),
        typed.getField("details").getField("info").getField("category")
        .alias("category"),
        typed.getField("details").getField("info").getField("features")
        .alias("features"),
        typed.getField("details").getField("info").getField("options")
        .alias("options"),
        *[c for f in fields for c in res[f.name].with_prefix(f.name)],
    ).collect()[0]

    # every scalar recovered to the clean golden (sample1 keys case)
    assert row["id__coerced"] == 1
    assert row["isactive__coerced"] is True
    assert row["details_score__coerced"] == 9.5
    assert row["details_wasverified__coerced"] is False
    assert row["details_info_rating__coerced"] == 4
    # key-flexed docs decode through the dirty pass → YELLOW, never RED
    for f in ("id", "isactive", "details_score", "details_wasverified",
              "details_info_rating"):
        assert row[f + "__verdict"] == "YELLOW", f
    # strings/arrays pass through; nested-array object keys normalized too
    assert row["name"] == "Item 1"
    assert row["category"] == "Category A"
    assert row["features"] == ["fast", "reliable"]
    assert [(o["key"], o["value"]) for o in row["options"]] == [
        ("priority", "high"), ("limit", "10")]


def test_normalize_keys_container_lookalike_scalars(spark):
    """A validator must never silently drop a field: string values that
    merely LOOK like JSON containers ('{'/'['-prefixed but unparseable)
    must survive as quoted scalars, and unparseable documents must pass
    through unchanged (never null)."""
    from json_spark.functions.keys import normalize_embedded_keys

    docs = [
        ('{"Note":"{unbalanced","OK":1}',),
        ('{"Note":"[not json","OK":1}',),
        ('{"Outer-Key":{"Inner_Key":"{oops","N":[1,"[x",{"Deep_K":2}]}}',),
        ("not json at all",),
    ]
    df = spark.createDataFrame(docs, "raw string")
    rows = df.select(
        "raw", normalize_embedded_keys(F.col("raw"), depth=4).alias("norm")
    ).collect()
    by_raw = {r["raw"]: r["norm"] for r in rows}

    assert json.loads(by_raw['{"Note":"{unbalanced","OK":1}']) == {
        "note": "{unbalanced", "ok": "1"}
    assert json.loads(by_raw['{"Note":"[not json","OK":1}']) == {
        "note": "[not json", "ok": "1"}
    assert json.loads(
        by_raw['{"Outer-Key":{"Inner_Key":"{oops","N":[1,"[x",{"Deep_K":2}]}}']
    ) == {"outerkey": {"innerkey": "{oops", "n": ["1", "[x", {"deepk": "2"}]}}
    # top-level unparseable: raw text passes through, never null
    assert by_raw["not json at all"] == "not json at all"


def test_split_words_goldens(spark):
    """Goldens ported from the reference's SplitWordsSuite
    (cases/cases_test.go:139-196) plus splitCamelCase edge cases."""
    from json_spark.functions.keys import split_words

    cases = {
        "": [],
        "helloWorld": ["hello", "World"],
        "HelloWorld": ["Hello", "World"],
        "hello_world_test": ["hello", "world", "test"],
        "hello-world-test": ["hello", "world", "test"],
        "hello_World-TestExample": ["hello", "World", "Test", "Example"],
        "hello__world--Test": ["hello", "world", "Test"],
        # splitCamelCase: boundary also after a digit (cases.go:368)
        "user Name2": ["user", "Name2"],
        "ABC1Def": ["ABC1", "Def"],
        # no valuable symbols -> empty
        "___": [],
        "- _": [],
    }
    df = spark.createDataFrame([(k,) for k in cases], "s string")
    got = {r["s"]: r["w"]
           for r in df.select("s", split_words(F.col("s")).alias("w")).collect()}
    for s, expect in cases.items():
        assert got[s] == expect, f"split_words({s!r})"


def test_transform_to_goldens(spark):
    """cases.TransformTo semantics (cases/cases.go:279-303) across all six
    determined conventions."""
    from json_spark.functions.keys import transform_to

    targets = ("snake", "camel", "pascal", "kebab", "header", "title_snake")
    expect = {
        "user_name": ("user_name", "userName", "UserName",
                      "user-name", "User-Name", "User_Name"),
        "userName": ("user_name", "userName", "UserName",
                     "user-name", "User-Name", "User_Name"),
        "X-Header-Name": ("x_header_name", "xHeaderName", "XHeaderName",
                          "x-header-name", "X-Header-Name", "X_Header_Name"),
        "user Name2": ("user_name2", "userName2", "UserName2",
                       "user-name2", "User-Name2", "User_Name2"),
        # no separators, no camel boundary -> single word
        "XML$Parser": ("xml$parser", "xml$parser", "Xml$parser",
                       "xml$parser", "Xml$parser", "Xml$parser"),
        "": ("", "", "", "", "", ""),
    }
    df = spark.createDataFrame([(k,) for k in expect], "s string")
    rows = df.select(
        "s", *[transform_to(F.col("s"), t).alias(t) for t in targets]
    ).collect()
    for r in rows:
        for t, want in zip(targets, expect[r["s"]]):
            assert r[t] == want, f"transform_to({r['s']!r}, {t})"

    import pytest as _pytest
    with _pytest.raises(ValueError):
        transform_to(F.col("s"), "hybrid")


def test_unknown_key_count(spark):
    from json_spark.functions.keys import unknown_key_count

    docs = [
        ('{"qty":1,"active":true}', 0),
        ('{"QTY":1,"is-active":2,"extra":3}', 2),   # is-active/extra unmatched
        ('{"Qty":1,"Active":2,"Extra_Key":3}', 1),  # chameleon matches 2 of 3
        ("not json", None),
    ]
    df = spark.createDataFrame([(d,) for d, _ in docs], "raw string")
    got = {r["raw"]: r["n"] for r in df.select(
        "raw",
        unknown_key_count(F.col("raw"), ["qty", "active"]).alias("n"),
    ).collect()}
    for d, want in docs:
        assert got[d] == want, f"unknown_key_count({d!r})"
