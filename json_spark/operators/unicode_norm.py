"""Unicode normalization-form QA: NFC-denormalized text detection.

The same grapheme can be stored composed ("é", U+00E9) or decomposed
("e" + U+0301) — both render identically, but they hash, tokenize,
dedup and join differently, the byte-level sibling of the homoglyph
problem (operators/text_filters.py:script_mix_features). A corpus mixing
normalization forms silently fragments vocabulary and defeats exact
dedup, so a validation pass must count NFC-divergent documents before
any key is built on raw text.

Kernel: CPython's ``unicodedata.normalize("NFC", ...)`` inside a
map-only Arrow stage. The DuckDB oracle uses its NATIVE
``nfc_normalize`` (utf8proc) — two independent implementations of the
Unicode canonical-composition algorithm, so a match checks the real
detection path, not shared code.

Scale shape: map-only over the source partitioning, two ints out per
row; the rollup is a |groups|-key map-combinable aggregate.
"""

from __future__ import annotations

import unicodedata
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def nfc_divergence(df: DataFrame, text_col: str,
                   group_cols: list[str]) -> DataFrame:
    """Per-group NFC-divergence report: (group..., n_docs,
    n_denorm_docs, chars_shrunk, max_doc_shrink) where ``shrink`` is
    the character-count reduction under NFC (0 for already-normalized
    text). Null text contributes shrink 0."""
    cols = df.select(*group_cols, text_col)
    n_pass = len(group_cols)
    pass_ddl = "".join(
        f"{f.name} {f.dataType.simpleString()}, "
        for f in cols.schema.fields[:n_pass])

    def kern(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            texts = batch.column(n_pass).to_pylist()
            shrink = []
            for t in texts:
                if t is None:
                    shrink.append(0)
                else:
                    shrink.append(len(t)
                                  - len(unicodedata.normalize("NFC", t)))
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(n_pass)]
                + [pa.array(shrink, pa.int32())],
                group_cols + ["shrink"])

    per_doc = cols.mapInArrow(kern, pass_ddl + "shrink int")
    return per_doc.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("shrink") > 0).cast("long")).alias("n_denorm_docs"),
        F.sum("shrink").cast("long").alias("chars_shrunk"),
        F.max("shrink").alias("max_doc_shrink"))
