#!/usr/bin/env python3
"""Tiny language-dimension fixture (lang -> family, quality_tier) for the
dynamic-partition-pruning query: the filter lives on a NON-join column
(family), so only runtime subquery pruning — not static predicate pushdown —
can skip lang partitions. Run once; commit this script and the parquet.
"""
import pyarrow as pa
import pyarrow.parquet as pq
import pathlib

rows = {
    "lang": ["en", "de", "es", "fr", "zh"],
    "family": ["germanic", "germanic", "romance", "romance", "sinitic"],
    "quality_tier": [1, 1, 2, 2, 1],
}
p = pathlib.Path(__file__).resolve().parent / "lang_dim.parquet"
pq.write_table(pa.table(rows), p)
print(f"wrote {p}")
