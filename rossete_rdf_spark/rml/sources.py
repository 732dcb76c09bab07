"""Logical-source loaders: every RML source becomes a string-typed DataFrame.

The reference stages every source into all-TEXT SQLite tables with an
autoincrement `col_id` (src/input.rs:132-176); we keep the same observable
semantics — all referenced fields as strings, NULL read back as '' — but the
"staging store" is just the DataFrame itself (Catalyst prunes the scan to the
referenced columns; no copy is materialized).

Returned DataFrames have one sanitized column per referenced field plus
`__rid`, a monotonically-increasing ingest id that stands in for SQLite's
rowid for first-occurrence dedup / first-match join ordering.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .ast import LogicalSource

RID = "__rid"

_SAN = re.compile(r"[^A-Za-z0-9_]")


def sanitize(field: str) -> str:
    """Stable, collision-safe column name for a source field path."""
    return "f_" + _SAN.sub("_", field)


def colmap_for(fields: list[str]) -> dict[str, str]:
    return {f: sanitize(f) for f in fields}


def _string_or_empty(col, dtype) -> F.Column:
    # Non-scalar JSON values are skipped by the reference (column omitted ->
    # NULL -> read back as "", src/input.rs:469-488); NULLs become ''.
    if isinstance(dtype, (T.StructType, T.ArrayType, T.MapType, T.BinaryType)):
        return F.lit("")
    return F.coalesce(col.cast("string"), F.lit(""))


def _resolve_path(df: DataFrame, path: str):
    """Navigate a dotted path into nested structs; None if absent."""
    cur_type: T.DataType = df.schema
    col = None
    for part in path.split("."):
        if isinstance(cur_type, T.StructType) and part in cur_type.fieldNames():
            col = df[part] if col is None else col.getField(part)
            cur_type = cur_type[part].dataType
        else:
            return None, None
    return col, cur_type


def load_logical_source(
    spark: SparkSession, source: LogicalSource, fields: list[str]
) -> DataFrame:
    """Load `source` projected to `fields` (sanitized names) + __rid."""
    fmt = source.fmt
    cmap = colmap_for(fields)

    if fmt in ("csv", "tsv"):
        delim = "\t" if fmt == "tsv" else ","
        df = (
            spark.read.option("header", "true")
            .option("delimiter", delim)
            .option("inferSchema", "false")
            .csv(source.source)
        )
        missing = [f for f in fields if f not in df.columns]
        if missing:
            # a CSV row/file missing a requested column is a hard error in the
            # reference (src/input.rs:286-294)
            raise KeyError(f"CSV {source.source} lacks columns {missing}")
        cols = [
            F.coalesce(F.col(f"`{f}`").cast("string"), F.lit("")).alias(cmap[f])
            for f in fields
        ]
        return df.select(*cols).withColumn(RID, F.monotonically_increasing_id())

    if fmt == "json":
        df = spark.read.option("multiLine", "true").json(source.source)
        it = (source.iterator or "$").strip()
        if it not in ("$", ""):
            # iterator like $.items[*] / $.items — explode the array at the path
            path = it.lstrip("$").strip(".").replace("[*]", "")
            df = df.select(F.explode(F.col(path)).alias("_it"))
            df = df.select("_it.*")
        cols = []
        for f in fields:
            col, dtype = _resolve_path(df, f)
            if col is None:
                cols.append(F.lit("").alias(cmap[f]))
            else:
                cols.append(_string_or_empty(col, dtype).alias(cmap[f]))
        return df.select(*cols).withColumn(RID, F.monotonically_increasing_id())

    if fmt == "xml":
        # The reference's XML reader is a stub that stages zero rows
        # (src/input.rs:400-435) — XML-sourced TriplesMaps emit no triples.
        schema = T.StructType(
            [T.StructField(cmap[f], T.StringType()) for f in fields]
            + [T.StructField(RID, T.LongType())]
        )
        return spark.createDataFrame([], schema)

    if fmt in ("parquet", "table"):
        df = (
            spark.read.parquet(source.source)
            if fmt == "parquet" or source.source.endswith(".parquet")
            else spark.table(source.source)
        )
        cols = []
        for f in fields:
            col, dtype = _resolve_path(df, f)
            if col is None:
                raise KeyError(f"source {source.source} lacks column {f}")
            cols.append(_string_or_empty(col, dtype).alias(cmap[f]))
        return df.select(*cols).withColumn(RID, F.monotonically_increasing_id())

    raise ValueError(f"unsupported source format: {fmt}")
