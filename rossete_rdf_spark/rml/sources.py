"""Logical-source loaders: every RML source becomes a string-typed DataFrame.

The reference stages every source into all-TEXT SQLite tables with an
autoincrement `col_id` (src/input.rs:132-176); we keep the same observable
semantics — all referenced fields as strings, NULL read back as '' — but the
"staging store" is just the DataFrame itself (Catalyst prunes the scan to the
referenced columns; no copy is materialized).

Returned DataFrames have one sanitized column per referenced field plus
`__rid`, a monotonically-increasing ingest id that stands in for SQLite's
rowid for first-occurrence dedup / first-match join ordering.

__rid determinism: monotonically_increasing_id is (partitionId << 33 | row
offset), so its ORDER depends on how the scan is split. Guarantees:
  - a source that lands in ONE split (any file under
    spark.sql.files.maxPartitionBytes, i.e. every RML mapping fixture) gets
    exact file order — identical to SQLite rowid;
  - multi-file / multi-split sources get a stable order for a FIXED file
    layout, but Spark bin-packs splits by size, so the winner of a
    first-occurrence tie can differ from strict ingest order across layouts.
    The reference's rowid is absolute; at the 100 TB design point the
    tie-break among true duplicates is value-irrelevant by construction
    (duplicate projected tuples are identical in every referenced column),
    so this only matters for byte-level diffs of text exports, not for graph
    parity. Parquet sources upgrade to exact per-file order via
    _metadata.row_index below; CSV/JSON sources upgrade to the same
    split-invariant (file, row-in-file) order under
    EngineConfig.strict_ingest_order, paying one per-file window sort at
    ingest (partitioned by file — parallel across files).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .ast import LogicalSource
from .config import EngineConfig, FileSpec

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


_META_FP = "__fp"
_META_BS = "__bs"


def _file_key_table(df: DataFrame, path_col) -> DataFrame:
    """(__fp, __fkey): dense rank over the DISTINCT file-path set — the
    collision-FREE per-file key for the exact-__rid schemes below. A
    truncated-hash bucket (the previous 22-bit scheme) collides with ~1%
    odds at ~400 files and near-certainly at web-scale file counts; a
    collision gives two files identical rid high bits, i.e. duplicate rids,
    making the min_by first-occurrence tie-break nondeterministic — exactly
    what the exact modes exist to rule out. The rank window sorts #files
    rows (never data rows) and the keyed table broadcasts back onto the
    scan; the distinct itself reads only the file-path metadata column."""
    from pyspark.sql.window import Window

    files = df.select(path_col.alias(_META_FP)).distinct()
    w = Window.orderBy(_META_FP)
    return files.withColumn("__fkey", F.dense_rank().over(w).cast("long"))


def _with_rid(df: DataFrame, cols: list, strict: bool) -> DataFrame:
    """Project `cols` and attach __rid. strict=False: per-split monotonic id
    (cheap, layout-dependent across splits — module docstring). strict=True:
    exact (file, row-in-file) order — dense per-file key in the high bits
    (same scheme as the parquet path), row index from a window partitioned
    by file and ordered by (block offset, within-task position); the sort is
    per-file, so a many-file corpus keeps full parallelism."""
    if not strict:
        return df.select(*cols).withColumn(RID, F.monotonically_increasing_id())
    from pyspark.sql.window import Window

    if _META_FP not in df.columns:
        df = df.select(
            "*",
            F.col("_metadata.file_path").alias(_META_FP),
            F.col("_metadata.file_block_start").alias(_META_BS),
        )
    staged = df.select(
        *cols, _META_FP, _META_BS,
        F.monotonically_increasing_id().alias("__mono"),
    )
    fkeys = _file_key_table(staged, F.col(_META_FP))
    staged = staged.join(F.broadcast(fkeys), _META_FP)
    w = Window.partitionBy(_META_FP).orderBy(_META_BS, "__mono")
    rid = F.shiftleft(F.col("__fkey"), 40) + F.row_number().over(w).cast("long")
    return staged.withColumn(RID, rid).drop(_META_FP, _META_BS, "__mono", "__fkey")


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


_SEG = re.compile(r"^([^\[\]]*)((?:\[\*\])*)$")


def _apply_json_iterator(df: DataFrame, iterator: str) -> DataFrame:
    """Evaluate a JSONPath-style iterator ($.a.b[*].c[*]...) by navigating
    struct fields and exploding each array level (reference evaluates real
    JSONPath per match, src/input.rs:333-392). Supports nested paths, multiple
    array levels, and arrays without an explicit [*] (auto-exploded — the
    reference's `$.students` and `$.students[*]` stage the same rows).
    An absent path yields zero rows (no JSONPath matches)."""
    path = iterator.strip().lstrip("$").strip(".")
    if not path:
        return df

    # ingest-order metadata columns (strict_ingest_order) ride along through
    # every explode so the post-iterator rows still know their source file
    keep = [c for c in (_META_FP, _META_BS) if c in df.columns]
    expr = None
    dtype: T.DataType = df.schema
    for seg in path.split("."):
        m = _SEG.match(seg)
        name = m.group(1) if m else seg
        stars = (m.group(2).count("[*]") if m and m.group(2) else 0) or 0
        if name:
            if not (isinstance(dtype, T.StructType) and name in dtype.fieldNames()):
                return df.limit(0)  # no matches
            expr = F.col(name) if expr is None else expr.getField(name)
            dtype = dtype[name].dataType
        # explode once per explicit [*]; also auto-explode a bare array so the
        # next segment (or field resolution) sees element schema
        hops = max(stars, 1 if isinstance(dtype, T.ArrayType) else 0)
        for _ in range(hops):
            if not isinstance(dtype, T.ArrayType):
                return df.limit(0)
            df = df.select(*keep, F.explode(expr).alias("_it"))
            expr = F.col("_it")
            dtype = dtype.elementType

    if expr is not None:
        if isinstance(dtype, T.StructType):
            return df.select(*keep, expr.alias("_it")).select(*keep, "_it.*")
        # scalar leaf: expose it under the last path segment's name
        leaf = path.split(".")[-1].replace("[*]", "") or "_it"
        return df.select(*keep, expr.alias(leaf))
    return df


def load_logical_source(
    spark: SparkSession,
    source: LogicalSource,
    fields: list[str],
    config: EngineConfig | None = None,
) -> DataFrame:
    """Load `source` projected to `fields` (sanitized names) + __rid.

    `config` supplies per-file CSV read options (delimiter / header /
    encoding) exactly like the reference's files-data config entries
    (src/config.rs:234-272); defaults match the reference's FileSpecs
    defaults (',', header, UTF-8 — src/config.rs:325-333)."""
    fmt = source.fmt
    cmap = colmap_for(fields)
    spec = config.spec_for(source.source) if config else None
    if spec and spec.file_type:
        ft = spec.file_type.lower()
        if ft in ("csv", "tsv", "json", "xml", "parquet"):
            fmt = ft

    if fmt in ("csv", "tsv"):
        spec = spec or FileSpec(delimiter="\t" if fmt == "tsv" else ",")
        delim = spec.delimiter if spec.delimiter else ("\t" if fmt == "tsv" else ",")
        if fmt == "tsv" and spec.delimiter == ",":
            delim = "\t"  # per-type default wins unless explicitly configured
        df = (
            spark.read.option("header", "true" if spec.header else "false")
            .option("delimiter", delim)
            .option("encoding", spec.encoding)
            .option("inferSchema", "false")
            .csv(source.source)
        )
        if not spec.header:
            # headerless files address columns positionally: field "0"/"_c0"
            # -> Spark's _c0 (extension; the reference requires headers to
            # address fields by name, src/input.rs:276-295)
            rename = {}
            for f in fields:
                if f in df.columns:
                    continue
                if f.isdigit() and f"_c{int(f)}" in df.columns:
                    rename[f] = f"_c{int(f)}"
            missing = [f for f in fields if f not in df.columns and f not in rename]
        else:
            rename = {}
            missing = [f for f in fields if f not in df.columns]
        if missing:
            # a CSV row/file missing a requested column is a hard error in the
            # reference (src/input.rs:286-294)
            raise KeyError(f"CSV {source.source} lacks columns {missing}")
        cols = [
            F.coalesce(F.col(f"`{rename.get(f, f)}`").cast("string"), F.lit("")).alias(
                cmap[f]
            )
            for f in fields
        ]
        return _with_rid(df, cols, bool(config and config.strict_ingest_order))

    if fmt == "json":
        df = spark.read.option("multiLine", "true").json(source.source)
        strict = bool(config and config.strict_ingest_order)
        if strict:
            # capture the file metadata BEFORE the iterator explodes away
            # the scan columns; _apply_json_iterator threads it through
            df = df.select(
                "*",
                F.col("_metadata.file_path").alias(_META_FP),
                F.col("_metadata.file_block_start").alias(_META_BS),
            )
        it = (source.iterator or "$").strip()
        if it not in ("$", ""):
            df = _apply_json_iterator(df, it)
        cols = []
        for f in fields:
            col, dtype = _resolve_path(df, f)
            if col is None:
                cols.append(F.lit("").alias(cmap[f]))
            else:
                cols.append(_string_or_empty(col, dtype).alias(cmap[f]))
        return _with_rid(df, cols, strict)

    if fmt == "xml":
        if config is not None and config.xml_real:
            return _load_xml_real(spark, source, fields, cmap)
        # Default: the reference's XML reader is a stub that stages zero rows
        # (src/input.rs:400-435) — XML-sourced TriplesMaps emit no triples,
        # and golden parity depends on it. Opt into a real reader with
        # EngineConfig(xml_real=True) / config key "xml-real".
        schema = T.StructType(
            [T.StructField(cmap[f], T.StringType()) for f in fields]
            + [T.StructField(RID, T.LongType())]
        )
        return spark.createDataFrame([], schema)

    if fmt in ("parquet", "table"):
        is_parquet = fmt == "parquet" or source.source.endswith(".parquet")
        df = (
            spark.read.parquet(source.source)
            if is_parquet
            else spark.table(source.source)
        )
        cols = []
        for f in fields:
            col, dtype = _resolve_path(df, f)
            if col is None:
                raise KeyError(f"source {source.source} lacks column {f}")
            cols.append(_string_or_empty(col, dtype).alias(cmap[f]))
        if is_parquet:
            # exact, split-invariant ingest order: (file, row-in-file) via the
            # parquet _metadata columns — cross-cluster-stable rowid semantics.
            # file key = dense rank over the distinct file paths (collision-
            # free; see _file_key_table), shifted clear of the 40-bit row
            # index — bitwise, ANSI-overflow-safe. The key table is tiny and
            # broadcast; the distinct reads only parquet footers.
            fkeys = _file_key_table(df, F.col("_metadata.file_path"))
            staged = df.select(
                *cols,
                F.col("_metadata.file_path").alias(_META_FP),
                F.col("_metadata.row_index").alias("__ri"),
            ).join(F.broadcast(fkeys), _META_FP)
            rid = F.shiftleft(F.col("__fkey"), 40) + F.col("__ri")
            return staged.withColumn(RID, rid).drop(_META_FP, "__fkey", "__ri")
        return df.select(*cols).withColumn(RID, F.monotonically_increasing_id())

    raise ValueError(f"unsupported source format: {fmt}")


def _load_xml_real(
    spark: SparkSession, source: LogicalSource, fields: list[str], cmap: dict[str, str]
) -> DataFrame:
    """Opt-in real XML source (EngineConfig.xml_real): whole files are read
    as binary (one row per file — XML is not line-splittable), parsed with
    stdlib ElementTree inside an Arrow-batched mapInPandas, iterator =
    XPath-style element path (`/root/item` or `.//item`), fields = child
    element text or `@attribute`. Per-file parallelism: a 100 TB corpus of
    many XML files distributes by file; a single giant document does not
    (inherent to the format)."""
    import pandas as pd

    it = (source.iterator or "").strip()
    field_list = list(fields)

    out_schema = T.StructType(
        [T.StructField(cmap[f], T.StringType()) for f in field_list]
        + [T.StructField(RID, T.LongType())]
    )

    def parse(batches):
        import xml.etree.ElementTree as ET
        import zlib

        for pdf in batches:
            rows: dict[str, list] = {cmap[f]: [] for f in field_list}
            rids: list[int] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    root = ET.fromstring(bytes(content))
                except ET.ParseError:
                    continue  # reference skips unparseable docs
                # '/a/b' -> children path relative to root; './/b' works as-is
                xp = it
                if xp.startswith("/"):
                    parts = [p for p in xp.split("/") if p]
                    # first segment names the root element itself
                    xp = "./" + "/".join(parts[1:]) if len(parts) > 1 else "."
                # stable per-file base (Python hash() is salted per process)
                base = (zlib.crc32(path.encode()) & 0x3FFFFF) << 40
                for i, el in enumerate(root.findall(xp or ".")):
                    for f in field_list:
                        if f.startswith("@"):
                            v = el.get(f[1:], "")
                        else:
                            child = el.find(f)
                            v = (child.text or "") if child is not None else ""
                        rows[cmap[f]].append(v)
                    rids.append(base + i)
            out = pd.DataFrame(rows)
            out[RID] = pd.Series(rids, dtype="int64")
            yield out

    files = (
        spark.read.format("binaryFile")
        .load(source.source)
        .select(F.col("path"), F.col("content"))
    )
    return files.mapInPandas(parse, schema=out_schema)
