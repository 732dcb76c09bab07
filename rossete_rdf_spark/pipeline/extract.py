"""Text extraction from raw HTML bytes — the pipeline's pinned per-row
invariant: extraction is byte-identical per url across runs and cluster
sizes (BASELINE.json input_hint).

Implemented as an Arrow-batched pandas UDF (never row-at-a-time Python): each
batch is a pandas Series of byte strings; the extractor is pure and
deterministic. Real-world decode of images/audio/video would slot in the
same way — see multimodal.py for the stubbed variants."""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType
from pyspark.sql.functions import pandas_udf

_TAG = re.compile(rb"<[^>]*>")
_WS = re.compile(rb"\s+")
_BODY = re.compile(rb"<body[^>]*>(.*)</body>", re.DOTALL | re.IGNORECASE)


def extract_text_bytes(html: bytes) -> bytes:
    """Main-content extraction: body-only, tags stripped, whitespace
    collapsed. Pure function of the input bytes — THE pinned invariant."""
    if html is None:
        return b""
    m = _BODY.search(html)
    content = m.group(1) if m else html
    no_tags = _TAG.sub(b" ", content)
    return _WS.sub(b" ", no_tags).strip()


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(lambda b: extract_text_bytes(b).decode("utf-8", "replace"))


def extract_pages(pages: DataFrame, python_parallelism: int | None = None) -> DataFrame:
    """(url, warc_ts, html, ...) -> (url, warc_ts, lang, text) with text
    re-derived from html bytes. Column expression everywhere except the
    vectorized extractor itself.

    python_parallelism caps the number of concurrent Python workers for this
    stage (coalesce, no shuffle) — the pandas-UDF analogue of running model
    inference with spark.task.cpus > 1: JVM-side stages keep full
    parallelism, the Python stage runs at the worker count that saturates
    the Arrow feed instead of oversubscribing every core."""
    df = pages.coalesce(python_parallelism) if python_parallelism else pages
    return df.select(
        "url",
        "warc_ts",
        "lang",
        extract_text_udf(F.col("html")).alias("text"),
    )
