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


def extract_text_bytes(html: bytes) -> bytes:
    """Strip tags, collapse whitespace. Pure function of the input bytes."""
    if html is None:
        return b""
    no_tags = _TAG.sub(b" ", html)
    return _WS.sub(b" ", no_tags).strip()


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(lambda b: extract_text_bytes(b).decode("utf-8", "replace"))


def extract_pages(pages: DataFrame) -> DataFrame:
    """(url, warc_ts, html, ...) -> (url, warc_ts, lang, text) with text
    re-derived from html bytes. Column expression everywhere except the
    vectorized extractor itself."""
    return pages.select(
        "url",
        "warc_ts",
        "lang",
        extract_text_udf(F.col("html")).alias("text"),
    )
