"""Hypothesis property tests for the pure-Python surfaces (no SparkSession:
these run on every pytest invocation at negligible cost and search the input
space instead of pinning examples).

Covered properties:
- BMP/PPM decode: for ANY (w, h, pixel bytes), an encoder-built payload
  decodes to exactly the per-channel means of the bytes that went in —
  including whitespace-valued pixel bytes after the PPM header and BMP row
  padding, the two classic decoder bugs.
- decode robustness: any truncation of a valid payload raises ValueError
  (malformed-data signal), never a raw struct/numpy error — the contract
  extract_media_features relies on to emit NULL rows instead of dying.
- split_bucket / DuckDB parity: the Python replay of the md5-prefix bucket
  arithmetic equals DuckDB's for arbitrary ids, so the train/test split and
  incremental dedup's batch boundary are engine-portable for ANY id, not
  just the synthetic ones.
"""

from __future__ import annotations

import hashlib
import struct

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from rossete_rdf_spark.pipeline.multimodal import (
    _bmp_row_size,
    decode_image,
)

dims = st.tuples(st.integers(1, 12), st.integers(1, 12))


def _build_ppm(w: int, h: int, px: bytes) -> bytes:
    return b"P6\n%d %d\n255\n" % (w, h) + px


def _build_bmp(w: int, h: int, rgb: bytes) -> bytes:
    """24-bit BI_RGB bottom-up BMP from row-major RGB triplets."""
    row = _bmp_row_size(w)
    body = bytearray(row * h)
    for y in range(h):
        for x in range(w):
            p = 3 * (y * w + x)
            q = (h - 1 - y) * row + 3 * x  # bottom-up storage
            r, g, b = rgb[p : p + 3]
            body[q : q + 3] = bytes((b, g, r))
    head = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return head + bytes(body)


@settings(max_examples=60, deadline=None)
@given(dims, st.data())
def test_ppm_decode_exact_means(wh, data):
    w, h = wh
    px = data.draw(st.binary(min_size=3 * w * h, max_size=3 * w * h))
    got = decode_image(_build_ppm(w, h, px))
    n = w * h
    exp = tuple(sum(px[c::3]) / n for c in range(3))
    assert got == (w, h, *exp)


@settings(max_examples=60, deadline=None)
@given(dims, st.data())
def test_bmp_decode_exact_means(wh, data):
    w, h = wh
    rgb = data.draw(st.binary(min_size=3 * w * h, max_size=3 * w * h))
    got = decode_image(_build_bmp(w, h, rgb))
    n = w * h
    exp = tuple(sum(rgb[c::3]) / n for c in range(3))
    assert got == (w, h, *exp)


@settings(max_examples=60, deadline=None)
@given(dims, st.data())
def test_any_truncation_raises_valueerror(wh, data):
    w, h = wh
    n = 3 * w * h
    px = bytes(range(256))[:1] * n
    payload = (
        _build_bmp(w, h, px) if data.draw(st.booleans()) else _build_ppm(w, h, px)
    )
    cut = data.draw(st.integers(1, len(payload) - 1))
    truncated = payload[:cut]
    # either the magic/header survives truncation -> ValueError, or the
    # magic itself is gone -> NotImplementedError; never struct/numpy errors
    with pytest.raises((ValueError, NotImplementedError)):
        decode_image(truncated)


def _py_bucket(seed: str, doc_id: int) -> int:
    h = int(hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()[:15], 16)
    return h % 100


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 2**31 - 1), min_size=1, max_size=25, unique=True))
def test_split_bucket_matches_duckdb_for_any_id(ids):
    con = duckdb.connect()
    rows = con.execute(
        "SELECT i, ('0x' || substr(md5('split|' || i::VARCHAR), 1, 15))::BIGINT % 100 "
        "FROM (SELECT unnest(?::BIGINT[]) AS i)",
        [ids],
    ).fetchall()
    for i, bucket in rows:
        assert bucket == _py_bucket("split", i)
