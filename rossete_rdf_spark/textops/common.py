"""Shared tokenization primitives for the training-data ops.

Every op in textops/ ships BOTH a Spark implementation and an ANSI-SQL oracle
(DuckDB) that must produce byte-identical values; these helpers keep the two
sides' tokenization in lock-step. Hashing is md5 (identical hex output in
Spark and DuckDB), never engine-specific hash() functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- Spark side ------------------------------------------------------------


def words_col(text: Column) -> Column:
    """Whitespace tokens, empties removed. Matches sql_words()."""
    return F.filter(F.split(text, r"\s+"), lambda w: w != "")


def gram_index(w: Column, n: int) -> Column:
    """1..(len(w)-n+1), or [] when the doc has < n words.

    NOT sequence(1, greatest(len-n+1, 0)): Spark's sequence() DESCENDS when
    start > stop (sequence(1, 0) = [1, 0]), so the greatest() guard alone
    still emits indices 0 and 1 for short docs and element_at crashes with
    INVALID_ARRAY_INDEX. The corpus (all docs >= 10 words) never hits it;
    any real web crawl would."""
    m = F.size(w)
    return F.when(m >= n, F.sequence(F.lit(1), m - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )


def pos_grams(w: Column, n: int) -> Column:
    """POSITIONAL word n-grams (duplicates kept) joined by spaces, over a
    word-array column. Matches sql_pos_grams(). The single Spark-side gram
    builder — every gram consumer (dedup, winnowing, sketches) derives from
    it, so an indexing/guard change lands everywhere at once.

    Spark arrays are 0-indexed (element_at is 1-indexed); the SQL twin uses
    DuckDB's 1-indexed lists — both emit tokens[i..i+n-1] joined with ' '."""
    return F.transform(
        gram_index(w, n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, (i + j).cast("int")) for j in range(n)]
        ),
    )


# NOTE deliberately no one-arg "ngrams over text" convenience builder: every
# caller must stage the word array as a named column FIRST and pass it to
# pos_grams (array_distinct on top where set semantics are wanted). A helper
# that takes the text column would re-tokenize once per element_at inside the
# gram lambda — the 5-12x regression guarded by
# tests/test_plans.py::test_gram_builders_tokenize_once.


# --- SQL (DuckDB oracle) side ----------------------------------------------


def sql_words(text_expr: str) -> str:
    return f"list_filter(string_split_regex({text_expr}, '\\s+'), w -> w <> '')"


def sql_pos_grams(words_expr: str, n: int = 3) -> str:
    """DuckDB expression: POSITIONAL word n-grams (duplicates kept) over a
    word-list expression — the twin of the Spark side's pos_grams.

    range(1, len-n+2) is empty when the doc has < n words, so short docs
    yield [] exactly like the Spark side's gram_index when/otherwise guard
    (NOT a greatest() clamp — see gram_index on why that crashes)."""
    join = " || ' ' || ".join(f"({words_expr})[i+{j}]" for j in range(n))
    return f"[{join} for i in range(1, len({words_expr}) - {n - 2})]"


def sql_ngrams(words_expr: str, n: int = 3) -> str:
    """DuckDB expression: distinct word n-grams over a word-list expression."""
    return f"list_distinct({sql_pos_grams(words_expr, n)})"
