"""Web-corpus cleaning operators: URL canonicalization + URL-level dedup and
PII redaction. Both are pure Column expressions (whole-stage codegen, zero
Python) — the shapes a Common-Crawl-style ingest runs on every page before
any content-level dedup tier (cf. the reference's per-source ingest loop,
/root/reference/src/materialiser.rs source iteration).

The synthetic `documents` table carries no URL or PII, so both queries first
DERIVE those columns deterministically in-query (same convention as
kg_triples_delta's hash-bucket snapshot slices): the operator under test is
the normalizer/redactor, not the generator, and the oracle replays the
generator verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tracking parameters stripped during canonicalization (the standard list a
# crawl dedup uses; anything matching these prefixes never identifies a page).
TRACKING_PARAM_RE = "^(utm_|fbclid|gclid)"

# PII patterns — identical semantics under Java regex (Spark) and RE2
# (DuckDB): no lookaround, no backslash classes inside character sets.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


def synthetic_url(doc_id: Column, source: Column, lang: Column) -> Column:
    """Deterministic dirty URL per document: mixed-case scheme/host, an
    explicit default port, a www. prefix on every 3rd doc, tracking params on
    every 2nd, and a fragment on every 4th. Multiple doc_ids share a path
    (doc_id // 7) so canonicalization actually collapses groups."""
    return F.concat(
        F.lit("HTTP://"),
        F.when(doc_id % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        source,
        F.lit(".Example.COM:80/"),
        lang,
        F.lit("/page-"),
        (doc_id / 7).cast("long").cast("string"),
        F.when(
            doc_id % 2 == 0,
            F.concat(F.lit("?utm_source=feed&utm_campaign=x&id="), (doc_id % 5).cast("string")),
        ).otherwise(F.concat(F.lit("?id="), (doc_id % 5).cast("string"))),
        F.when(doc_id % 4 == 0, F.lit("#section-2")).otherwise(F.lit("")),
    )


def normalize_url(url: Column) -> Column:
    """Canonical form of a URL: drop the fragment, lowercase scheme+host,
    strip the :80 default port and a leading www., drop tracking params,
    sort the surviving query params, strip a trailing slash.

    Pure string/array codegen — no UDF, no shuffle; at 10^12 pages this is a
    projection fused into the scan stage."""
    base = F.regexp_replace(url, "#.*", "")
    head = F.regexp_extract(base, "^([^/?]*://[^/?#]*)", 1)
    tail = F.substring(base, F.length(head) + F.lit(1), F.lit(1 << 20))
    head = F.lower(head)
    head = F.regexp_replace(head, ":80$", "")
    head = F.regexp_replace(head, "://www[.]", "://")
    path = F.regexp_extract(tail, "^([^?]*)", 1)
    path = F.regexp_replace(path, "/$", "")
    query = F.regexp_extract(tail, "[?](.*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
    )
    qs = F.array_join(F.array_sort(params), "&")
    return F.concat(
        head, path, F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs))
    )


def url_dedup(docs: DataFrame) -> DataFrame:
    """(canonical_url, first_doc_id, n_docs) — URL-level exact dedup after
    canonicalization, keeping the earliest doc_id per canonical URL.

    ONE map-side-combinable hash-aggregate shuffle keyed by the canonical
    URL (same shape as exact_dedup's content hash): at 100 TB the
    normalization is free inside the scan projection and the shuffle carries
    only (url, min-id partials), never page payloads."""
    canon = normalize_url(
        synthetic_url(F.col("doc_id"), F.col("source"), F.col("lang"))
    )
    return (
        docs.select(canon.alias("canonical_url"), "doc_id")
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("first_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def planted_pii_text(doc_id: Column, text: Column) -> Column:
    """Deterministically plant an email on every 3rd doc and a phone number
    on every 5th (so redaction counts vary 0-1 per kind and doc 0 gets both)."""
    return F.concat(
        text,
        F.when(
            doc_id % 3 == 0,
            F.concat(F.lit(" contact user"), doc_id.cast("string"), F.lit("@example.com for details")),
        ).otherwise(F.lit("")),
        F.when(
            doc_id % 5 == 0,
            F.concat(F.lit(" or call 415-555-"), F.lpad((doc_id % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
    )


def pii_redact(docs: DataFrame) -> DataFrame:
    """(doc_id, n_emails, n_phones, redacted) — regex PII scrub, the
    mandatory pre-training compliance pass over a web corpus.

    Pure projection (two regexp_count + two chained regexp_replace in one
    codegen stage, zero exchanges): order emails-first so a phone-looking
    digit run inside an address can't be double-redacted."""
    pii = planted_pii_text(F.col("doc_id"), F.col("text"))
    return docs.select(
        "doc_id",
        F.regexp_count(pii, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(pii, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(pii, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ).alias("redacted"),
    )


# registrable domains whose entire subtree is banned (spam/SEO-farm tier)
BLOCKED_DOMAINS = ("src3.example.com", "src15.example.com")


def domain_blocklist(docs: DataFrame) -> DataFrame:
    """(doc_id, host, rule) — documents whose URL host is a blocked domain
    or ANY subdomain of one (www.src3.example.com is caught by the
    src3.example.com rule), the standard domain-reputation gate a web
    pipeline runs before spending tokenization on a page.

    Subdomain semantics WITHOUT a LIKE/suffix scan: each host explodes into
    its dot-suffixes (label count is bounded — public hosts have a handful
    of labels), and the suffixes equi-join the broadcast rule list. That
    keeps the match a hash join a 10^12-page scan can fuse — never a
    host-x-rules nested-loop with endswith, which is what a naive
    `host LIKE '%' || rule` plan degenerates to. Runs on the RAW (pre-
    canonicalization) host on purpose: reputation filtering must see the
    page exactly as crawled, before www-stripping folds hosts together."""
    url = synthetic_url(F.col("doc_id"), F.col("source"), F.col("lang"))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url, "://([^/?#]*)", 1)), ":[0-9]+$", ""
    )
    # host staged as a column before it is referenced twice (output + split):
    # the repo's tokenize-once convention — don't rely on codegen
    # subexpression elimination to dedupe the regex-over-concat chain
    staged = docs.select("doc_id", host.alias("host")).select(
        "doc_id", "host", F.split(F.col("host"), "[.]").alias("labels")
    )
    suffixes = F.transform(
        F.sequence(F.lit(0), F.size(F.col("labels")) - 1),
        lambda i: F.array_join(
            F.slice(F.col("labels"), i + 1, F.size(F.col("labels")) - i), "."
        ),
    )
    exploded = staged.select(
        "doc_id", "host", F.explode(suffixes).alias("suffix")
    )
    rules = docs.sparkSession.createDataFrame(
        [(r,) for r in BLOCKED_DOMAINS], "rule string"
    )
    return exploded.join(
        F.broadcast(rules), F.col("suffix") == F.col("rule")
    ).select("doc_id", "host", "rule")
