"""URL / domain-level curation operators (round-5 VERDICT item 5).

The one standard web-curation stage the engine didn't cover: every large
crawl pipeline (C4, RefinedWeb, FineWeb, Dolma) runs URL plumbing before
any content filter — parse the URL, reduce the host to its registrable
domain (eTLD+1), drop blocklisted domains, canonicalize + exact-dedup by
URL, and cap documents per domain so no single site dominates the corpus.

The fixtures' ``documents`` table carries no URL column, so queries attach
a deterministic synthetic URL derived from (doc_id, source, lang) — the
same attach-then-operate discipline as ``multimodal.attach_payload``. The
synthesis expression is plain SQL both engines evaluate identically, so
every operator here is fully DuckDB-oracle-checked.

Scale shapes (the 100 TB posture):
- parsing/canonicalization are pure narrow maps (regexp + string ops,
  whole-stage codegen, zero Exchange);
- the blocklist filter is a BROADCAST left join on the registrable domain
  (a real blocklist is 10^5-10^7 rows — megabytes — while the corpus side
  never shuffles);
- canonical-URL dedup is one map-side-combinable groupBy on the canonical
  key (same shape as dedup_exact_hash);
- the per-domain cap is a bounded-output window Spark 4 pre-prunes with
  WindowGroupLimit before the exchange, so the shuffle carries at most
  cap rows per domain, not the corpus.

Reference scope note: the reference engine (Deekshitha257/
mongo-iceberg-lakehouse) has no URL stage; this extends the LLM-pipeline
charter surface (SURVEY.md §2.11).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Multi-label public suffixes the naive eTLD+1 must special-case. A real
# deployment ships the full Mozilla PSL as a broadcast table; the rule
# below (suffix list + label arithmetic) is exactly how that lookup
# composes, just with a bounded literal list.
MULTI_LABEL_SUFFIXES: tuple[str, ...] = ("co.uk", "com.au", "co.jp")

# Tracking parameters stripped by canonicalization (the C4/FineWeb set).
# Entries ending in "_" are prefixes (utm_* family); the rest are exact
# keys. The regex alternation below is BUILT from this tuple so the
# constant and the pattern cannot drift (round-5 ADVICE item 1).
TRACKING_PARAM_PREFIXES: tuple[str, ...] = ("utm_", "fbclid", "gclid", "ref")

TRACKING_KEY_RE: str = "|".join(
    re.escape(p) + "[a-z]+" if p.endswith("_") else re.escape(p)
    for p in TRACKING_PARAM_PREFIXES
)

# Separator-anchored: a tracking key only matches immediately after '?' or
# '&' (never mid-token, so semantic params like '?href=x' or '?xref=y'
# survive), and a RUN of consecutive tracking params is consumed in one
# match — Java and RE2 both resume scanning after the match end, so
# without the '+' the second of two adjacent params would be skipped.
TRACKING_PARAMS_RE: str = rf"([?&])(({TRACKING_KEY_RE})=[^&#]*&?)+"


def synthetic_url(
    doc_id: Column | str = "doc_id",
    source: Column | str = "source",
    lang: Column | str = "lang",
) -> Column:
    """Deterministic URL for a document row; pure SQL on both engines.

    Exercises every branch the parser/canonicalizer must handle: http vs
    https, a www. prefix, a cdn. subdomain, three TLDs including the
    multi-label co.uk, an explicit default port :443 (stripped) and a
    non-default :8080 (kept), a bounded path space (so canonical dedup
    finds real collisions), tracking vs semantic query params, trailing
    slashes, and fragments.
    """
    i = F.col(doc_id) if isinstance(doc_id, str) else doc_id
    src = F.col(source) if isinstance(source, str) else source
    lg = F.col(lang) if isinstance(lang, str) else lang
    scheme = F.when(i % 7 == 0, F.lit("http")).otherwise(F.lit("https"))
    sub = (
        F.when(i % 3 == 0, F.lit("www."))
        .when(i % 11 == 0, F.lit("cdn."))
        .otherwise(F.lit(""))
    )
    tld = (
        F.when(i % 3 == 0, F.lit("com"))
        .when(i % 3 == 1, F.lit("org"))
        .otherwise(F.lit("co.uk"))
    )
    port = (
        F.when(i % 13 == 0, F.lit(":443"))
        .when(i % 13 == 1, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path = F.concat(F.lit("/art/"), (i % 12).cast("string"))
    slash = F.when(i % 2 == 0, F.lit("/")).otherwise(F.lit(""))
    query = (
        F.when(
            i % 4 == 0,
            F.concat(F.lit("?utm_source=rss&utm_medium="), lg),
        )
        .when(i % 4 == 1, F.concat(F.lit("?id="), (i % 5).cast("string")))
        .otherwise(F.lit(""))
    )
    frag = F.when(i % 6 == 0, F.lit("#sec2")).otherwise(F.lit(""))
    # '-ex.' keeps the source inside the REGISTRABLE label ('src3-ex.co.uk'),
    # so eTLD+1 distinguishes sources; an infix dot would collapse every
    # host to 3 shared domains and gut the blocklist/cap semantics.
    return F.concat(
        scheme, F.lit("://"), sub, src, F.lit("-ex."), tld, port,
        path, slash, query, frag,
    )


# The equivalent DuckDB expression for oracles (identical branch logic).
SYNTHETIC_URL_SQL = """
    (CASE WHEN doc_id % 7 = 0 THEN 'http' ELSE 'https' END) || '://'
    || (CASE WHEN doc_id % 3 = 0 THEN 'www.'
             WHEN doc_id % 11 = 0 THEN 'cdn.' ELSE '' END)
    || source || '-ex.'
    || (CASE WHEN doc_id % 3 = 0 THEN 'com'
             WHEN doc_id % 3 = 1 THEN 'org' ELSE 'co.uk' END)
    || (CASE WHEN doc_id % 13 = 0 THEN ':443'
             WHEN doc_id % 13 = 1 THEN ':8080' ELSE '' END)
    || '/art/' || CAST(doc_id % 12 AS VARCHAR)
    || (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END)
    || (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=rss&utm_medium=' || lang
             WHEN doc_id % 4 = 1 THEN '?id=' || CAST(doc_id % 5 AS VARCHAR)
             ELSE '' END)
    || (CASE WHEN doc_id % 6 = 0 THEN '#sec2' ELSE '' END)
"""


def url_host(url: Column) -> Column:
    """Hostname (no scheme, userinfo, port, path): regexp identical on both
    engines, so oracles use the same pattern instead of parse_url (which
    DuckDB lacks)."""
    return F.regexp_extract(url, r"^[a-z]+://([^/:?#]+)", 1)


def registrable_domain(host: Column) -> Column:
    """Naive eTLD+1: last two host labels, or last three when the host ends
    in a known multi-label public suffix. Composes exactly like a full
    PSL lookup (longest-matching-suffix + one label)."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    is_multi = F.lit(False)
    for suf in MULTI_LABEL_SUFFIXES:
        is_multi = is_multi | host.endswith("." + suf)
    # Clamp to the label count: hosts with <= take labels ('localhost',
    # a bare 'co.uk') would otherwise produce slice start <= 0, which
    # Spark rejects (0) or counts from the end (negative).
    take = F.least(F.when(is_multi, F.lit(3)).otherwise(F.lit(2)), n)
    return F.array_join(F.slice(parts, n - take + 1, take), ".")


def canonical_url(url: Column) -> Column:
    """Canonical form for exact URL dedup (the C4/FineWeb normalization):
    drop the scheme (http/https alias), drop a leading ``www.``, strip the
    default ports ``:80``/``:443`` (non-default ports are load-bearing and
    stay), drop the fragment, drop tracking query params (utm_*, fbclid,
    gclid, ref) while keeping semantic ones, drop a now-empty ``?``, and
    strip one trailing slash. Pure regexp_replace chain — a narrow map."""
    u = F.regexp_replace(url, r"^[a-z]+://", "")  # scheme off
    u = F.regexp_replace(u, r"^www\.", "")
    u = F.regexp_replace(u, r":(80|443)(?=/|\?|#|$)", "")
    u = F.regexp_replace(u, r"#.*$", "")  # fragment
    # tracking params: kill runs of 'key=value' where key is a tracking
    # key anchored to a '?'/'&' separator (keeps '?href=x' etc.), then
    # tidy separators left behind ('?&', trailing '?'/'&')
    u = F.regexp_replace(u, TRACKING_PARAMS_RE, "$1")
    u = F.regexp_replace(u, r"\?&", "?")
    u = F.regexp_replace(u, r"[?&]$", "")
    # trailing path slash goes whether the path ends the URL or a query
    # string follows ('/art/3/?id=2' == '/art/3?id=2')
    u = F.regexp_replace(u, r"/(\?|$)", "$1")
    return u


# DuckDB mirrors (same regexes; DuckDB regexp_replace needs 'g' for
# global, and RE2 supports the (?=...) lookahead used for ports... it does
# NOT — RE2 has no lookahead, so the port rule is written as a capture).
# The tracking-param alternation is substituted from TRACKING_KEY_RE so
# the Spark and DuckDB patterns are one definition.
CANONICAL_URL_SQL_STEPS = """
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        {url},
        '^[a-z]+://', ''),
        '^www\\.', ''),
        ':(80|443)(/|\\?|#|$)', '\\2'),
        '#.*$', ''),
        '([?&])((__TRACKING_KEYS__)=[^&#]*&?)+', '\\1', 'g'),
        '\\?&', '?'),
        '[?&]$', ''),
        '/(\\?|$)', '\\1')
""".replace("__TRACKING_KEYS__", TRACKING_KEY_RE)


def parse_urls(
    df: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Attach host + registrable domain columns (narrow map)."""
    host = url_host(F.col(url_col))
    return df.withColumn("host", host).withColumn(
        "domain", registrable_domain(F.col("host"))
    )


def domain_blocklist_filter(
    df: DataFrame,
    blocked: DataFrame,
    domain_col: str = "domain",
    blocked_col: str = "blocked_domain",
) -> DataFrame:
    """Flag rows whose registrable domain is blocklisted.

    Broadcast LEFT join + null test rather than an IN-literal: a real
    blocklist is an external table of 10^5-10^7 domains — megabytes,
    always broadcast-able — and the corpus side stays shuffle-free at any
    scale. Subdomains are already folded by registrable_domain, so exact
    domain equality IS the subdomain-inclusive test. Returns the input
    plus a ``kept`` flag (funnel form: callers filter or count either leg
    without a second scan)."""
    b = blocked.select(F.col(blocked_col).alias("__blocked")).distinct()
    return (
        df.join(
            F.broadcast(b),
            F.col(domain_col) == F.col("__blocked"),
            "left",
        )
        .withColumn("kept", F.col("__blocked").isNull())
        .drop("__blocked")
    )


def canonical_url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup on the canonical URL: one map-side-combinable groupBy;
    survivor = min id (deterministic), with the duplicate count kept for
    audit. Returns (canon_url, keep_id, dup_count)."""
    return (
        df.withColumn("canon_url", canonical_url(F.col(url_col)))
        .groupBy("canon_url")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).cast("bigint").alias("dup_count"),
        )
    )


def domain_cap(
    df: DataFrame,
    cap: int,
    domain_col: str = "domain",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` documents per registrable domain, preferring
    longer documents (then smallest id — fully deterministic). The rank
    filter sits directly on the window so Spark 4 rewrites it to
    WindowGroupLimit: each map task pre-prunes to its local top-cap
    before the exchange, so the shuffle is bounded by cap x |domains|
    regardless of corpus size (the skewed-megadomain case is exactly
    where that matters)."""
    w = Window.partitionBy(domain_col).orderBy(
        F.col(order_col).desc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= cap)
        .withColumn("rk", F.col("rk").cast("int"))
    )
