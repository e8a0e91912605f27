"""URL canonicalization — the crawl-curation stage that precedes every
text-level dedup pass at web scale (CommonCrawl-style pipelines dedup
by canonical URL before ever hashing document bodies; reference scope:
the engine side of a crawl-ingest flow, beyond
recs-at-resonable-scale's batch tables).

The canonicalizer is pure JVM expression work (``parse_url`` +
higher-order array filtering — no UDF, no shuffle), so at 100 TB it
rides the document scan for free:

- scheme and host lowercased, a leading ``www.`` stripped;
- the fragment dropped (``parse_url`` never returns it);
- tracking parameters removed (``utm_*``, ``ref``, ``fbclid``,
  ``gclid``) while CONTENT parameters are kept in their original
  order — the standard "strip marketing noise, keep pagination"
  policy;
- a trailing path slash stripped; an emptied query string drops its
  ``?``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters that never change page content — stripped by the
#: canonicalizer. Kept as a tuple so tests and docs cite one source.
TRACKING_PARAMS = ("utm_", "ref", "fbclid", "gclid")


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url`` — lowercased scheme/host, no ``www.``
    prefix, no fragment, tracking params stripped (content params kept
    in order), no trailing path slash. Expression-only (whole-stage
    codegen), NULL-safe: a NULL url canonicalizes to NULL."""
    host = F.regexp_replace(
        F.lower(F.parse_url(url, F.lit("HOST"))), r"^www\.", ""
    )
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    path = F.regexp_replace(
        F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("")), r"/$", ""
    )
    query = F.coalesce(F.parse_url(url, F.lit("QUERY")), F.lit(""))
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (
            (p != "")
            & ~p.startswith("utm_")
            & ~p.rlike(r"^(ref|fbclid|gclid)=")
        ),
    )
    canon_query = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, canon_query)


def synthetic_url(doc_id: Column, source: Column) -> Column:
    """Deterministic MESSY url for a document — the fixture generator
    both engines replay (the codec-corpus discipline: Spark builds the
    raw string and canonicalizes it FOR REAL; the oracle computes the
    canonical form straight from the formula and never parses, so a
    canonicalizer bug fails the hash). Variations: scheme/host case,
    optional ``www.``, a tracking-vs-content query mix, an optional
    fragment and trailing slash."""
    scheme = F.when(doc_id % 5 == 0, F.lit("HTTPS")).otherwise(F.lit("https"))
    www = (
        F.when(doc_id % 7 == 0, F.lit("WWW."))
        .when(doc_id % 7 == 1, F.lit("www."))
        .otherwise(F.lit(""))
    )
    host_src = F.when(doc_id % 2 == 0, F.upper(source)).otherwise(source)
    # 140 ≡ 0 mod the source period (20), the query-branch period (4),
    # the host-case (2), scheme-case (5) and www (7) periods — so ids
    # 140 apart produce raw variants differing ONLY in fragment and
    # trailing slash, which the canonicalizer must merge (the fixture
    # guarantees non-vacuous dedup at every SF ≥ 140 docs).
    path = F.concat(F.lit("/articles/"), (doc_id % 140).cast("string"))
    slash = F.when(doc_id % 13 == 0, F.lit("/")).otherwise(F.lit(""))
    query = (
        F.when(doc_id % 4 == 1, F.lit("?utm_source=feed"))
        .when(doc_id % 4 == 2, F.lit("?page=2"))
        .when(doc_id % 4 == 3, F.lit("?utm_campaign=x&page=2"))
        .otherwise(F.lit(""))
    )
    frag = F.when(doc_id % 11 == 0, F.lit("#section-3")).otherwise(F.lit(""))
    return F.concat(
        scheme,
        F.lit("://"),
        www,
        host_src,
        F.lit(".example.com"),
        path,
        slash,
        query,
        frag,
    )


def synthetic_url_blocked(doc_id: Column, block: int = 4) -> Column:
    """:func:`synthetic_url` with a LINEARLY-scaling article space:
    the article id is ``doc_id // block`` instead of ``doc_id % 140``,
    and the host derives from the BLOCK (not the per-doc source
    column, which changes every doc_id and would defeat merging), so
    each consecutive ``block`` of doc_ids shares one host+article and
    the canonical-url group count grows with the corpus (constant
    merge factor at EVERY scale). Use this fixture for pipeline-scale
    rows (l98's corpus funnel must not collapse to a fixed 140 pages
    at 100×); ``synthetic_url``'s fixed cycle stays the right fixture
    for the canonicalizer-focused rows (l95/l96), where heavy merging
    is the point. Same messiness dimensions: scheme/host case, www,
    tracking-vs-content query mix, fragment, trailing slash."""
    scheme = F.when(doc_id % 5 == 0, F.lit("HTTPS")).otherwise(F.lit("https"))
    www = (
        F.when(doc_id % 7 == 0, F.lit("WWW."))
        .when(doc_id % 7 == 1, F.lit("www."))
        .otherwise(F.lit(""))
    )
    article_n = F.floor(doc_id / F.lit(block)).cast("long")
    host_plain = F.concat(F.lit("site"), (article_n % 10).cast("string"))
    host_src = F.when(doc_id % 2 == 0, F.upper(host_plain)).otherwise(
        host_plain
    )
    article = article_n.cast("string")
    path = F.concat(F.lit("/articles/"), article)
    slash = F.when(doc_id % 13 == 0, F.lit("/")).otherwise(F.lit(""))
    query = (
        F.when(doc_id % 4 == 1, F.lit("?utm_source=feed"))
        .when(doc_id % 4 == 2, F.lit("?page=2"))
        .when(doc_id % 4 == 3, F.lit("?utm_campaign=x&page=2"))
        .otherwise(F.lit(""))
    )
    frag = F.when(doc_id % 11 == 0, F.lit("#section-3")).otherwise(F.lit(""))
    return F.concat(
        scheme,
        F.lit("://"),
        www,
        host_src,
        F.lit(".example.com"),
        path,
        slash,
        query,
        frag,
    )
