"""Crawl-policy gating — the robots/noindex + license filter that runs
beside URL canonicalization (llmops/urls.py) in every crawl-curation
pipeline: a page that says ``noindex`` or carries a non-permissive
license must be dropped BEFORE any text ever reaches the corpus,
regardless of quality (reference scope: the engine side of a crawl
ingest flow, beyond recs-at-resonable-scale's batch tables).

The extractors are pure JVM regexp expressions (no UDF, no shuffle),
robust to the messiness real HTML heads have — attribute order, quote
style, tag/attribute case, extra whitespace — so at 100 TB the gate
rides the document scan for free, exactly like the canonicalizer.

The fixture generator (``synthetic_page_head``) follows the repo's
codec-corpus discipline: Spark builds the messy raw string and parses
it FOR REAL; the oracle computes the verdicts straight from the
generator formula and never parses, so any extractor bug (missed attr
order, case leak, quote confusion) fails the hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: licenses a commercial, derivative-producing training pipeline may
#: ingest (CC BY, CC BY-SA, CC0). BY-NC (non-commercial), BY-ND
#: (no-derivatives) and license-less pages are gated out.
PERMISSIVE_LICENSES = (
    "licenses/by/4.0",
    "licenses/by-sa/4.0",
    "publicdomain/zero/1.0",
)

# Attribute-order-robust, case-insensitive, quote-agnostic patterns.
_ROBOTS_NAME_FIRST = (
    r"(?i)<meta\s+name\s*=\s*[\"']robots[\"']\s+"
    r"content\s*=\s*[\"']([^\"']*)[\"']"
)
_ROBOTS_CONTENT_FIRST = (
    r"(?i)<meta\s+content\s*=\s*[\"']([^\"']*)[\"']\s+"
    r"name\s*=\s*[\"']robots[\"']"
)
_LICENSE_REL_FIRST = (
    r"(?i)<link\s+rel\s*=\s*[\"']license[\"']\s+href\s*=\s*"
    r"[\"']https?://creativecommons\.org/([a-z0-9./-]+?)/?[\"']"
)
_LICENSE_HREF_FIRST = (
    r"(?i)<link\s+href\s*=\s*"
    r"[\"']https?://creativecommons\.org/([a-z0-9./-]+?)/?[\"']"
    r"\s+rel\s*=\s*[\"']license[\"']"
)


def _first_match(head: Column, *patterns: str) -> Column:
    """First non-empty regexp_extract across the patterns (Spark's
    regexp_extract returns '' on no-match; normalize to NULL)."""
    return F.coalesce(
        *[
            F.nullif(F.regexp_extract(head, p, 1), F.lit(""))
            for p in patterns
        ]
    )


def extract_robots(head: Column) -> Column:
    """The robots meta directive string, lowercased; NULL when the page
    carries no robots meta tag. Handles both attribute orders, both
    quote styles, any tag/attribute case, and extra whitespace."""
    return F.lower(
        _first_match(head, _ROBOTS_NAME_FIRST, _ROBOTS_CONTENT_FIRST)
    )


def extract_license(head: Column) -> Column:
    """The creativecommons license slug from a ``rel="license"`` link
    (e.g. ``licenses/by-sa/4.0``, ``publicdomain/zero/1.0``); NULL when
    no license link exists. Order/case/quote robust; trailing slash
    stripped by the non-greedy group."""
    return _first_match(head, _LICENSE_REL_FIRST, _LICENSE_HREF_FIRST)


def policy_gate(
    df: DataFrame, head_col: str = "head", id_col: str = "doc_id"
) -> DataFrame:
    """Per-page policy verdicts: the robots directive, the noindex
    flag, the license slug, and the combined ``allowed`` gate
    (NOT noindex AND license ∈ PERMISSIVE_LICENSES — absent metadata
    fails CLOSED on the license, open on robots, the standard
    conservative crawl policy).

    Scale: one projection over the page scan — whole-stage codegen,
    no shuffle; apply it before (or fused with) the URL keep-first
    pass so every later stage sees only ingestible pages."""
    robots = extract_robots(F.col(head_col))
    noindex = F.coalesce(robots.contains("noindex"), F.lit(False))
    lic = extract_license(F.col(head_col))
    lic_ok = F.coalesce(lic.isin(*PERMISSIVE_LICENSES), F.lit(False))
    return df.select(
        id_col,
        robots.alias("robots"),
        noindex.alias("noindex"),
        lic.alias("license"),
        (~noindex & lic_ok).alias("allowed"),
    )


def synthetic_robots_txt(host_idx: Column) -> Column:
    """Deterministic robots.txt fixture per host (``host_idx`` 0-9,
    the blocked-url fixture's host space). Three grammars by ``%3``:

    - **0**: a commented ``User-Agent: *`` group with a Disallow
      prefix AND a longer Allow exception — exercises longest-match
      + Allow-wins;
    - **1**: a ``googlebot`` group that disallows everything followed
      by a ``*`` group with an EMPTY Disallow — exercises group
      selection (the wrong group bans everything) and the spec rule
      that an empty Disallow matches nothing; directive case varies;
    - **2**: a ``*`` group with two Disallow prefixes, one of which
      never matches articles — exercises multiple rules per group.
    """
    h = host_idx % 3
    g0 = (
        "# fixture: disallow articles except the 2xx block\n"
        "User-Agent: *\n"
        "Disallow: /articles/\n"
        "Allow: /articles/2\n"
    )
    g1 = (
        "User-agent: googlebot\n"
        "Disallow: /\n"
        "\n"
        "user-agent: *\n"
        "disallow:\n"
    )
    g2 = (
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Disallow: /articles/7\n"
    )
    return (
        F.when(h == 0, F.lit(g0))
        .when(h == 1, F.lit(g1))
        .otherwise(F.lit(g2))
    )


def parse_robots_rules(
    robots: DataFrame,
    txt_col: str = "robots_txt",
    host_col: str = "host",
    agent: str = "*",
) -> DataFrame:
    """Parse robots.txt documents into (host, rule_type, prefix) rows
    for the group applying to ``agent`` — REAL grammar work, all JVM
    expressions: lines split and trimmed, comment/blank lines ignored,
    directive names case-insensitive, each line attributed to the
    CURRENT user-agent group by a forward-fill window (the classic
    last-non-null-value fill, partitioned per host — never global),
    and empty-value Disallow dropped (per spec it matches nothing).

    Scale: robots documents are per-HOST (a bounded dimension next to
    the billions of URLs they govern), so this parses a tiny frame the
    caller then broadcasts into the URL-decision join."""
    from pyspark.sql import Window

    ln = robots.select(
        host_col,
        F.posexplode(F.split(F.col(txt_col), "\n")).alias("pos", "raw"),
    ).select(host_col, "pos", F.trim("raw").alias("line"))
    ua_val = F.when(
        F.col("line").rlike(r"(?i)^user-agent\s*:"),
        F.trim(F.regexp_extract("line", r"(?i)^user-agent\s*:\s*(.*)$", 1)),
    )
    w = (
        Window.partitionBy(host_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    attributed = ln.withColumn(
        "cur_agent", F.last(ua_val, ignorenulls=True).over(w)
    )
    return (
        attributed.filter(F.col("cur_agent") == agent)
        .select(
            host_col,
            F.lower(
                F.regexp_extract("line", r"(?i)^(allow|disallow)\s*:", 1)
            ).alias("rule_type"),
            F.trim(
                F.regexp_extract(
                    "line", r"(?i)^(allow|disallow)\s*:\s*(.*)$", 2
                )
            ).alias("prefix"),
        )
        .filter((F.col("rule_type") != "") & (F.col("prefix") != ""))
    )


def robots_decisions(
    urls: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-URL robots verdict by the Google longest-match rule: among
    the agent's rules whose prefix starts the url path, the LONGEST
    prefix wins; Allow beats Disallow on equal length; no matching
    rule means allowed.

    Scale: ``rules`` is host-dimension-sized — broadcast — so the
    decision is one broadcast join + per-URL max-struct aggregate;
    URLs never shuffle on anything but their own id. The prefix match
    lives IN the join condition (a left outer keeps every URL exactly
    once when nothing matches), and host/path ride the aggregate — so
    ``urls`` is consumed ONCE instead of re-derived for a second
    doc_id-keyed join against the aggregate (r13-opt, guide §2.4:
    that re-join was a full extra scan + parse plus a shuffle join of
    two url-sized sides; plan went 3 url derivations → 1)."""
    r = rules.select(
        F.col(host_col).alias("_r_host"),
        F.col("rule_type").alias("_r_type"),
        F.col("prefix").alias("_r_prefix"),
    )
    matched = urls.join(
        F.broadcast(r),
        (F.col(host_col) == F.col("_r_host"))
        & F.col(path_col).startswith(F.col("_r_prefix")),
        "left",
    )
    best = matched.groupBy(id_col).agg(
        # host/path are constant per URL id — max() re-emits them
        # without a second join back to ``urls``
        F.max(F.col(host_col)).alias(host_col),
        F.max(F.col(path_col)).alias(path_col),
        F.max(
            F.when(
                F.col("_r_prefix").isNotNull(),
                F.struct(
                    F.length("_r_prefix").alias("plen"),
                    (F.col("_r_type") == "allow").cast("int").alias("pri"),
                    F.col("_r_type").alias("rule_type"),
                    F.col("_r_prefix").alias("prefix"),
                ),
            )
        ).alias("best"),
    )
    return best.select(
        id_col,
        host_col,
        path_col,
        F.col("best.rule_type").alias("rule_type"),
        F.col("best.prefix").alias("matched_rule"),
        (
            F.col("best").isNull()
            | (F.col("best.rule_type") == "allow")
        ).alias("crawl_allowed"),
    )


def synthetic_page_head(doc_id: Column) -> Column:
    """Deterministic MESSY html head for a document — the fixture both
    engines replay. Variation dimensions (all doc_id-driven):

    - robots content by ``%4``: index,follow / noindex /
      noindex,nofollow / NO robots tag at all;
    - license link by ``%6``: by / by-sa / by-nc / none / cc0 / by-nd;
    - quote style ``%2``, attribute order ``%3``, tag+attr+value
      UPPERCASING ``%5``, doubled whitespace ``%7``.
    """
    q = F.when(doc_id % 2 == 0, F.lit('"')).otherwise(F.lit("'"))
    sp = F.when(doc_id % 7 == 0, F.lit("  ")).otherwise(F.lit(" "))
    up = doc_id % 5 == 0

    def cased(lower: str) -> Column:
        return F.when(up, F.lit(lower.upper())).otherwise(F.lit(lower))

    robots_val = (
        F.when(doc_id % 4 == 0, F.lit("index, follow"))
        .when(doc_id % 4 == 1, F.lit("noindex"))
        .when(doc_id % 4 == 2, F.lit("noindex, nofollow"))
    )
    robots_val = F.when(up, F.upper(robots_val)).otherwise(robots_val)
    name_kv = F.concat(cased("name"), F.lit("="), q, cased("robots"), q)
    content_kv = F.concat(cased("content"), F.lit("="), q, robots_val, q)
    meta = F.concat(
        F.lit("<"), cased("meta"), sp,
        F.when(doc_id % 3 == 0, F.concat(content_kv, sp, name_kv))
        .otherwise(F.concat(name_kv, sp, content_kv)),
        F.lit(">"),
    )
    meta = F.when(robots_val.isNull(), F.lit("")).otherwise(meta)

    slug = (
        F.when(doc_id % 6 == 0, F.lit("licenses/by/4.0"))
        .when(doc_id % 6 == 1, F.lit("licenses/by-sa/4.0"))
        .when(doc_id % 6 == 2, F.lit("licenses/by-nc/4.0"))
        .when(doc_id % 6 == 4, F.lit("publicdomain/zero/1.0"))
        .when(doc_id % 6 == 5, F.lit("licenses/by-nd/4.0"))
    )
    href = F.concat(
        F.lit("https://creativecommons.org/"), slug, F.lit("/")
    )
    rel_kv = F.concat(cased("rel"), F.lit("="), q, cased("license"), q)
    href_kv = F.concat(cased("href"), F.lit("="), q, href, q)
    link = F.concat(
        F.lit("<"), cased("link"), sp,
        F.when(doc_id % 3 == 0, F.concat(href_kv, sp, rel_kv))
        .otherwise(F.concat(rel_kv, sp, href_kv)),
        F.lit(">"),
    )
    link = F.when(slug.isNull(), F.lit("")).otherwise(link)

    title = F.concat(
        F.lit("<title>Doc "), doc_id.cast("string"), F.lit("</title>")
    )
    return F.concat(F.lit("<head>"), title, meta, link, F.lit("</head>"))
