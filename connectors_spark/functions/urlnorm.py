"""URL canonicalization — ONE rule set, two renderings (Column / SQL).

The web-pipeline staple ahead of URL-keyed dedup and per-domain caps
(every public crawl pipeline — C4, CCNet, Dolma, FineWeb — dedups on a
canonical URL before touching content): two spellings of the same page
must map to one key, or URL dedup silently under-counts.

Rules, applied in order (scope kept to the deterministic, safe subset —
no IDN/percent-decoding, which can CHANGE identity):

    1. strip the fragment            (#... never reaches the server)
    2. scheme lowercased             (HTTP:// == http://)
    3. host lowercased, leading www. stripped
    4. default port stripped         (:80 for http, :443 for https)
    5. trailing slash(es) of the path stripped (root -> empty)
    6. tracking params dropped       (utm_*, fbclid, gclid, msclkid,
                                      mc_eid, igshid, ref, ref_src)
    7. remaining query params sorted bytewise, re-joined with '&'
    8. non-absolute input (no scheme://) -> NULL canonical

Both renderings below are step-for-step literally parallel so the
DuckDB-hash gate verifies them against each other. All ops are JVM
regex/array expressions — no Python in the loop; the per-row cost is
O(|url|), shuffle-free.

Engine-parity notes baked into the rules: every regexp_replace pattern
is anchored or single-match (DuckDB replaces first match only, Spark
replaces all — anchoring makes that moot); the '&' split delimiter is
regex-metachar-free (Spark's split is regex, DuckDB's is literal);
list_sort/array_sort agree bytewise on ASCII.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
TRACKING_RE = r"^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|mc_eid|igshid|ref|ref_src)$"


def canonical_url_col(url: Column) -> Column:
    """struct(canonical_url, host) for an absolute URL column; both
    fields NULL when the input has no scheme://."""
    nofrag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, SCHEME_RE, 1))
    rest = F.regexp_replace(nofrag, SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]+)", 1))
    host0 = F.regexp_replace(hostport, r"^www\.", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(host0, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host0, r":443$", ""))
        .otherwise(host0)
    )
    pathq = F.regexp_replace(rest, r"^[^/?]+", "")
    path = F.regexp_replace(
        F.regexp_extract(pathq, r"^([^?]*)", 1), r"/+$", "")
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~F.regexp_extract(p, r"^([^=]*)", 1).rlike(TRACKING_RE),
    )
    qsorted = F.array_join(F.array_sort(params), "&")
    canonical = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qsorted != "", F.concat(F.lit("?"), qsorted))
         .otherwise(F.lit("")),
    )
    ok = scheme != ""
    return F.struct(
        F.when(ok, canonical).alias("canonical_url"),
        F.when(ok, host).alias("host"),
    )


def canonical_url_sql_ctes(url_expr: str, src: str) -> str:
    """DuckDB CTE chain mirroring canonical_url_col step for step.
    `src` must expose (doc_id, {url_expr}); the final CTE is
    `urlc(doc_id, canonical_url, host)`."""
    return f"""
u0 AS (SELECT doc_id, regexp_replace({url_expr}, '#.*$', '') AS nofrag
       FROM {src}),
u1 AS (SELECT doc_id, nofrag,
              lower(regexp_extract(nofrag, '{SCHEME_RE}', 1)) AS scheme,
              regexp_replace(nofrag, '{SCHEME_RE}', '') AS rest
       FROM u0),
u2 AS (SELECT doc_id, scheme, rest,
              regexp_replace(lower(regexp_extract(rest, '^([^/?]+)', 1)),
                             '^www\\.', '') AS host0
       FROM u1),
u3 AS (SELECT doc_id, scheme, rest,
              CASE WHEN scheme = 'http'
                     THEN regexp_replace(host0, ':80$', '')
                   WHEN scheme = 'https'
                     THEN regexp_replace(host0, ':443$', '')
                   ELSE host0 END AS host,
              regexp_replace(rest, '^[^/?]+', '') AS pathq
       FROM u2),
u4 AS (SELECT doc_id, scheme, host,
              regexp_replace(regexp_extract(pathq, '^([^?]*)', 1),
                             '/+$', '') AS path,
              regexp_extract(pathq, '\\?(.*)$', 1) AS query
       FROM u3),
u5 AS (SELECT doc_id, scheme, host, path,
              array_to_string(list_sort(list_filter(
                string_split(query, '&'),
                p -> p <> '' AND NOT regexp_matches(
                       regexp_extract(p, '^([^=]*)', 1),
                       '{TRACKING_RE}'))), '&') AS qsorted
       FROM u4),
urlc AS (SELECT doc_id,
                CASE WHEN scheme <> '' THEN
                  scheme || '://' || host || path ||
                  CASE WHEN qsorted <> '' THEN '?' || qsorted ELSE '' END
                END AS canonical_url,
                CASE WHEN scheme <> '' THEN host END AS host
         FROM u5)"""
