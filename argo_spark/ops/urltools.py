"""URL canonicalization, URL-level dedup, and domain filtering.

Web-corpus pipelines dedup and filter by URL before any content pass
(the reference consumes already-fetched pages — url is its document
key, extractor.go/pipeline — so URL hygiene is the natural upstream
operator this engine adds for the 100-TB path). Everything here is a
codegen column expression — regexp chains and conditionals, no UDFs,
no shuffle except the one dedup groupBy — so it runs at scan speed
and the dedup's single exchange is on the canonical-url hash with no
skew (URLs are near-unique).

Canonicalization rule (documented, deterministic):

1. trim surrounding whitespace;
2. drop the fragment (``#...``);
3. lowercase the scheme and the authority (host[:port]) — the path
   and query keep their case;
4. strip the scheme's default port (``:80`` for http, ``:443`` for
   https);
5. remove tracking query parameters (``utm_*``, ``fbclid``,
   ``gclid``, ``msclkid``) and collapse the separators left behind;
6. strip one trailing ``/``.

Parameter REORDERING is deliberately not done: it would conflate
semantically ordered queries; this is normalization, not equivalence
classing. ``registered_domain`` uses a built-in list of common
two-label public suffixes instead of the full Public Suffix List
(offline container) — documented divergence from PSL-backed tools.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING = r"(?:utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid)"

# common ccTLD second-level registries: enough that registered_domain
# gives example.co.uk -> example.co.uk, not co.uk
_TWO_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "com.tw", "com.sg", "co.za", "com.ar",
)


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module rule — a pure column
    expression (whole-stage codegen, zero Python)."""
    u = F.trim(url)
    # 2. fragment
    u = F.regexp_replace(u, "#.*", "")
    # 3. split scheme://authority from the rest; lowercase the front.
    # Authority = everything up to the first /, ?, or end.
    scheme = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    auth = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    has_scheme = scheme != ""
    lscheme, lauth = F.lower(scheme), F.lower(auth)
    # 4. default ports
    lauth = F.when(
        (lscheme == "http") & lauth.endswith(":80"),
        F.regexp_replace(lauth, ":80$", ""),
    ).when(
        (lscheme == "https") & lauth.endswith(":443"),
        F.regexp_replace(lauth, ":443$", ""),
    ).otherwise(lauth)
    u = F.when(
        has_scheme,
        F.concat(lscheme, F.lit("://"), lauth, rest),
    ).otherwise(u)
    # 5. tracking params: the separator is kept via the group ref, so
    # '?utm=1&b=2' -> '?&b=2' -> collapsed below ('?&' -> '?',
    # trailing '?'/'&' dropped). No lookarounds — the same pattern
    # runs under RE2 for the DuckDB oracle.
    u = F.regexp_replace(u, r"([?&])" + _TRACKING + r"=[^&#]*", r"$1")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]+$", "")
    # 6. one trailing slash
    u = F.regexp_replace(u, "/$", "")
    return u


def host_of(url: Column) -> Column:
    """Lowercased host of ``url`` (port and credentials stripped)."""
    auth = F.lower(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    auth = F.regexp_extract(auth, r"(?:[^@]*@)?([^:]*)", 1)
    return auth


def registered_domain(url: Column) -> Column:
    """Registrable domain of ``url``'s host: the last two labels,
    or the last three when the two-label tail is a known registry
    suffix (co.uk, com.au, ...). Heuristic stand-in for the Public
    Suffix List — documented in the module docstring."""
    host = host_of(url)
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    three = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    return F.when(
        two.isin(*_TWO_LABEL_SUFFIXES) & (three != ""), three
    ).otherwise(two)


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    quality_col: str | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """One row per canonical URL. The survivor is the row with the
    highest ``quality_col`` (ties and absence fall through to the
    smallest ``id_col``, then the smallest url string — fully
    deterministic). Single hash-partition exchange on the canonical
    url; max_by-style struct aggregation keeps it one pass with a
    map-side partial (no window, no second shuffle)."""
    canon = canonicalize_url(F.col(url_col)).alias("__canon")
    # min() over a struct whose leading fields are NEGATED quality /
    # raw id: struct ordering is lexicographic, so this is
    # max-quality, then min-id, then min-url — strings can't be
    # negated, which is why min (not max) drives the whole key
    neg_parts = []
    if quality_col is not None:
        neg_parts.append(-F.col(quality_col).cast("double"))
    else:
        neg_parts.append(F.lit(0.0))
    if id_col is not None:
        # ANSI mode (on by default here) makes cast("long") raise
        # CAST_INVALID_INPUT on non-numeric string ids; try_cast yields
        # NULL instead.  NULL sorts low in struct-min, which would let
        # any non-numeric id beat every numeric one — so non-numeric
        # ids get Long.Max and the raw string (always appended) breaks
        # the tie lexicographically.  Fully deterministic either way.
        idn = F.col(id_col).try_cast("long")
        neg_parts.append(F.coalesce(idn, F.lit(2**63 - 1)))
        neg_parts.append(F.col(id_col).cast("string"))
    else:
        neg_parts.append(F.lit(0).cast("long"))
        neg_parts.append(F.lit(""))
    payload = F.struct(
        *neg_parts,
        F.col(url_col).alias("__u"),
        F.struct(*[F.col(c) for c in df.columns]).alias("__row"),
    )
    best = (
        df.select(canon, payload.alias("__p"))
        .groupBy("__canon")
        .agg(F.min("__p").alias("__best"))
    )
    out = best.select(
        F.col("__canon").alias("canonical_url"), F.col("__best.__row.*")
    )
    return out


def filter_blocked_domains(
    df: DataFrame, blocked: list[str], url_col: str = "url"
) -> DataFrame:
    """Drop rows whose registrable domain is in ``blocked`` (exact
    match on the registered domain, so subdomains are covered). The
    blocklist rides as an isin literal — broadcast-free, codegen'd;
    for very large blocklists switch to a broadcast anti-join."""
    if not blocked:
        return df
    dom = registered_domain(F.col(url_col))
    if len(blocked) > 10_000:
        spark = df.sparkSession
        bl = spark.createDataFrame(
            [(b.lower(),) for b in blocked], "dom string"
        )
        from pyspark.sql.functions import broadcast

        return (
            df.withColumn("__dom", dom)
            .join(broadcast(bl), F.col("__dom") == bl.dom, "left_anti")
            .drop("__dom")
        )
    return df.where(~dom.isin(*[b.lower() for b in blocked]))
