"""URL parsing and domain-blocklist filtering for web-corpus curation.

The reference engine (json_schemer) has no web-curation surface; these
operators extend the engine for the large-scale training-data pipeline
(C4 / RefinedWeb-style URL filtering: parse the source URL of every page,
derive its registered domain, and drop pages whose host falls under a
blocklisted domain).

Design notes (100 TB contract):

- Everything is pure ``Column`` algebra — one narrow projection per row,
  no shuffle, no Python, fully inside whole-stage codegen. A blocklist
  passed as a Python sequence is embedded as an array *literal* in the
  plan (blocklists are contractually small: typically 1e3–1e6 entries;
  above ~1e5 use :func:`domain_blocklist_join`).
- :func:`domain_blocklist_join` is the large-blocklist twin: it explodes
  the bounded host-suffix candidates (≤ :data:`MAX_HOST_LABELS` per row)
  and equi-joins them against a blocklist *DataFrame* — a broadcast hash
  join for dimension-sized blocklists, a plain shuffle join otherwise.
  Never a cartesian: suffix matching is reduced to exact key equality.
- All regexes are written in the Java+RE2-compatible subset (same
  discipline as :mod:`json_schemer_spark.operators.text`'s PII ops) so a
  DuckDB oracle can run character-identical patterns.

Semantics:

- ``host``: the authority with userinfo (up to the last ``@``), a
  trailing ``:port``, and a trailing dot stripped, lowercased. IPv6
  literal hosts (``[::1]``) are out of scope and pass through verbatim.
- ``registered_domain``: the last two labels, or the last three when the
  last two form one of the common multi-label public suffixes in
  :data:`MULTI_LABEL_SUFFIXES` (a small embedded subset — the full
  public-suffix list is a runtime data file this container doesn't ship;
  swap the constant for the real PSL in production).
- blocklist match: an entry ``d`` blocks a URL when ``host == d`` or
  ``host`` ends with ``"." + d`` — i.e. the entry blocks itself and all
  subdomains, the usual blocklist contract.
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MAX_HOST_LABELS",
    "MULTI_LABEL_SUFFIXES",
    "url_features",
    "domain_blocklist_filter",
    "domain_blocklist_join",
    "strip_html",
    "canonicalize_urls",
]

#: Bound on the host-suffix candidate expansion (labels per host). Real
#: registrable hosts rarely exceed 6 labels; 8 keeps the per-row array
#: tiny while covering anything a blocklist would plausibly name.
MAX_HOST_LABELS = 8

#: Common multi-label public suffixes (embedded subset of the PSL).
MULTI_LABEL_SUFFIXES = (
    "ac.uk", "co.uk", "gov.uk", "org.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "co.in", "co.nz", "co.za",
    "com.br", "com.mx", "com.cn",
)

# Java+RE2-compatible, shared verbatim with the DuckDB oracle.
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_USERINFO_RE = r"^.*@"   # greedy: strips userinfo up to the LAST '@'
_PORT_RE = r":[0-9]+$"
_TRAILING_DOT_RE = r"\.$"


def _host_col(url: Column) -> Column:
    auth = F.regexp_extract(url, _AUTHORITY_RE, 1)
    host = F.regexp_replace(auth, _USERINFO_RE, "")
    host = F.regexp_replace(host, _PORT_RE, "")
    host = F.regexp_replace(F.lower(host), _TRAILING_DOT_RE, "")
    return host


def _registered_domain_col(host: Column) -> Column:
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # F.slice start must be >= 1; the greatest() guard keeps the branch
    # well-formed even though CASE only *selects* it when n is large
    # enough (CaseWhen is lazy, but stay defensive against constant
    # folding of the unguarded sub-expression).
    last2 = F.array_join(F.slice(labels, F.greatest(n - 1, F.lit(1)), 2), ".")
    last3 = F.array_join(F.slice(labels, F.greatest(n - 2, F.lit(1)), 3), ".")
    return (
        F.when((n >= 3) & last2.isin(*MULTI_LABEL_SUFFIXES), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def _suffix_candidates_col(host: Column) -> Column:
    """All dot-suffixes of ``host`` (shortest first), bounded to
    :data:`MAX_HOST_LABELS` labels: ``a.b.c`` → ``[c, b.c, a.b.c]``.
    Blocklist matching becomes exact membership over this array."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), F.least(n, F.lit(MAX_HOST_LABELS))),
        lambda i: F.array_join(F.slice(labels, n - i + 1, i), "."),
    )


def url_features(df: DataFrame, url_col: str) -> DataFrame:
    """Adds ``scheme`` (lowercased; NULL when the value is not a URL),
    ``host``, ``registered_domain``, and ``path`` columns. One narrow
    per-row map — no shuffle, no Python."""
    url = F.col(url_col)
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    host = _host_col(url)
    return df.withColumns({
        "scheme": F.when(scheme == "", F.lit(None).cast("string")).otherwise(scheme),
        "host": host,
        "registered_domain": _registered_domain_col(host),
        "path": F.regexp_extract(url, _PATH_RE, 1),
    })


def domain_blocklist_filter(
    df: DataFrame,
    url_col: str,
    blocklist: Iterable[str],
    *,
    keep_blocked: bool = True,
) -> DataFrame:
    """Small-blocklist (in-plan literal) domain filter.

    Adds ``blocked`` and ``matched_entry`` (the most specific — longest —
    matching blocklist entry, NULL when unblocked) on top of
    :func:`url_features`'s columns. With ``keep_blocked=False`` the
    blocked rows are filtered out instead of annotated, which lets
    Catalyst push the whole predicate into the scan pipeline.

    Zero shuffle, zero joins: the blocklist is embedded as an array
    literal and matching is ``F.filter`` over the bounded host-suffix
    array. For blocklists too large to inline (≳1e5 entries) use
    :func:`domain_blocklist_join`.
    """
    entries = sorted({e.strip().lower().rstrip(".") for e in blocklist} - {""})
    if not entries:
        raise ValueError("blocklist is empty")
    out = url_features(df, url_col)
    matches = F.filter(
        _suffix_candidates_col(F.col("host")), lambda s: s.isin(*entries)
    )
    # suffix candidates are ordered shortest-first, so the last match is
    # the most specific entry
    blocked = F.size(matches) > 0
    out = out.withColumns({
        "blocked": blocked,
        "matched_entry": F.when(blocked, F.element_at(matches, -1)),
    })
    if not keep_blocked:
        out = out.filter(~F.col("blocked")).drop("blocked", "matched_entry")
    return out


def domain_blocklist_join(
    df: DataFrame,
    url_col: str,
    blocklist_df: DataFrame,
    id_col: str,
    *,
    entry_col: str = "entry",
    broadcast: Optional[bool] = True,
) -> DataFrame:
    """Large-blocklist twin of :func:`domain_blocklist_filter`: the
    blocklist is a DataFrame with one domain per row (``entry_col``).

    Plan shape: bounded suffix expansion (``posexplode``, ≤
    :data:`MAX_HOST_LABELS` rows per input row) → exact equi-join on the
    suffix (broadcast by default; pass ``broadcast=False`` for a shuffle
    hash join when the blocklist itself is large) → one hash aggregation
    back to one row per ``id_col`` keeping the most specific match.
    Never compares a host against more than its own suffix set — no
    cartesian, no prefix LIKE scan.
    """
    bl = blocklist_df.select(
        F.regexp_replace(F.lower(F.trim(F.col(entry_col))), _TRAILING_DOT_RE, "")
        .alias("__bl_entry")
    ).distinct()
    if broadcast:
        bl = F.broadcast(bl)
    feats = url_features(df, url_col)
    exploded = feats.select(
        F.col(id_col),
        F.explode_outer(_suffix_candidates_col(F.col("host"))).alias("__sfx"),
    )
    hit = exploded.join(bl, exploded["__sfx"] == bl["__bl_entry"], "left")
    agg = hit.groupBy(id_col).agg(
        F.max(F.length("__bl_entry")).alias("__bl_len"),
        F.max_by("__bl_entry", F.length("__bl_entry")).alias("matched_entry"),
    )
    out = feats.join(agg, on=id_col, how="left")
    return out.withColumn("blocked", F.col("matched_entry").isNotNull()).drop(
        "__bl_len"
    )


# Java+RE2-compatible (no backreferences — RE2 has none, so script and
# style get their own patterns), shared verbatim with the DuckDB oracle.
_HTML_BLOCK_RES = (
    r"(?is)<script[^>]*>.*?</script>",
    r"(?is)<style[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
    # truncated pages: an UNTERMINATED script/style/comment opened after
    # all terminated pairs are gone must drop to end-of-text, or raw
    # JS/CSS source leaks into the extracted corpus text
    r"(?is)<script[^>]*>.*$",
    r"(?is)<style[^>]*>.*$",
    r"(?s)<!--.*$",
    r"<[^>]+>",
    r"<[^>]*$",  # unterminated trailing tag (truncated page)
)
#: Entity decode table; ``&amp;`` LAST so ``&amp;lt;`` single-decodes to
#: ``&lt;`` instead of ``<``.
_HTML_ENTITIES = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "),
    ("&amp;", "&"),
)
_QUERY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^?#]*\?([^#]*)"


def strip_html(df: DataFrame, html_col: str, out_col: str = "text") -> DataFrame:
    """Extract visible text from an HTML column — the first step of every
    web-corpus pipeline (C4 extracts text before any quality filter).

    Pure ``Column`` regex algebra, one narrow projection: drop
    ``<script>``/``<style>`` blocks and comments (lazy ``.*?`` spans,
    separate patterns because RE2 has no backreferences), drop remaining
    tags, decode the common entities (``&amp;`` last, so double-encoded
    input single-decodes), collapse whitespace. This is the pragmatic
    regex tier — not an HTML5 tree parser; CDATA and malformed-nesting
    edge cases degrade to extra whitespace, never to dropped visible
    text. No shuffle, no Python, whole-stage codegen throughout.
    """
    t = F.col(html_col)
    for pat in _HTML_BLOCK_RES:
        t = F.regexp_replace(t, pat, " ")
    for ent, ch in _HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return df.withColumn(out_col, t)


def canonicalize_urls(
    df: DataFrame,
    url_col: str,
    out_col: str = "canonical_url",
    *,
    drop_param_prefixes: Sequence[str] = ("utm_",),
) -> DataFrame:
    """Canonicalize URLs for dedup/grouping: two spellings of the same
    page must map to one key before URL-level dedup or per-domain
    aggregation means anything.

    Normalizations (all pure ``Column``, one projection, no Python):
    lowercase scheme and host, strip userinfo / trailing host dot /
    the scheme's default port (``:80`` http, ``:443`` https — explicit
    non-default ports survive), empty path becomes ``/``, query params
    are split, tracking params dropped by prefix (``utm_*`` by
    default), the rest SORTED and rejoined, fragment dropped. Out of
    scope (documented, not silently wrong): percent-decoding, dot-
    segment resolution, IDN — those need per-row codecs; run them
    upstream if the corpus requires. Rows that don't parse as
    ``scheme://authority...`` get NULL, so malformed URLs group
    together visibly instead of polluting canonical keys.
    """
    u = F.trim(F.col(url_col))
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(u, _AUTHORITY_RE, 1))
    # trailing host dot sits BEFORE any :port ("ex.com.:80"), so the
    # strip pattern carries the optional port through via $1
    host = F.regexp_replace(
        F.regexp_replace(auth, _USERINFO_RE, ""),
        r"\.((:[0-9]+)?)$", "$1")
    host = (
        F.when((scheme == "http") & host.endswith(":80"),
               F.substring(host, 1, F.length(host) - 3))
        .when((scheme == "https") & host.endswith(":443"),
              F.substring(host, 1, F.length(host) - 4))
        .otherwise(host)
    )
    path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)

    def keep(p: Column) -> Column:
        cond = p != ""
        for pref in drop_param_prefixes:
            cond = cond & ~F.startswith(p, F.lit(pref))
        return cond

    params = F.array_sort(
        F.filter(F.split(F.regexp_extract(u, _QUERY_RE, 1), "&"), keep))
    qs = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))
    canon = F.when(
        (scheme != "") & (host != ""),
        F.concat(scheme, F.lit("://"), host, path, qs),
    )
    return df.withColumn(out_col, canon)
