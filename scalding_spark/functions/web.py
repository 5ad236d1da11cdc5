"""URL/domain utilities for web-corpus curation.

Production pretraining pipelines filter by URL before anything touches the
text: domain blocklists (UT1-style categories), per-domain caps, and
domain-level quality priors all key on a NORMALIZED registrable domain.
Everything here is expression-only (regex + string ops on the JVM) except
the blocklist itself, which rides a broadcast join — the 100 TB-correct
shape for a list of at most a few million domains.

No reference analog (the reference predates web-corpus curation); shapes
follow this engine's sampling/dedup conventions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# scheme://[userinfo@]HOST[:port][/path...] — capture group 1 is the host.
# Deliberately RE2/Java-portable: no backrefs, no lookaround, no \b.
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+).*$"

# "registrable domain" heuristic: last two labels, or last three when the
# second-level label is a well-known public-suffix second level (co.uk,
# com.au, ...) — covers the bulk cheaply; host-specific blocklist entries
# go through ``filter_blocklist(match='host')`` instead.
_PSL2 = ("co", "com", "net", "org", "gov", "ac", "edu")


def host_of(url: Column) -> Column:
    """Lowercased host part of a URL (null when ``url`` has no scheme://
    host shape). Strips userinfo and port."""
    h = F.regexp_extract(url, _HOST_RE, 1)
    # strip the FQDN trailing dot ("example.com." == "example.com")
    h = F.regexp_replace(h, r"\.$", "")
    return F.when(h != "", F.lower(h))


def registrable_domain(url_or_host: Column, is_host: bool = False) -> Column:
    """eTLD+1-style registrable domain: ``a.b.example.co.uk`` →
    ``example.co.uk``, ``sub.example.com`` → ``example.com``. IPs and
    single-label hosts pass through unchanged."""
    host = url_or_host if is_host else host_of(url_or_host)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    second_level = F.element_at(parts, -2)
    take = F.when((n >= 3) & second_level.isin(*_PSL2), 3).otherwise(2)
    is_ip = host.rlike(r"^[0-9.]+$")  # IPv4: no label structure to trim
    return F.when(is_ip | (n <= 2), host).otherwise(
        F.array_join(F.slice(parts, n - take + 1, take), "."))


def filter_blocklist(df: DataFrame, url_col: str, blocklist: DataFrame,
                     domain_col: str = "domain",
                     keep_unparseable: bool = False,
                     match: str = "domain") -> DataFrame:
    """Drop rows whose URL's domain appears in ``blocklist`` (a one-column
    domain table). The blocklist side is explicitly broadcast — domain
    lists are millions of rows at most, so the corpus never shuffles for
    this filter; the anti-join folds into the scan.

    ``match``: ``'domain'`` (default) compares the PSL-2-heuristic
    registrable domain — list entries more specific than eTLD+1 will
    never match; ``'host'`` compares the EXACT full host, for UT1-style
    lists carrying host-level entries (e.g. ``spam.users.example.com``).
    Run both passes with the list split by entry depth to mix the two.

    ``keep_unparseable``: rows whose URL yields no host (null domain)
    are dropped by default (can't be vetted); True passes them through.
    """
    if match not in ("domain", "host"):
        raise ValueError(f"match must be 'domain' or 'host', got {match!r}")
    dom = (registrable_domain(F.col(url_col)) if match == "domain"
           else host_of(F.col(url_col)))
    tagged = df.withColumn("__dom", dom)
    bl = F.broadcast(
        blocklist.select(F.lower(F.col(domain_col)).alias("__dom")).distinct())
    kept = tagged.join(bl, "__dom", "left_anti")
    if not keep_unparseable:
        kept = kept.where(F.col("__dom").isNotNull())
    return kept.drop("__dom")


# Query-string parameters that identify a click, not a resource: the
# default strip set for URL dedup keys (utm_* campaign tags, ad-click
# ids, social share tokens). Each entry is an RE2-portable key pattern
# matched against the full ``key=`` prefix. Bare ``ref`` is deliberately
# NOT in the set (ADVICE r06): on common origins it selects a resource
# (GitHub ``?ref=<branch>``, API pagination refs), so stripping it would
# silently collapse distinct resources under URL-exact dedup; the
# Twitter-specific ``ref_src`` share token stays.
DEFAULT_TRACKING_PARAMS = ("utm_[a-zA-Z0-9_]*", "gclid", "fbclid",
                           "msclkid", "mc_eid", "igshid", "spm", "ref_src")


def canonicalize_url(url: Column,
                     strip_params: tuple = DEFAULT_TRACKING_PARAMS) -> Column:
    """Canonical URL for dedup/fetch keys. Rules (each a single
    engine-portable expression; the oracle mirrors them verbatim):

    - drop the ``#fragment``;
    - lowercase the ``scheme://authority`` (path/query case preserved —
      paths are case-sensitive on most origins);
    - strip explicit default ports (``http://h:80`` → ``http://h``,
      ``https://h:443`` → ``https://h``);
    - drop tracking query parameters (``strip_params``, default
      :data:`DEFAULT_TRACKING_PARAMS`; tune per corpus) while PRESERVING
      the order of the remaining ones (reordering would conflate
      ``?a=1&b=2`` pages whose servers care about order);
    - drop an emptied query string entirely;
    - normalize a bare root path: ``http://h/`` → ``http://h``.

    NULL when the value has no ``scheme://authority`` shape (same
    unparseable contract as :func:`host_of`). 100 TB shape: map-only —
    canonicalization happens in the scan stage, and the canonical string
    is the natural key for exact URL dedup (hash-groupBy) upstream of
    any text processing.
    """
    tracking_re = "^(" + "|".join(strip_params) + ")=" if strip_params else None
    u = F.regexp_replace(url, "#.*$", "")
    base = F.regexp_extract(u, r"^([^?]*)", 1)
    query = F.regexp_extract(u, r"^[^?]*\?(.*)$", 1)
    auth = F.regexp_extract(base, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1)
    path = F.regexp_extract(base, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(.*)$", 1)
    a = F.lower(auth)
    a = F.regexp_replace(a, r"^(http://[^/:]+):80$", "$1")
    a = F.regexp_replace(a, r"^(https://[^/:]+):443$", "$1")
    p = F.when(path == "/", F.lit("")).otherwise(path)
    keep = F.filter(F.split(query, "&"),
                    lambda kv: ((kv != "") & ~kv.rlike(tracking_re))
                    if tracking_re else (kv != ""))
    q = F.array_join(keep, "&")
    full = F.concat(a, p,
                    F.when(q == "", F.lit(""))
                     .otherwise(F.concat(F.lit("?"), q)))
    return F.when(auth != "", full)
