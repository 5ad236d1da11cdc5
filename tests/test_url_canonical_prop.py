"""Property tests for web.canonicalize_url.

Two oracles, neither a regex mirror of the implementation:

1. *By construction*: URLs are assembled from known components
   (scheme/host/port/path/query-segments/fragment), so the expected
   canonical form follows from the documented rules directly —
   no re-parsing of the assembled string.
2. *Contract properties on raw strings*: canonicalization is idempotent,
   and NULL exactly when the input has no ``scheme://authority`` shape.
"""

import re
import string

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from scalding_spark.functions import web

# The spec's strip set (documented in web.canonicalize_url): key= prefix,
# case-sensitive. Used ONLY to compute the expected survivors from the
# generated segment list.
_TRACKING = re.compile(
    r"^(utm_[a-zA-Z0-9_]*|gclid|fbclid|msclkid|mc_eid|igshid|spm|ref_src)=")

_SCHEMES = ["http", "https", "HTTP", "hTtPs", "ftp", "ws+s", "x-proto"]
_HOSTS = ["example.com", "WWW.Example.COM", "a.b", "Ex-ample.ORG", "127.0.0.1",
          "xn--bcher-kva.ch"]
_PORTS = [None, 80, 443, 8080, 8443]
_PATHS = ["", "/", "/Page", "/a/B/c", "/CaseSENSITIVE", "/p%20q", "/a=b"]
# Keys that must be dropped, kept, or pin the prefix/case boundaries:
# "referer" shares the "ref" prefix but is NOT in the strip set; "UTM_X"
# differs only by case (query case is preserved, match is case-sensitive);
# "utm_" is the zero-suffix boundary of utm_[a-zA-Z0-9_]*.
_KEYS = ["id", "q", "page", "referer", "UTM_X", "Ref",
         "utm_source", "utm_", "gclid", "fbclid", "ref", "ref_src", "spm"]
_VALUES = ["", "1", "x-y_z", "a=b", "~%7E", "Z9"]

_segment = st.one_of(
    st.just(""),                                   # "&&" empty segment
    st.sampled_from(_KEYS),                        # bare key, no '='
    st.tuples(st.sampled_from(_KEYS), st.sampled_from(_VALUES))
      .map(lambda kv: kv[0] + "=" + kv[1]),
)

_url_spec = st.tuples(
    st.sampled_from(_SCHEMES),
    st.sampled_from(_HOSTS),
    st.sampled_from(_PORTS),
    st.sampled_from(_PATHS),
    st.one_of(st.none(), st.lists(_segment, max_size=5)),  # None = no '?'
    st.one_of(st.none(), st.sampled_from(["s", "frag?x&y=1", "a#b", ""])),
)


def _assemble(spec):
    scheme, host, port, path, segments, fragment = spec
    url = scheme + "://" + host
    if port is not None:
        url += f":{port}"
    url += path
    if segments is not None:
        url += "?" + "&".join(segments)
    if fragment is not None:
        url += "#" + fragment
    return url


def _expected(spec):
    scheme, host, port, path, segments, fragment = spec
    auth = scheme.lower() + "://" + host.lower()
    if port is not None and (scheme.lower(), port) not in {("http", 80),
                                                           ("https", 443)}:
        auth += f":{port}"
    p = "" if path in ("", "/") else path
    kept = [s for s in (segments or []) if s != "" and not _TRACKING.match(s)]
    q = "&".join(kept)
    return auth + p + (("?" + q) if q else "")


def _canon_all(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in
            df.select(web.canonicalize_url(F.col("url")).alias("c"))
              .collect()]


@settings(max_examples=30, deadline=None)
@given(specs=st.lists(_url_spec, min_size=1, max_size=8))
def test_canonical_matches_construction(spark, specs):
    urls = [_assemble(s) for s in specs]
    got = _canon_all(spark, urls)
    want = [_expected(s) for s in specs]
    assert got == want, list(zip(urls, got, want))


@settings(max_examples=30, deadline=None)
@given(specs=st.lists(_url_spec, min_size=1, max_size=8))
def test_canonical_is_idempotent_and_a_fixed_point(spark, specs):
    urls = [_assemble(s) for s in specs]
    once = _canon_all(spark, urls)
    twice = _canon_all(spark, once)
    assert twice == once, list(zip(urls, once, twice))


# Raw adversarial strings: printable ASCII minus newline (the operator's
# contract is over single-line URL fields; multi-line garbage is a schema
# problem upstream, not a canonicalization case).
_RAW = st.text(
    alphabet=st.sampled_from([c for c in string.printable if c not in "\n\r\x0b\x0c\t"]),
    max_size=40)


@settings(max_examples=25, deadline=None)
@given(raws=st.lists(_RAW, min_size=1, max_size=10))
def test_raw_strings_null_contract_and_idempotence(spark, raws):
    got = _canon_all(spark, raws)
    for u, g in zip(raws, got):
        base = re.sub(r"#.*$", "", u).split("?", 1)[0]
        parseable = re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", base) is not None
        assert (g is not None) == parseable, (u, g)
    survivors = [g for g in got if g is not None]
    if survivors:
        assert _canon_all(spark, survivors) == survivors
