"""Property-based canonicalize_url pin (r16): the JVM expression
canonicalizer must agree with an INDEPENDENT pure-Python model of the
documented rules on generated URL soup — structure-aware generation
covers scheme/host case, www, default and explicit ports, trailing
slashes, tracking params in any position, duplicate keys, empty parts,
and fragments; idempotence holds on every canonical output.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ngff_zarr_spark.functions.web import (
    TRACKING_EXACT,
    TRACKING_PREFIXES,
    canonicalize_url,
)


def model_canonicalize(url: str) -> str | None:
    """Independent implementation of the documented rules (stdlib-only,
    no shared code with the engine's column expression)."""
    import re

    m = re.match(
        r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#:]+)(?::([0-9]+))?([^?#]*)(?:\?([^#]*))?(?:#.*)?$",
        url,
    )
    if not m:
        return None
    scheme = m.group(1).lower()
    host = m.group(2).lower()
    if host.startswith("www."):
        host = host[4:]
    port = m.group(3) or ""
    if (scheme == "http" and port == "80") or (scheme == "https" and port == "443"):
        port = ""
    path = m.group(4) or ""
    if path == "":
        path = "/"
    elif len(path) > 1 and path.endswith("/"):
        path = path[:-1]
    q = m.group(5) or ""

    def tracked(p: str) -> bool:
        low = p.lower()
        return any(low.startswith(pre) for pre in TRACKING_PREFIXES) or any(
            low.startswith(name + "=") for name in TRACKING_EXACT
        )

    parts = sorted(p for p in q.split("&") if p != "" and not tracked(p))
    out = scheme + "://" + host + ((":" + port) if port else "") + path
    if parts:
        out += "?" + "&".join(parts)
    return out


_scheme = st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp", "Ftp"])
_label = st.text(alphabet="abcdefgXYZ09-", min_size=1, max_size=6)
_host = st.builds(
    lambda www, a, b: ("WWW." if www == 2 else "www." if www == 1 else "") + a + "." + b,
    st.integers(0, 2), _label, _label,
)
_port = st.sampled_from(["", ":80", ":443", ":8080"])
_seg = st.text(alphabet="abcDEF25_-", min_size=1, max_size=5)
_path = st.builds(
    lambda segs, trail: ("/" + "/".join(segs) + trail) if segs else "",
    st.lists(_seg, max_size=3), st.sampled_from(["", "/"]),
)
_param = st.one_of(
    st.builds(lambda k, v: f"{k}={v}", st.sampled_from(["a", "b", "B", "z2"]), _seg),
    st.sampled_from(
        ["utm_source=x", "UTM_CAMPAIGN=y", "gclid=1", "fbclid=2", "GCLID=3", ""]
    ),
)
_query = st.builds(
    lambda ps, q: ("?" + "&".join(ps)) if q else "",
    st.lists(_param, max_size=4), st.booleans(),
)
_frag = st.sampled_from(["", "#sec", "#"])
_url = st.builds(
    lambda s, h, p, pa, q, f: f"{s}://{h}{p}{pa}{q}{f}",
    _scheme, _host, _port, _path, _query, _frag,
)


@settings(max_examples=30, deadline=None)
@given(st.lists(_url, min_size=1, max_size=40, unique=True))
def test_matches_independent_model_and_idempotent(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    got = {
        r["u"]: r["c"]
        for r in df.select("u", canonicalize_url(F.col("u")).alias("c")).collect()
    }
    for u in urls:
        assert got[u] == model_canonicalize(u), u
    # idempotence: canonicalizing a canonical value is a no-op
    canon = [c for c in got.values() if c is not None]
    if canon:
        df2 = spark.createDataFrame([(c,) for c in set(canon)], "u string")
        again = {
            r["u"]: r["c"]
            for r in df2.select("u", canonicalize_url(F.col("u")).alias("c")).collect()
        }
        for c, c2 in again.items():
            assert c2 == c, c


def test_garbage_quarantines(spark):
    bad = ["", "not a url", "://x", "http//x", "x y", "https://"]
    df = spark.createDataFrame([(u,) for u in bad], "u string")
    vals = [r["c"] for r in df.select(canonicalize_url(F.col("u")).alias("c")).collect()]
    assert vals == [None] * len(bad)
