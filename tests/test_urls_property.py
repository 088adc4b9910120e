"""Property-based canonicalizer tests (hypothesis): idempotency and
output invariants over adversarial URL soup. Pure-Python (_canon_one) —
the pandas UDF is the same function batched (test_urls proves that)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from crawler_spark.functions.urls import MAX_LEN, _canon_one

# URL-ish soup: schemes, hosts, paths, queries, fragments, junk.
scheme = st.sampled_from(
    ["http", "https", "HTTP", "HTTPS", "ftp", "javascript", "data", ""])
host = st.one_of(
    st.from_regex(r"[A-Za-z0-9-]{1,20}(\.[A-Za-z0-9-]{1,10}){0,3}",
                  fullmatch=True),
    st.sampled_from(["127.0.0.1", "10.0.0.1", "8.8.8.8", "192.168.0.9",
                     "169.254.3.4", "example.COM"]),
)
path = st.from_regex(r"(/[A-Za-z0-9._~%-]{0,12}){0,5}/?", fullmatch=True)
query = st.one_of(st.just(""), st.from_regex(r"\?[A-Za-z0-9=&%]{0,20}",
                                             fullmatch=True))
frag = st.one_of(st.just(""), st.from_regex(r"#[A-Za-z0-9]{0,10}",
                                            fullmatch=True))
port = st.one_of(st.just(""), st.sampled_from([":80", ":443", ":8080"]))


@st.composite
def urls(draw):
    return (f"{draw(scheme)}://{draw(host)}{draw(port)}"
            f"{draw(path)}{draw(query)}{draw(frag)}")


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent(u):
    once = _canon_one(None, u)
    if once is not None:
        assert _canon_one(None, once) == once


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonical_output_invariants(u):
    c = _canon_one(None, u)
    if c is None:
        return
    assert c.startswith(("http://", "https://"))
    assert "#" not in c
    assert len(c) <= MAX_LEN
    assert ".." not in c
    sch, rest = c.split("://", 1)
    hostpart = rest.split("/", 1)[0].split("?", 1)[0]
    assert sch == sch.lower() and hostpart == hostpart.lower()
    # only the scheme's own default port is stripped
    default = {"http": ":80", "https": ":443"}[sch]
    assert not hostpart.endswith(default)
    # no private/loopback IP literals survive
    assert hostpart.split(":")[0] not in (
        "127.0.0.1", "10.0.0.1", "192.168.0.9", "169.254.3.4")


@given(st.text(max_size=50))
@settings(max_examples=200, deadline=None)
def test_canonicalize_never_raises_on_garbage(s):
    r = _canon_one("https://base.example/dir/", s)
    assert r is None or r.startswith(("http://", "https://"))
