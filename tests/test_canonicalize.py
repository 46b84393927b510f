import pandas as pd
import pytest

from simplecrawler_spark.functions.canonicalize import (
    canonicalize_one,
    canonicalize_series,
    split_host,
)

# FIXTURES.md §6-style handcrafted cases: urijs absoluteTo().normalize()
CASES = [
    # (raw, base, expected)
    ("http://Example.COM/a", None, "http://example.com/a"),
    ("HTTP://EXAMPLE.com:80/a", None, "http://example.com/a"),
    ("https://example.com:443/a", None, "https://example.com/a"),
    ("https://example.com:8443/a", None, "https://example.com:8443/a"),
    ("http://example.com", None, "http://example.com/"),
    ("http://example.com/a/../b", None, "http://example.com/b"),
    ("http://example.com/a/./b", None, "http://example.com/a/b"),
    ("http://example.com/../../x", None, "http://example.com/x"),
    ("http://example.com/a/b/..", None, "http://example.com/a/"),
    ("http://example.com/a#frag", None, "http://example.com/a"),
    ("http://example.com/%7Euser", None, "http://example.com/~user"),
    ("http://example.com/%41%2f", None, "http://example.com/A%2F"),
    ("b/c", "http://example.com/a/", "http://example.com/a/b/c"),
    ("../c", "http://example.com/a/b/", "http://example.com/a/c"),
    ("/abs", "http://example.com/a/b", "http://example.com/abs"),
    ("//other.com/x", "https://example.com/", "https://other.com/x"),
    ("?q=1", "http://example.com/a", "http://example.com/a?q=1"),
    ("#only-frag", "http://example.com/a", "http://example.com/a"),
    ("http://example.com/a?b=2&a=1", None, "http://example.com/a?b=2&a=1"),
    ("", None, None),
    ("not a url", None, None),
    ("http://", None, None),
]


@pytest.mark.parametrize("raw,base,expected", CASES)
def test_canonicalize_cases(raw, base, expected):
    assert canonicalize_one(raw, base) == expected


def test_options():
    assert canonicalize_one("http://e.com/a?b=2&a=1", None, sort_query_parameters=True) == \
        "http://e.com/a?a=1&b=2"
    assert canonicalize_one("http://e.com/a?b=2&a=1", None, strip_querystring=True) == \
        "http://e.com/a"
    assert canonicalize_one("http://www.e.com/a", None, strip_www_domain=True) == \
        "http://e.com/a"


def test_idempotent():
    for raw, base, expected in CASES:
        if expected is not None:
            assert canonicalize_one(expected, None) == expected


def test_series_fast_and_slow_paths_agree():
    raws = [c[0] for c in CASES] + [
        "http://fast.example/p/1", "http://fast.example/p/2/x",
        "/p/5", "/", "/a//b", "//other.example/p/2", "/p/./6", "/p/x?q=1",
        # vectorized fast-path shapes (fragment strip, protocol-relative,
        # plain relative with/without dot segments)
        "http://fast.example/p/3#frag", "/p/7#x", "//other.example/p/9#y",
        "b/c", "../c", "./c", "../../c", "..", ".", "p/..", "b//c",
        "../p/./5#frag2", "x.html", "a/.hidden/b",
        "rel/with?query", "", "   ", "//UPPER.example/p/1",
    ]
    bases = [c[1] for c in CASES] + [
        None, None,
        "http://h.example/x/y", "http://h.example/x", "http://h.example/",
        "https://h.example/q", "http://h.example/x", "http://h.example/x",
        None, "http://h.example/x", "https://h.example/q/r",
        "http://h.example/a/b", "http://h.example/a/b/", "http://h.example/a/b",
        "http://h.example/a/", "http://h.example/a/b/c", "http://h.example/a/b",
        "http://h.example/a/", "http://h.example/a/b",
        "http://h.example/p/3", "http://h.example/a/", "http://h.example/",
        "http://h.example/a?q=/z", "http://h.example/a", "http://h.example/a",
        "http://h.example/x",
    ]
    got = canonicalize_series(pd.Series(raws, dtype=object), pd.Series(bases, dtype=object))
    want = [canonicalize_one(r, b) for r, b in zip(raws, bases)]
    assert list(got) == want


def test_hypothesis_series_equals_scalar_relative_refs():
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings, strategies as st

    bases = st.sampled_from([
        "http://h.example/", "http://h.example/a/b", "http://h.example/a/b/",
        "https://h.example/x/y/z", "http://h.example/a?q=1", None,
    ])

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet="abZ09./_-,;=&#?%:~ ", max_size=24), bases)
    def prop(ref, base):
        got = canonicalize_series(pd.Series([ref], dtype=object),
                                  pd.Series([base], dtype=object))
        want = canonicalize_one(ref, base)
        assert got.iat[0] == want, (ref, base, got.iat[0], want)

    prop()


def test_split_host():
    assert split_host("http://a.b.c:8080/x/y") == "a.b.c:8080"
    assert split_host("http://a.b.c/") == "a.b.c"


def test_hypothesis_idempotence():
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet="abcXYZ019/.%~?&=#:", max_size=40))
    def prop(path):
        url = canonicalize_one("http://ex.com/" + path, None)
        if url is not None:
            assert canonicalize_one(url, None) == url

    prop()


def test_sentinel_codepoint_survives_resolution():
    # a base/ref genuinely containing U+E000 must not be corrupted by the
    # ';'-shielding sentinel; shielding is skipped when the codepoint occurs
    from simplecrawler_spark.functions.canonicalize import canonicalize_one

    u = canonicalize_one("xy", "http://a.com/p/")
    assert u == "http://a.com/p/xy"
    # and ';' paths still resolve per RFC 3986 when no sentinel collision
    assert canonicalize_one("b;v=1", "http://a.com/p/") == "http://a.com/p/b;v=1"
    # mixed case: input has BOTH ';' and U+E000 — plain urljoin path; the
    # ';' may fall to urlparse's legacy params handling but nothing crashes
    assert canonicalize_one("c;x", "http://a.com/p/") is not None
