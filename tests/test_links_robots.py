import pandas as pd

from simplecrawler_spark.functions.links import (
    clean_expand_series,
    discover_resources,
    _clean_raw,
)
from simplecrawler_spark.functions.robots import (
    parse_robots_txt,
    robots_allows,
    robots_allows_batch,
)


def test_discover_resources_default_regexes():
    body = """<html><a href="/a">x</a><img src='/i.png'>
    <style>.x{background:url("/bg.css")}</style>
    <!-- <a href="/hidden">no</a> -->
    plain http://other.example/z link</html>"""
    found = discover_resources(body)
    joined = " ".join(found)
    assert "/a" in joined and "/i.png" in joined and "/bg.css" in joined
    assert "http://other.example/z" in joined
    # comments stripped when parse_html_comments=False
    found2 = " ".join(discover_resources(body, parse_html_comments=False))
    assert "/hidden" not in found2
    assert "/hidden" in joined  # default: comments parsed (reference default)


def test_clean_raw_drops_junk():
    assert _clean_raw("mailto:a@b.c") is None
    assert _clean_raw("javascript:void(0)") is None
    assert _clean_raw("#top") is None
    assert _clean_raw("") is None
    assert _clean_raw(' href="/x" ') == "/x"
    assert _clean_raw("url(/bg.png)") == "/bg.png"
    assert _clean_raw("/a?x=1&amp;y=2") == "/a?x=1&y=2"


def test_clean_expand_first_wins_dedupe_and_resolution():
    links = pd.Series([
        ["/p/1", "p/2#frag", "/p/1", "//h2.example/p/3", "mailto:x@y", "../p/./4"],
        [],
        None,
    ])
    base = pd.Series([
        "http://h1.example/a/b",
        "http://h1.example/",
        "http://h1.example/",
    ])
    out = clean_expand_series(links, base)
    assert out[0] == [
        "http://h1.example/p/1",
        "http://h1.example/a/p/2",
        "http://h2.example/p/3",
        "http://h1.example/p/4",
    ]
    assert out[1] == [] and out[2] == []


def test_robots_longest_match_wins():
    assert robots_allows("/private/x", ["/private/"], []) is False
    assert robots_allows("/private/p/0", ["/private/"], ["/private/p/0"]) is True
    assert robots_allows("/public", ["/private/"], []) is True
    assert robots_allows("/x", ["/"], []) is False
    assert robots_allows("/a/b.png", ["/*.png$"], []) is False
    assert robots_allows("/a/b.pngx", ["/*.png$"], []) is True
    # allow wins specificity ties
    assert robots_allows("/dir/page", ["/dir/"], ["/dir/"]) is True


def test_robots_batch_matches_scalar():
    paths = pd.Series(["/private/x", "/ok", "/private/p/0", "/y"])
    hosts = pd.Series(["a", "a", "a", "b"])
    dis = pd.Series([["/private/"]] * 3 + [[]])
    alw = pd.Series([["/private/p/0"]] * 3 + [[]])
    got = list(robots_allows_batch(paths, hosts, dis, alw))
    assert got == [False, True, True, True]


def test_parse_robots_txt():
    body = """
    # comment
    User-agent: *
    Disallow: /private/
    Allow: /private/ok
    Crawl-delay: 2.5

    User-agent: special
    Disallow: /
    """
    d, a, cd = parse_robots_txt(body, "mybot/1.0")
    assert d == ["/private/"] and a == ["/private/ok"] and cd == 2.5
    d2, _, _ = parse_robots_txt(body, "the-special bot")
    assert d2 == ["/"]


def test_vectorized_cleanup_matches_scalar():
    import numpy as np
    from simplecrawler_spark.functions.links import _clean_raw_series

    rng = np.random.default_rng(9)
    pieces = ["/p/1", " href=\"/x\" ", "url(/bg.png)", "mailto:a@b", "#top", "",
              "javascript:void(0)", "/a?x=1&amp;y=2", "  '/q/2'  ", "//h/p", "B&amp;W",
              "DATA:text/plain,x", "tel:123", "p/rel", "../up", "/end)"]
    raws = [str(rng.choice(pieces)) for _ in range(500)] + [None]
    got = list(_clean_raw_series(pd.Series(raws, dtype=object)))
    want = [_clean_raw(r) if r is not None else None for r in raws]
    assert got == want
