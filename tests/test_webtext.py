"""Web-text extraction behavior on constructed fixtures
(functions/web.py + plans/webtext.py): entity decode order, comment and
script/style content removal, whitespace discipline, link-density
boilerplate classification, and URL canonicalization corner cases. The
plans' end-to-end exactness vs DuckDB is covered by
tests/test_library_parity.py; these pin the operator semantics on
inputs the synthetic corpus cannot produce."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sales_etl_pipeline_spark.functions import web  # noqa: E402


def _one(spark, expr, s):
    return (
        spark.createDataFrame([(s,)], "x string")
        .select(expr(F.col("x")).alias("y"))
        .first()
        .y
    )


def test_html_to_text_fixtures(spark):
    cases = {
        # script/style/comment CONTENT vanishes, not just the tags
        '<p>keep</p><script a="b">var x = "<drop>";</script>': "keep",
        "<style>p{color:red}</style>text": "text",
        "<!-- a <p>hidden</p> comment -->shown": "shown",
        # tags spanning attributes and newlines
        '<a\nhref="x"\nclass="y">link text</a>': "link text",
        # entity decode order: &amp;lt; is the LITERAL string "&lt;"
        "a &amp;lt; b": "a &lt; b",
        "x &lt; y &gt; z &amp; w": "x < y > z & w",
        "say &quot;hi&quot; it&#39;s fine": 'say "hi" it\'s fine',
        "a&nbsp;b": "a b",
        # whitespace squeeze + trim across removed blocks
        "  <div> a </div>\n\n<div> b </div> ": "a b",
        # unclosed / stray tags still stripped
        "<p>one<br>two": "one two",
        # no markup at all: identity modulo trim
        "plain text.": "plain text.",
    }
    for html, want in cases.items():
        got = _one(spark, web.html_to_text, html)
        assert got == want, (html, got, want)


def test_html_to_text_case_insensitive_blocks(spark):
    got = _one(
        spark,
        web.html_to_text,
        "<SCRIPT>var x;</SCRIPT><STYLE>a{}</STYLE><P>ok</P>",
    )
    assert got == "ok"


def test_normalize_url_fixtures(spark):
    cases = {
        # tracking params out, real params kept, fragment out
        "https://a-b.com/p?utm_source=x&q=1&ref=z#frag": "https://a-b.com/p?q=1",
        # ALL params tracking -> bare path
        "https://a-b.com/p?utm_campaign=x": "https://a-b.com/p",
        # scheme+host case-folded, PATH case preserved
        "HTTPS://WWW.Site-One.COM/CaseSensitive/Path": (
            "https://www.site-one.com/CaseSensitive/Path"
        ),
        # default ports dropped, non-default kept
        "https://a-b.com:443/x": "https://a-b.com/x",
        "http://a-b.com:80/x": "http://a-b.com/x",
        "http://a-b.com:8080/x": "http://a-b.com:8080/x",
        # duplicate slashes collapsed in the path, not in ://
        "https://a-b.com/docs//v1///x": "https://a-b.com/docs/v1/x",
    }
    for url, want in cases.items():
        got = _one(spark, web.normalize_url, url)
        assert got == want, (url, got, want)


def test_registrable_domain(spark):
    cases = {
        "https://www.deep.sub.example.com/x": "example.com",
        "http://example.org": "example.org",
        "https://EXAMPLE.ORG/path": "example.org",
    }
    for url, want in cases.items():
        got = _one(spark, web.registrable_domain, url)
        assert got == want, (url, got, want)


def test_link_density_classifies_nav_vs_article(spark):
    """A nav shell (all anchor text) flags boilerplate; an article with
    one link does not — the jusText-style separation the plan's
    threshold must reproduce."""
    from sales_etl_pipeline_spark.plans.webtext import (
        BOILERPLATE_LINK_DENSITY,
    )

    nav = '<div><a href="/a">Home</a> <a href="/b">Products</a> <a href="/c">Contact us</a></div>'
    art = (
        "<p>" + "A long paragraph of real prose. " * 8
        + '</p><a href="/src">source</a>'
    )
    df = spark.createDataFrame(
        [(1, nav), (2, art)], "doc_id long, html string"
    )
    anchors = F.regexp_extract_all(F.col("html"), F.lit(web.ANCHOR_TAG), 1)
    anchor_chars = F.aggregate(
        F.transform(anchors, lambda a: F.length(web.html_to_text(a))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    text_chars = F.length(web.html_to_text(F.col("html")))
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            (
                anchor_chars.cast("double") / text_chars.cast("double")
            ).alias("density"),
        ).collect()
    }
    assert rows[1].density > BOILERPLATE_LINK_DENSITY
    assert rows[2].density < BOILERPLATE_LINK_DENSITY


def test_plan_smoke_counts(spark):
    """Plan-level sanity at sf0.001: extraction strictly shrinks the
    wrapped HTML, every doc keeps text, and the URL rollup sees exactly
    2 raw / 1 canonical URL per doc per domain."""
    from sales_etl_pipeline_spark.plans import webtext

    SF = "/root/testdata/sf0.001"
    ext = webtext.html_text_extract(spark, SF)
    assert ext.filter(F.col("text_chars") >= F.col("html_chars")).count() == 0
    assert ext.filter(F.length("text") == 0).count() == 0
    stats = webtext.url_domain_stats(spark, SF).collect()
    assert all(r.n_urls == 2 * r.n_canonical for r in stats)
