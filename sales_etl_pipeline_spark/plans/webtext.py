"""Web/crawl ingestion plans: HTML→text extraction, link-density
boilerplate scoring, URL canonicalization — the passes that sit between
a raw crawl and every other plan in the llm-data family (quality,
dedup, decontamination all assume EXTRACTED text; this module is where
that text comes from).

The driver's documents corpus is plain text, so each plan first builds
a deterministic HTML/URL wrapping of the corpus (pure concat/replace
projections — no randomness, no Python) and then runs the REAL
operator on it; the DuckDB oracle replays construction + extraction
from the same parquet, so the whole pass is exactly checked end to end
(the fixture-grade corner cases — nested tags, entity order, comments
containing tags — are pinned in tests/test_webtext.py on constructed
inputs). The operators themselves (functions/web.py) are pure regexp
chains in the Java∩RE2 syntax subset: byte-linear single scans inside
whole-stage codegen, the only shape that survives a 100-TB crawl pass
(a DOM parse per document is 10–100× the cost and drags every byte
through Python).

Scale shape: every plan here is scan → per-row projection → (at most)
one aggregate-grain shuffle. No joins, no windows, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.web import (
    ANCHOR_TAG,
    HTML_TO_TEXT_CHAIN,
    html_to_text,
    normalize_url,
    registrable_domain,
)
from ..sources.readers import load_table

#: link-density above which a document is classed boilerplate (the
#: jusText/trafilatura-style threshold, applied at doc grain here)
BOILERPLATE_LINK_DENSITY = 0.35


def _html_col():
    """Deterministic HTML wrapping of (doc_id, source, text) — title,
    style + script blocks (content must vanish), a comment, block tags
    around sentences, entities, and a nav link (anchor text must
    survive tag stripping but count toward link density)."""
    return F.concat(
        F.lit('<html><head><title>'),
        F.col("source"),
        F.lit('</title><style>p{margin:0}</style>'
              '<script type="text/javascript">var id='),
        F.col("doc_id").cast("string"),
        F.lit(';</script></head><body><!-- rendered --><h1>'),
        F.col("source"),
        F.lit('</h1><p>'),
        F.replace(F.col("text"), F.lit('. '), F.lit('.</p><p>')),
        F.lit('&nbsp;</p><div><a href="/about?utm_source=feed">'
              'About &amp; FAQ</a></div></body></html>'),
    )


_HTML_SQL = (
    "'<html><head><title>' || source || "
    "'</title><style>p{margin:0}</style>"
    "<script type=\"text/javascript\">var id=' || "
    "CAST(doc_id AS VARCHAR) || "
    "';</script></head><body><!-- rendered --><h1>' || source || "
    "'</h1><p>' || replace(text, '. ', '.</p><p>') || "
    "'&nbsp;</p><div><a href=\"/about?utm_source=feed\">"
    "About &amp; FAQ</a></div></body></html>'"
)


def _chain_sql(expr: str, chain) -> str:
    """The regexp chain as nested DuckDB regexp_replace calls — same
    patterns, 'g' for Java's replace-all default, '$n' group refs
    translated to RE2's '\\n'."""
    for pat, repl in chain:
        p = pat.replace("'", "''")
        r = repl.replace("$", "\\").replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return expr


def html_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WET-extraction pass: HTML in, clean text out, with the size
    accounting a crawl pipeline records (markup overhead ratio)."""
    docs = load_table(spark, sf_dir, "documents")
    html = _html_col()
    txt = html_to_text(html)
    return docs.select(
        "doc_id",
        F.length(html).alias("html_chars"),
        F.length(txt).alias("text_chars"),
        txt.alias("text"),
    )


def boilerplate_link_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-density boilerplate scoring (the jusText signal): share of
    extracted text that lives inside anchor tags. High-density docs are
    navigation/footer shells a quality pipeline drops before dedup."""
    docs = load_table(spark, sf_dir, "documents")
    html = _html_col()
    anchors = F.regexp_extract_all(html, F.lit(ANCHOR_TAG), 1)
    anchor_chars = F.aggregate(
        F.transform(anchors, lambda a: F.length(html_to_text(a))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    text_chars = F.length(html_to_text(html))
    density = anchor_chars.cast("double") / text_chars.cast("double")
    return docs.select(
        "doc_id",
        F.size(anchors).alias("n_links"),
        anchor_chars.alias("anchor_chars"),
        text_chars.alias("text_chars"),
        density.alias("link_density"),
        (density > BOILERPLATE_LINK_DENSITY).alias("is_boilerplate"),
    )


def url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + per-domain rollup: normalize each doc's
    URL (fragment/tracking-param/default-port/duplicate-slash cleanup,
    case-folded scheme+host) and count raw vs canonical forms per
    registrable domain — the frontier-dedup accounting of a crawler."""
    docs = load_table(spark, sf_dir, "documents")
    # two raw variants per doc (mixed case, tracking params, fragment,
    # dup slashes) that must CANONICALIZE to one URL
    base = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.array(
                F.concat(
                    F.lit("https://WWW."),
                    F.col("source"),
                    F.lit("-Corp.COM:443/docs//"),
                    F.col("doc_id").cast("string"),
                    F.lit("/view?utm_source=mix&id="),
                    F.col("doc_id").cast("string"),
                    F.lit("&ref=abc#frag"),
                ),
                F.concat(
                    F.lit("https://www."),
                    F.col("source"),
                    F.lit("-corp.com/docs/"),
                    F.col("doc_id").cast("string"),
                    F.lit("/view?id="),
                    F.col("doc_id").cast("string"),
                ),
            )
        ).alias("url"),
    )
    canon = base.select(
        "doc_id",
        normalize_url(F.col("url")).alias("canonical"),
        registrable_domain(F.col("url")).alias("domain"),
    )
    return canon.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("canonical").alias("n_canonical"),
    )


def crawl_documents(spark: SparkSession, warc_path: str) -> DataFrame:
    """The crawl→corpus adapter: WARC archive(s) → the engine's
    documents shape (doc_id, source, text), ready for every downstream
    plan (quality_filter, exact/near dedup, curation funnel, BPE…).

    Selection: HTTP 200 ``response`` records with a text/html
    content-type. doc_id = md5_long of the WARC record id (stable
    across re-reads, collision odds ~n²/2⁶³); source = the target
    URI's registrable domain (the per-site mixing grain); text =
    ``html_to_text`` of the headerless body. Non-UTF-8 bytes survive
    via Spark's replacement-decoding cast — a crawl always contains
    mojibake and the pipeline must not die on it.

    Not an oracle plan (its input is a WARC directory, not the driver's
    parquet star schema) — composition correctness is pinned in
    tests/test_warc.py against constructed archives."""
    from ..functions.core import md5_long
    from ..sources.warc import read_warc

    recs = read_warc(spark, warc_path)
    html = F.col("body").cast("string")
    return (
        recs.filter(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
            & F.col("http_content_type").startswith("text/html")
            & F.col("body").isNotNull()
        )
        .select(
            md5_long(F.col("record_id")).alias("doc_id"),
            registrable_domain(F.col("target_uri")).alias("source"),
            html_to_text(html).alias("text"),
        )
        .filter(F.length("text") > 0)
    )


LIBRARY_QUERIES = {
    "html_text_extract": html_text_extract,
    "boilerplate_link_density": boilerplate_link_density,
    "url_domain_stats": url_domain_stats,
}

from ..functions.web import URL_NORMALIZE_CHAIN  # noqa: E402

_TEXT_SQL = f"trim({_chain_sql('html', HTML_TO_TEXT_CHAIN)})"
_ANCHOR_SQL = _chain_sql("a", HTML_TO_TEXT_CHAIN)

_URL1_SQL = (
    "'https://WWW.' || source || '-Corp.COM:443/docs//' || "
    "CAST(doc_id AS VARCHAR) || '/view?utm_source=mix&id=' || "
    "CAST(doc_id AS VARCHAR) || '&ref=abc#frag'"
)
_URL2_SQL = (
    "'https://www.' || source || '-corp.com/docs/' || "
    "CAST(doc_id AS VARCHAR) || '/view?id=' || CAST(doc_id AS VARCHAR)"
)

#: normalize_url as SQL: lowercase scheme://host prefix, keep the rest,
#: then the shared chain
_CANON_SQL = _chain_sql(
    "lower(regexp_extract(url, '^([a-zA-Z]+://[^/?#]*)', 1)) || "
    "substring(url, length(regexp_extract(url, "
    "'^([a-zA-Z]+://[^/?#]*)', 1)) + 1)",
    URL_NORMALIZE_CHAIN,
)
_DOMAIN_SQL = (
    "lower(regexp_extract(regexp_extract(url, "
    "'^[a-zA-Z]+://([^/:?#]+)', 1), '([^.]+\\.[^.]+)$', 1))"
)

LIBRARY_ORACLE = {
    "html_text_extract": f"""
        WITH h AS (SELECT doc_id, {_HTML_SQL} AS html FROM documents)
        SELECT doc_id,
               CAST(length(html) AS INTEGER) AS html_chars,
               CAST(length({_TEXT_SQL}) AS INTEGER) AS text_chars,
               {_TEXT_SQL} AS text
        FROM h
    """,
    "boilerplate_link_density": f"""
        WITH h AS (SELECT doc_id, {_HTML_SQL} AS html FROM documents),
        x AS (
            SELECT doc_id,
                   regexp_extract_all(html,
                       '(?si)<a\\b[^>]*>(.*?)</a>', 1) AS anchors,
                   CAST(length({_TEXT_SQL}) AS INTEGER) AS text_chars
            FROM h
        ),
        y AS (
            SELECT doc_id, text_chars,
                   CAST(len(anchors) AS INTEGER) AS n_links,
                   CAST(coalesce(list_sum(list_transform(anchors,
                       a -> length(trim({_ANCHOR_SQL})))), 0) AS INTEGER)
                       AS anchor_chars
            FROM x
        )
        SELECT doc_id, n_links, anchor_chars, text_chars,
               CAST(anchor_chars AS DOUBLE) / CAST(text_chars AS DOUBLE)
                   AS link_density,
               CAST(anchor_chars AS DOUBLE) / CAST(text_chars AS DOUBLE)
                   > {BOILERPLATE_LINK_DENSITY} AS is_boilerplate
        FROM y
    """,
    "url_domain_stats": f"""
        WITH u AS (
            SELECT doc_id, unnest([{_URL1_SQL}, {_URL2_SQL}]) AS url
            FROM documents
        ),
        c AS (
            SELECT doc_id, {_CANON_SQL} AS canonical, {_DOMAIN_SQL} AS domain
            FROM u
        )
        SELECT domain,
               COUNT(*) AS n_urls,
               COUNT(DISTINCT canonical) AS n_canonical
        FROM c
        GROUP BY 1
    """,
}
