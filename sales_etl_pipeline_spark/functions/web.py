"""Web-text extraction expressions: HTML → clean text and URL
normalization as PURE COLUMN EXPRESSIONS (regexp chains inside
whole-stage codegen — no UDF, no Python in the hot path).

Why expressions and not a parser: at crawl scale (the CommonCrawl-shaped
regime a training-data pipeline ingests), HTML-to-text is a linear scan
over every byte of the corpus — the single hottest pass in the whole
pipeline. A DOM parse per document (lxml/bs4-style) costs 10–100× the
regex chain and needs Python workers; the chain below is the standard
WET-extractor compromise: tag-structure-unaware, but byte-linear,
JVM-side, and good enough to feed the downstream quality/dedup filters
that clean up its mistakes. Documents that need REAL structure (tables,
code blocks) go through the mapInPandas path instead.

Every pattern is written in the common subset of Java regex (Spark) and
RE2 (DuckDB): inline ``(?si)`` flags, non-greedy ``.*?``, no lookarounds,
no backreferences — so the same chain replays exactly in the DuckDB
oracles (plans/webtext.py builds them from the same table).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: (pattern, replacement) chain applied IN ORDER by html_to_text.
#: Order matters twice: script/style/comment blocks go before generic
#: tag stripping (their CONTENT must vanish, not just their tags), and
#: ``&amp;`` decodes LAST (decoding it earlier would double-decode
#: ``&amp;lt;`` into ``<`` — the classic entity-order bug).
HTML_TO_TEXT_CHAIN: tuple[tuple[str, str], ...] = (
    (r"(?s)<!--.*?-->", " "),                       # comments
    (r"(?si)<script\b[^>]*>.*?</script>", " "),     # script incl. content
    (r"(?si)<style\b[^>]*>.*?</style>", " "),       # style incl. content
    (r"(?si)<noscript\b[^>]*>.*?</noscript>", " "),
    (r"(?s)<[^>]*>", " "),                          # every remaining tag
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", '"'),
    (r"&#39;", "'"),
    (r"&amp;", "&"),                                # MUST be last entity
    (r"\s+", " "),                                  # squeeze whitespace
)


def html_to_text(col: Column) -> Column:
    """Clean text from an HTML column via the shared regexp chain,
    trimmed. Linear, codegen'd, zero Python."""
    out = col
    for pat, repl in HTML_TO_TEXT_CHAIN:
        out = F.regexp_replace(out, pat, repl)
    return F.trim(out)


#: anchor-tag patterns for link-density boilerplate scoring
ANCHOR_TAG = r"(?si)<a\b[^>]*>(.*?)</a>"

#: URL-normalization chain: lowercase scheme+host, drop default ports,
#: strip fragments and tracking params, collapse duplicate slashes in
#: the path, drop trailing "?" / "&". Same Java/RE2 common subset.
URL_NORMALIZE_CHAIN: tuple[tuple[str, str], ...] = (
    (r"#.*$", ""),                                   # fragment
    (r"([?&])(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*", r"$1"),  # tracking
    (r"[?&]+$", ""),                                 # dangling ? / &
    (r"([?&])&+", r"$1"),                            # empty params left
    (r"([^:/])/{2,}", r"$1/"),                       # duplicate slashes
    (r"^(https?)://([^/:?#]+):(80|443)(/|$)", r"$1://$2$4"),  # default port
)


def normalize_url(col: Column) -> Column:
    """Canonical URL form: lowercase scheme+host (path case preserved —
    paths are case-sensitive), fragment and tracking params stripped,
    default ports dropped. The dedup key a crawl frontier uses."""
    # lowercase ONLY the scheme://host prefix: split, lower, reassemble
    prefix = F.regexp_extract(col, r"^([a-zA-Z]+://[^/?#]*)", 1)
    out = F.concat(
        F.lower(prefix),
        F.substring(col, F.length(prefix) + 1, F.lit(1 << 30)),
    )
    for pat, repl in URL_NORMALIZE_CHAIN:
        out = F.regexp_replace(out, pat, repl)
    return out


def registrable_domain(col: Column) -> Column:
    """The host's last two labels (example.com from a.b.example.com) —
    the grain crawl-politeness and per-site mixing buckets use. (A real
    public-suffix list is a broadcast lookup table; two labels is the
    deterministic stand-in that needs no external data.)"""
    host = F.regexp_extract(col, r"^[a-zA-Z]+://([^/:?#]+)", 1)
    return F.lower(F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1))
