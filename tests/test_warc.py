"""WARC source (sources/warc.py): record parsing, HTTP payload split,
gzip members, per-file partitions, truncated-tail tolerance, and the
crawl→text composition with plans/webtext."""

from __future__ import annotations

import gzip
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from sales_etl_pipeline_spark.sources import warc  # noqa: E402


def _record(wtype: str, uri: str | None, payload: bytes, rid: str) -> bytes:
    h = [
        b"WARC/1.0",
        f"WARC-Type: {wtype}".encode(),
        f"WARC-Record-ID: <urn:uuid:{rid}>".encode(),
        b"WARC-Date: 2024-01-01T00:00:00Z",
    ]
    if uri:
        h.append(f"WARC-Target-URI: {uri}".encode())
    if wtype == "response":
        h.append(b"Content-Type: application/http; msgtype=response")
    h.append(f"Content-Length: {len(payload)}".encode())
    return b"\r\n".join(h) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _http(body: bytes, status: int = 200, ctype: str = "text/html") -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


HTML1 = b"<html><body><p>Hello crawl world.</p><script>x()</script></body></html>"
HTML2 = b"<html><body><h1>Second &amp; page</h1></body></html>"


def _write_warc(path, records: list[bytes], gz: bool = False) -> None:
    data = b"".join(records)
    if gz:
        with gzip.open(path, "wb") as f:
            f.write(data)
    else:
        with open(path, "wb") as f:
            f.write(data)


def _corpus(tmp_path) -> str:
    d = tmp_path / "crawl"
    d.mkdir()
    _write_warc(
        str(d / "a.warc"),
        [
            _record("warcinfo", None, b"software: test\r\n", "info1"),
            _record("request", "https://x.com/1", b"GET /1 HTTP/1.1\r\n\r\n", "req1"),
            _record("response", "https://x.com/1", _http(HTML1), "resp1"),
        ],
    )
    _write_warc(
        str(d / "b.warc.gz"),
        [
            _record(
                "response",
                "https://y.com/2",
                _http(HTML2, status=404, ctype="text/html; charset=utf-8"),
                "resp2",
            )
        ],
        gz=True,
    )
    return str(d)


def test_warc_parses_records_and_http_layer(spark, tmp_path):
    df = warc.read_warc(spark, _corpus(tmp_path))
    rows = {r.record_id: r for r in df.collect()}
    assert len(rows) == 4
    info = rows["<urn:uuid:info1>"]
    assert info.warc_type == "warcinfo" and info.http_status is None
    resp1 = rows["<urn:uuid:resp1>"]
    assert resp1.warc_type == "response"
    assert resp1.target_uri == "https://x.com/1"
    assert resp1.http_status == 200
    assert resp1.http_content_type == "text/html"
    assert bytes(resp1.body) == HTML1
    assert resp1.content_length == len(_http(HTML1))
    # gzip member parses identically; per-file provenance recorded
    resp2 = rows["<urn:uuid:resp2>"]
    assert resp2.http_status == 404
    assert bytes(resp2.body) == HTML2
    assert resp2.warc_file == "b.warc.gz"
    # request payload is NOT split as http (not a response)
    assert rows["<urn:uuid:req1>"].body is None


def test_warc_one_partition_per_file(spark, tmp_path):
    df = warc.read_warc(spark, _corpus(tmp_path))
    assert df.rdd.getNumPartitions() == 2


def test_warc_truncated_tail_keeps_good_records(spark, tmp_path):
    d = tmp_path / "trunc"
    d.mkdir()
    good = _record("response", "https://x.com/1", _http(HTML1), "ok")
    bad = _record("response", "https://x.com/2", _http(HTML2), "cut")[:-40]
    _write_warc(str(d / "t.warc"), [good, bad])
    rows = warc.read_warc(spark, str(d)).collect()
    assert [r.record_id for r in rows] == ["<urn:uuid:ok>"]


def test_warc_missing_path_raises(spark, tmp_path):
    warc.register(spark)
    with pytest.raises(Exception):
        spark.read.format("warc").option(
            "path", str(tmp_path / "nope")
        ).load().collect()


def test_crawl_to_text_composition(spark, tmp_path):
    """The full ingestion path: WARC responses → filter html 200s →
    decode → html_to_text → clean text ready for the quality/dedup
    plans. Extraction semantics match the webtext operator exactly."""
    from sales_etl_pipeline_spark.functions.web import html_to_text

    df = warc.read_warc(spark, _corpus(tmp_path))
    texts = (
        df.filter(
            (F.col("warc_type") == "response")
            & (F.col("http_status") == 200)
            & F.col("http_content_type").startswith("text/html")
        )
        .select(
            "target_uri",
            html_to_text(F.col("body").cast("string")).alias("text"),
        )
        .collect()
    )
    assert len(texts) == 1
    assert texts[0].text == "Hello crawl world."


def test_warc_stream_tails_directory(spark, tmp_path):
    """Streaming tail: drain 1 — only the existing file; a new file
    lands; drain 2 with the SAME checkpoint picks up exactly the new
    one (exactly-once across runs), and stream ≡ batch on the union."""
    d = tmp_path / "tail"
    d.mkdir()
    _write_warc(
        str(d / "a.warc"),
        [_record("response", "https://x.com/1", _http(HTML1), "r1")],
    )
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def drain():
        q = (
            spark.readStream.format("warc")
            .option("path", str(d))
            .load()
            .selectExpr("warc_file", "record_id", "target_uri")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            (r.warc_file, r.record_id)
            for r in spark.read.parquet(out).collect()
        )

    warc.register(spark)
    assert drain() == [("a.warc", "<urn:uuid:r1>")]
    _write_warc(
        str(d / "b.warc.gz"),
        [_record("response", "https://x.com/2", _http(HTML2), "r2")],
        gz=True,
    )
    assert drain() == [
        ("a.warc", "<urn:uuid:r1>"),
        ("b.warc.gz", "<urn:uuid:r2>"),
    ]
    # a third drain with nothing new adds nothing (no re-reads)
    assert drain() == [
        ("a.warc", "<urn:uuid:r1>"),
        ("b.warc.gz", "<urn:uuid:r2>"),
    ]


def test_crawl_documents_adapter_feeds_downstream_plans(spark, tmp_path):
    """crawl_documents yields the engine's documents shape from a WARC
    dir — distinct stable ids, domain-grain sources, extracted text —
    and composes with a downstream exact-dedup pass unchanged."""
    from sales_etl_pipeline_spark.plans.webtext import crawl_documents

    d = tmp_path / "crawl"
    d.mkdir()
    recs = [
        _record("response", "https://www.x-site.com/1", _http(HTML1), "r1"),
        # exact duplicate CONTENT under a different record id / URI
        _record("response", "https://mirror.x-site.com/1", _http(HTML1), "r1dup"),
        _record("response", "https://www.y-site.org/2", _http(HTML2), "r2"),
        # non-200 and non-html records must be dropped
        _record("response", "https://www.x-site.com/404", _http(b"gone", 404), "r404"),
        _record(
            "response",
            "https://www.x-site.com/j",
            _http(b"{}", ctype="application/json"),
            "rj",
        ),
    ]
    _write_warc(str(d / "c.warc"), recs)
    docs = crawl_documents(spark, str(d))
    rows = docs.collect()
    assert len(rows) == 3
    assert len({r.doc_id for r in rows}) == 3  # stable distinct ids
    assert {r.source for r in rows} == {"x-site.com", "y-site.org"}
    texts = {r.text for r in rows}
    assert "Hello crawl world." in texts
    assert "Second & page" in texts
    # downstream composition: hash-grain exact dedup collapses the
    # mirrored content to one survivor per distinct text
    survivors = (
        docs.withColumn("h", F.md5(F.col("text")))
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep"))
    )
    assert survivors.count() == 2
    # deterministic across re-reads
    again = {r.doc_id for r in crawl_documents(spark, str(d)).collect()}
    assert again == {r.doc_id for r in rows}


def test_warc_parser_roundtrip_property():
    """Property: for ANY payload bytes (including embedded CRLFs,
    'WARC/' prefixes, and fake record separators) and any record count,
    Content-Length framing recovers every record exactly; truncating
    the serialized stream anywhere yields a strict PREFIX of the
    records, never garbage. Pure-Python — exercises parse_warc on
    BytesIO without Spark."""
    import io

    from hypothesis import given, settings, strategies as st

    payloads = st.lists(
        st.binary(min_size=0, max_size=200).map(
            # adversarial: prepend bytes that look like framing
            lambda b: b"\r\n\r\nWARC/1.0\r\n" + b
        ),
        min_size=1,
        max_size=6,
    )

    @settings(max_examples=60, deadline=None)
    @given(payloads, st.integers(min_value=0, max_value=2000))
    def check(bodies, cut):
        recs = [
            _record("resource", f"https://p.com/{i}", body, f"id{i}")
            for i, body in enumerate(bodies)
        ]
        blob = b"".join(recs)
        got = list(warc.parse_warc(io.BytesIO(blob), "f.warc"))
        assert [r[1] for r in got] == [
            f"<urn:uuid:id{i}>" for i in range(len(bodies))
        ]
        assert [bytes(r[7]) for r in got] == bodies
        # arbitrary truncation -> prefix of records, no exception
        cut_got = list(
            warc.parse_warc(io.BytesIO(blob[: max(0, len(blob) - cut)]), "f")
        )
        assert len(cut_got) <= len(got)
        for a, b in zip(cut_got, got):
            assert a[1] == b[1] and bytes(a[7]) == bytes(b[7])

    check()


def test_crawl_ingest_stream_end_to_end(spark, tmp_path):
    """The full ingestion loop (streaming/jobs.run_crawl_ingest_stream):
    drain 1 lands file A's documents + stats as txn 0; file B arrives,
    drain 2 appends only B's docs and refreshes stats in the SAME txn;
    at every seq the stats table ≡ a recompute from the documents table
    at that seq; a full replay with a fresh checkpoint commits nothing."""
    from pyspark.sql import functions as F

    from sales_etl_pipeline_spark.sources.catalog import TableCatalog
    from sales_etl_pipeline_spark.streaming import jobs

    d = tmp_path / "crawl"
    d.mkdir()
    _write_warc(
        str(d / "a.warc"),
        [
            _record("response", "https://www.x-site.com/1", _http(HTML1), "r1"),
            _record("response", "https://www.y-site.org/2", _http(HTML2), "r2"),
        ],
    )
    root = str(tmp_path / "cat")

    jobs.run_crawl_ingest_stream(spark, str(d), root, str(tmp_path / "ck"))
    cat = TableCatalog(spark, root)
    assert cat.latest_seq() == 0
    assert cat.read("documents").count() == 2
    _write_warc(
        str(d / "b.warc.gz"),
        [_record("response", "https://www.x-site.com/3", _http(HTML1), "r3")],
        gz=True,
    )
    jobs.run_crawl_ingest_stream(spark, str(d), root, str(tmp_path / "ck"))
    assert cat.latest_seq() == 1
    docs = cat.read("documents")
    assert docs.count() == 3
    assert docs.select("doc_id").distinct().count() == 3
    # appended, not rewritten: documents table has 2 versions
    assert cat.table("documents").versions() == [0, 1]
    # seq-aligned stats ≡ recompute at every seq
    for s in cat.txns():
        want = sorted(
            map(
                tuple,
                cat.read("documents", seq=s)
                .groupBy("source")
                .agg(
                    F.count(F.lit(1)).alias("n_docs"),
                    F.sum(F.length("text")).alias("n_chars"),
                )
                .collect(),
            )
        )
        got = sorted(map(tuple, cat.read("source_stats", seq=s).collect()))
        assert got == want, f"stats misaligned at seq {s}"
    # replay from scratch: both epochs already committed -> no-op
    jobs.run_crawl_ingest_stream(spark, str(d), root, str(tmp_path / "ck2"))
    assert cat.latest_seq() == 1
    assert cat.read("documents").count() == 3
