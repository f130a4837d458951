"""WARC (Web ARChive, ISO 28500) batch source — the file format crawl
corpora actually arrive in (Common Crawl ships WARC/WAT/WET), parsed
with the STDLIB only and exposed through the PySpark 4 Python
DataSource API: ``spark.dataSource.register(WarcDataSource)`` then
``spark.read.format("warc").option("path", dir_or_file)``.

One row per WARC record: the WARC headers every consumer needs
(type, target URI, date, record id, content type, length), the raw
payload, and — for ``response`` records — the HTTP layer split out
(status, response content-type, BODY with headers removed), which is
what feeds ``plans/webtext.html_text_extract`` → quality → dedup, the
full crawl-to-corpus path this engine runs.

Scale shape: one input partition per WARC FILE. Gzip members are not
splittable (Common Crawl's ~1 GB .warc.gz convention exists precisely
so the FILE is the parallelism grain), so finer intra-file splits
would force every task to decompress from byte 0 anyway; a crawl
delivers thousands of files, which is plenty of parallelism. Records
stream through a bounded parser (header lines + exact Content-Length
payload read) — constant memory per task regardless of file size,
except each record's payload itself.

Robustness: a malformed record tail (truncated payload, missing
separator) stops that FILE's iteration at the last good record rather
than failing the job — crawls contain truncated files as a matter of
course; the ``warc_file`` column lets a DQ pass count per-file yields
against manifests.
"""

from __future__ import annotations

import glob
import gzip
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

FORMAT_NAME = "warc"

SCHEMA = (
    "warc_file string, record_id string, warc_type string, "
    "target_uri string, warc_date string, content_type string, "
    "content_length bigint, payload binary, "
    "http_status int, http_content_type string, body binary"
)


def _read_headers(fh) -> dict[str, str] | None:
    """Read a CRLF-terminated header block (first line = version/status
    line under key ''). Returns None on EOF before any line."""
    first = fh.readline()
    if not first:
        return None
    headers: dict[str, str] = {"": first.decode("latin-1").strip()}
    while True:
        line = fh.readline()
        if not line:
            return None  # truncated mid-headers
        s = line.decode("latin-1").rstrip("\r\n")
        if not s:
            return headers
        if ":" in s:
            k, v = s.split(":", 1)
            headers[k.strip().lower()] = v.strip()


def _split_http(payload: bytes) -> tuple[int | None, str | None, bytes | None]:
    """Split an HTTP-response payload into (status, content-type, body).
    Returns (None, None, None) when the payload is not HTTP-shaped."""
    if not payload.startswith(b"HTTP/"):
        return None, None, None
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return None, None, None
    head = payload[:sep].decode("latin-1", "replace").split("\r\n")
    try:
        status = int(head[0].split()[1])
    except (IndexError, ValueError):
        return None, None, None
    ctype = None
    for line in head[1:]:
        if line.lower().startswith("content-type:"):
            ctype = line.split(":", 1)[1].strip()
            break
    return status, ctype, payload[sep + 4 :]


def parse_warc(fh, warc_file: str) -> Iterator[tuple]:
    """Yield one row tuple per record from an open binary stream.
    Stops (without raising) at EOF or the first malformed record."""
    while True:
        headers = _read_headers(fh)
        if headers is None:
            return
        version = headers.get("", "")
        if not version.startswith("WARC/"):
            return  # lost sync: stop at last good record
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        payload = fh.read(length)
        if len(payload) < length:
            return  # truncated payload
        # consume the record separator (CRLF CRLF); tolerate EOF after
        fh.read(4)
        wtype = headers.get("warc-type", "")
        status, http_ctype, body = (
            _split_http(payload) if wtype == "response" else (None, None, None)
        )
        yield (
            warc_file,
            headers.get("warc-record-id", ""),
            wtype,
            headers.get("warc-target-uri"),
            headers.get("warc-date"),
            headers.get("content-type"),
            length,
            payload,
            status,
            http_ctype,
            body,
        )


def _open_warc(path: str):
    return (
        gzip.open(path, "rb") if path.endswith(".gz") else open(path, "rb")
    )


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcReader(DataSourceReader):
    def __init__(self, options) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("warc source requires option 'path'")
        if os.path.isdir(path):
            self.files = sorted(
                glob.glob(os.path.join(path, "*.warc"))
                + glob.glob(os.path.join(path, "*.warc.gz"))
            )
        else:
            self.files = [path]
        if not self.files:
            raise FileNotFoundError(f"no .warc/.warc.gz files under {path}")

    def partitions(self):
        return [_FilePartition(p) for p in self.files]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        # both open(..., "rb") and gzip.open return buffered readers
        # with efficient readline — no extra wrapping needed
        with _open_warc(partition.path) as fh:
            yield from parse_warc(fh, os.path.basename(partition.path))


class WarcStreamReader(DataSourceStreamReader):
    """Tail a crawl directory: each microbatch processes exactly the
    WARC files that appeared since the last committed offset. The
    offset is the explicit SET of consumed file names (not a count or a
    name high-watermark — both silently skip a file that lands with an
    earlier-sorting name), so replay after restart re-reads precisely
    the files a failed batch covered and nothing else. Files must be
    complete when they appear (crawlers write elsewhere and rename in —
    the same contract every file-based Spark source has); consumed
    files may be deleted afterwards without disturbing the stream."""

    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source requires option 'path'")

    def _list(self) -> list[str]:
        return sorted(
            os.path.basename(p)
            for pat in ("*.warc", "*.warc.gz")
            for p in glob.glob(os.path.join(self.path, pat))
        )

    def initialOffset(self) -> dict:
        return {"names": []}

    def latestOffset(self) -> dict:
        return {"names": self._list()}

    def partitions(self, start: dict, end: dict):
        new = sorted(set(end["names"]) - set(start["names"]))
        return [
            _FilePartition(os.path.join(self.path, n)) for n in new
        ] or [_FilePartition("")]

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        if not partition.path:
            return
        with _open_warc(partition.path) as fh:
            yield from parse_warc(fh, os.path.basename(partition.path))

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> WarcReader:
        return WarcReader(self.options)

    def streamReader(self, schema) -> WarcStreamReader:
        return WarcStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(WarcDataSource)


def read_warc(spark, path: str):
    """Convenience: register + read a WARC file/directory as a DataFrame."""
    register(spark)
    return spark.read.format(FORMAT_NAME).option("path", path).load()
