"""Custom Python DataSource WRITER (the sink half of the connector
surface; the reader half is sources/pysource.py): a JSON-lines sink with
a real TWO-PHASE COMMIT, batch and streaming.

Why this matters at scale: Spark runs write tasks speculatively and
retries failed ones, so a sink that writes directly to its final
location produces duplicates and torn output under retry. The standard
answer — what every production committer (Hadoop FileOutputCommitter v1,
object-store staging committers) does — is the protocol implemented
here with the `pyspark.sql.datasource` writer API:

1. each task writes its partition to a UNIQUELY-NAMED staging file and
   returns a `WriterCommitMessage` naming it (task attempt = its own
   file: retries/speculation collide with nothing);
2. only the driver's `commit(messages)` — called once, with exactly one
   message per SUCCESSFUL task — publishes the staged files into the
   final directory and drops a `_SUCCESS` manifest listing them;
3. `abort()` (job failure) removes the staging dir; orphaned attempts
   from killed tasks are invisible either way, because readers go
   through the manifest.

The streaming variant keys the publish per `batchId` (epoch directory +
per-epoch manifest), making replayed epochs overwrite their own output —
the same idempotence contract as streaming/jobs.run_foreach_batch_parquet,
but enforced by the sink itself rather than by handler discipline.

Local-FS rename stands in for the object-store finalize step (this
container has no cloud SDKs); the protocol — staging keys + driver-side
finalize + manifest — is the part that transfers unchanged.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

FORMAT_NAME = "jsonl_commit"
SUCCESS_FILE = "_SUCCESS"

#: A swept orphan must be OLD: files younger than this may belong to a
#: concurrent publisher that has renamed them in but not yet written its
#: manifest. 10 minutes comfortably exceeds any commit's rename→manifest
#: window while still reclaiming crash debris on the next day's run.
_ORPHAN_RETENTION_SECONDS = 600.0


@dataclass
class _FileCommit(WriterCommitMessage):
    staged: str
    rows: int


def _json_default(v):
    return str(v)  # timestamps/decimals degrade to ISO-ish strings


def _write_partition(iterator, staging_dir: str) -> _FileCommit:
    os.makedirs(staging_dir, exist_ok=True)
    name = f"part-{uuid.uuid4().hex}.jsonl"
    path = os.path.join(staging_dir, name)
    n = 0
    with open(path, "w") as f:
        for row in iterator:
            f.write(json.dumps(row.asDict(), default=_json_default) + "\n")
            n += 1
    return _FileCommit(staged=name, rows=n)


def _publish(
    staging_dir: str, final_dir: str, messages, merge_existing: bool = False
) -> None:
    """Driver-side finalize: move exactly the files named by successful
    tasks' commit messages, then write the manifest. Staged files not in
    ``messages`` (failed/speculative attempts) are discarded with the
    staging dir.

    ``merge_existing`` (the append path) folds a prior commit's manifest
    into the new one — without it a second append job's manifest would
    list only its own files and silently orphan every previously
    committed row. The manifest itself is replaced atomically
    (tmp + os.replace) so a crash mid-commit leaves the PREVIOUS commit
    fully visible, never a torn manifest."""
    os.makedirs(final_dir, exist_ok=True)
    published, total = [], 0
    manifest_path = os.path.join(final_dir, SUCCESS_FILE)
    if merge_existing and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            prior = json.load(f)
        published.extend(prior["files"])
        total += prior["rows"]
    for m in messages:
        if m is None:
            continue
        os.rename(
            os.path.join(staging_dir, m.staged), os.path.join(final_dir, m.staged)
        )
        published.append(m.staged)
        total += m.rows
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"files": sorted(published), "rows": total}, f)
    os.replace(tmp, manifest_path)
    shutil.rmtree(staging_dir, ignore_errors=True)
    # Orphan sweep: a crash mid-rename-loop (above) leaves files in the
    # final dir that no manifest will ever list — the retried job stages
    # fresh uuid-named files, so the half-published ones would accumulate
    # as unreclaimable garbage (invisible to read_back, but real disk).
    # The manifest is the source of truth, so any part file it doesn't
    # list is dead and reclaimed on the next successful commit. The sweep
    # is AGE-GATED (like table.py's gc_orphans): if two jobs ever publish
    # to the same final_dir concurrently, publisher A must not delete the
    # seconds-old files publisher B just renamed in but has not yet
    # manifested — only files older than the retention window are dead
    # with confidence.
    keep = set(published)
    cutoff = time.time() - _ORPHAN_RETENTION_SECONDS
    for name in os.listdir(final_dir):
        if (
            name.startswith("part-")
            and name.endswith(".jsonl")
            and name not in keep
        ):
            try:
                if os.path.getmtime(os.path.join(final_dir, name)) > cutoff:
                    continue  # too fresh — may belong to a racing publisher
            except OSError:
                continue
            try:
                os.remove(os.path.join(final_dir, name))
            except OSError:
                pass  # best-effort reclaim; next commit retries


class JsonLinesWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_commit requires a 'path' option")
        self.overwrite = overwrite
        self.staging = os.path.join(self.path, "_staging")

    def write(self, iterator) -> _FileCommit:
        return _write_partition(iterator, self.staging)

    def commit(self, messages) -> None:
        final = os.path.join(self.path, "data")
        if self.overwrite and os.path.isdir(final):
            shutil.rmtree(final)
        _publish(self.staging, final, messages, merge_existing=not self.overwrite)

    def abort(self, messages) -> None:
        shutil.rmtree(self.staging, ignore_errors=True)


class JsonLinesStreamWriter(DataSourceStreamWriter):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_commit requires a 'path' option")

    def write(self, iterator) -> _FileCommit:
        return _write_partition(iterator, os.path.join(self.path, "_staging"))

    def commit(self, messages, batchId: int) -> None:
        # epoch-keyed publish: a replayed epoch rewrites its own dir
        final = os.path.join(self.path, f"epoch={batchId}")
        if os.path.isdir(final):
            shutil.rmtree(final)
        _publish(os.path.join(self.path, "_staging"), final, messages)

    def abort(self, messages, batchId: int) -> None:
        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)


class JsonLinesCommitDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def writer(self, schema, overwrite: bool) -> JsonLinesWriter:
        return JsonLinesWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> JsonLinesStreamWriter:
        return JsonLinesStreamWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(JsonLinesCommitDataSource)


def read_back(spark, path: str, schema: str, subdir: str = "data"):
    """Manifest-respecting reader: only files the commit published are
    visible (the reason torn/orphaned attempts can never leak)."""
    final = os.path.join(path, subdir)
    with open(os.path.join(final, SUCCESS_FILE)) as f:
        manifest = json.load(f)
    files = [os.path.join(final, name) for name in manifest["files"]]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)
