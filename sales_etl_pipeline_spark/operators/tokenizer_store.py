"""Tokenizer model registry on the engine's versioned-table layer —
trained tokenizer artifacts (BPE merge tables, unigram vocabularies)
committed as ACID snapshots with time travel and a change feed, the way
a production pipeline pins "the tokenizer used for run X" and audits
vocabulary evolution between training rounds.

Composition, not new machinery: models are small relations (a merge
table is n_merges rows; a unigram vocab ≤ VOCAB_SIZE rows), so
``sources/table.VersionedTable`` gives — for free — atomic publish,
snapshot isolation (a training job re-saving the model never tears a
concurrent reader), AS OF time travel (re-tokenize with the exact vocab
of any past run), (writer, epoch) replay idempotence, and a row-level
CDF keyed on the model's natural key (merge rank / piece) that answers
"which merges or pieces changed between model v0 and v1".

Round-trip exactness: ranks/pieces are ints/strings; unigram log-probs
are doubles and parquet stores IEEE doubles losslessly, so load ∘ save
is bit-identical (pinned in tests/test_tokenizer_store.py together with
tokenize-with-loaded ≡ tokenize-with-trained).
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

from ..sources.table import CommitConflict, VersionedTable

#: save retries through concurrent commits (the merge_commit pattern)
_MAX_RETRIES = 5


def _bpe_table(spark: SparkSession, root: str) -> VersionedTable:
    t = VersionedTable(spark, root)
    t.key_columns = ("rank",)  # CDF: per-rank merge-rule diff
    return t


def _replayed_version(
    t: VersionedTable, writer: str | None, epoch: int | None
) -> int | None:
    """The version a (writer, epoch) pair already committed, else None —
    save-model replay idempotence. (``commit_overwrite`` records the
    pair in the manifest but only delete/merge skip on replay; a model
    save is an overwrite, so the registry enforces it here.) Newest-
    first manifest scan with early exit, the ``epoch_committed``
    pattern — a replayed save typically matches within one read."""
    if writer is None or epoch is None:
        return None
    for v in reversed(t.versions()):
        m = t._read_manifest(v)
        if m.get("writer") == writer and m.get("epoch") == epoch:
            return v
    return None


def _save(t: VersionedTable, df, operation, writer, epoch) -> int:
    """Replay-idempotent, conflict-retrying model save: re-check the
    replay (a RACING save of the same epoch may have landed), then
    commit; on CommitConflict loop — the same optimistic-concurrency
    recipe as VersionedTable.merge_commit."""
    last: CommitConflict | None = None
    for _ in range(_MAX_RETRIES):
        done = _replayed_version(t, writer, epoch)
        if done is not None:
            return done
        try:
            return t.commit_overwrite(
                df, operation=operation, writer=writer, epoch=epoch
            )
        except CommitConflict as e:
            last = e
            continue
    raise last or CommitConflict((t.latest_version() or 0) + 1)


def save_bpe_model(
    spark: SparkSession,
    root: str,
    merges: list[tuple[str, str]],
    writer: str | None = None,
    epoch: int | None = None,
) -> int:
    """Commit the ordered merge list as the next model version."""
    from ..plans.bpe import MERGE_TABLE_SCHEMA, merge_table_rows

    df = spark.createDataFrame(merge_table_rows(merges), MERGE_TABLE_SCHEMA)
    return _save(_bpe_table(spark, root), df, "save_bpe", writer, epoch)


def load_bpe_model(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    as_of: float | None = None,
) -> list[tuple[str, str]]:
    """The ordered merge list of a model version (latest by default;
    ``version=`` pins a snapshot, ``as_of=`` resolves by commit time)."""
    t = _bpe_table(spark, root)
    if as_of is not None:
        version = t.version_as_of(as_of)
    rows = t.read(version=version).orderBy("rank").collect()
    return [(r.lhs, r.rhs) for r in rows]


def _unigram_table(spark: SparkSession, root: str) -> VersionedTable:
    t = VersionedTable(spark, root)
    t.key_columns = ("piece",)  # CDF: per-piece vocab diff
    return t


def save_unigram_model(
    spark: SparkSession,
    root: str,
    probs: dict[str, float],
    writer: str | None = None,
    epoch: int | None = None,
) -> int:
    """Commit a trained unigram vocabulary (piece → prob) as the next
    model version; stored as log-probs like the serving artifact."""
    df = spark.createDataFrame(
        sorted((p, math.log(v)) for p, v in probs.items()),
        "piece string, logprob double",
    )
    return _save(
        _unigram_table(spark, root), df, "save_unigram", writer, epoch
    )


def load_unigram_model(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    as_of: float | None = None,
) -> dict[str, float]:
    """piece → LOG-prob of a model version (the Viterbi input shape —
    ``plans/unigram.viterbi_segment`` consumes it directly)."""
    t = _unigram_table(spark, root)
    if as_of is not None:
        version = t.version_as_of(as_of)
    return {
        r.piece: r.logprob for r in t.read(version=version).collect()
    }


def model_changes(spark: SparkSession, root: str, version: int):
    """The row-level change relation of one model commit vs its parent
    (``_change_type`` ∈ insert/delete/update_preimage/update_postimage
    per key) — the audit answer to 'what did retraining change'. Reads
    the commit's CDF bookkeeping straight from the manifest (the batch
    twin of ``sources/table_feed.read_feed(cdf=True)``)."""
    import os

    from pyspark.sql import functions as F

    t = VersionedTable(spark, root)
    m = t._read_manifest(version)
    cdf = m.get("cdf")
    if not cdf:
        raise ValueError(
            f"version {version} of {root} has no CDF bookkeeping "
            "(committed without key_columns)"
        )
    if cdf["mode"] == "insert_all":
        return t.read(version=version).withColumn(
            "_change_type", F.lit("insert")
        )
    if cdf["mode"] == "none":  # compact: same rows by construction
        return (
            t.read(version=version)
            .limit(0)
            .withColumn("_change_type", F.lit(""))
        )
    if cdf["mode"] != "diff":
        raise ValueError(
            f"unsupported CDF mode {cdf['mode']!r} for a model commit "
            "(the registry only ever commit_overwrite's)"
        )
    files = [os.path.join(t._data, n) for n in cdf["files"]]
    return spark.read.parquet(*files)


def _wordpiece_table(spark: SparkSession, root: str) -> VersionedTable:
    t = VersionedTable(spark, root)
    t.key_columns = ("rank",)  # CDF: per-rank merge-rule diff
    return t


def save_wordpiece_model(
    spark: SparkSession,
    root: str,
    merges: list[tuple[str, str, int]],
    writer: str | None = None,
    epoch: int | None = None,
) -> int:
    """Commit a trained WordPiece merge list (lhs, rhs, score_key in
    training order — plans/wordpiece.train_wordpiece's output) as the
    next model version; the quantized likelihood score rides along so a
    registry audit can see WHY each merge ranked (the diff a BPE model
    can't show)."""
    from ..plans.wordpiece import _merge_token

    df = spark.createDataFrame(
        [
            (r, lhs, rhs, _merge_token(lhs, rhs), score)
            for r, (lhs, rhs, score) in enumerate(merges)
        ],
        "rank int, lhs string, rhs string, merged string, score_key long",
    )
    return _save(
        _wordpiece_table(spark, root), df, "save_wordpiece", writer, epoch
    )


def load_wordpiece_model(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    as_of: float | None = None,
) -> list[tuple[str, str, int]]:
    """The ordered (lhs, rhs, score_key) merge list of a model version
    (latest by default) — train_wordpiece's shape, so a loaded model
    feeds wp_vocab/segment_word directly."""
    t = _wordpiece_table(spark, root)
    if as_of is not None:
        version = t.version_as_of(as_of)
    rows = t.read(version=version).orderBy("rank").collect()
    return [(r.lhs, r.rhs, r.score_key) for r in rows]
