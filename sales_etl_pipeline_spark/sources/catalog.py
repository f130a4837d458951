"""Multi-table ACID transactions over versioned tables — the catalog
layer (the piece ``sources/table.py`` documents as deliberately out of
scope there).

Why it exists: a CDC pipeline rarely maintains ONE table. The daily
merge lands a snapshot AND its summary AND its DQ report; a consumer
reading the snapshot at version N must see the summary derived from
that same N — per-table snapshot isolation alone cannot promise that.
Every production answer (Iceberg's catalog commit, Delta's metastore,
a warehouse transaction) is the same mechanism implemented here:

1. **Per-table mechanics are unchanged.** Each member table is a plain
   ``VersionedTable`` under ``root/tables/<name>``; data files stage
   invisibly exactly as before (``prepare_commit`` — the prepare half
   of the existing commit path).
2. **The transaction log is the catalog.** ``root/_txn/N.json`` records
   one transaction: the set of per-table versions it creates, each with
   the full manifest payload, plus the CUMULATIVE ``table_versions``
   map (the catalog state after this txn — txns are serialized by the
   CAS, so the map is just parent's ∪ this txn's). Commit = the same
   fsync-tmp + ``os.link`` compare-and-swap the table manifests use:
   exactly one writer creates txn N.
3. **Publish is roll-forward, not part of atomicity.** After the txn
   record lands, the per-table manifests are published from its stored
   payloads. A crash between the two leaves a committed txn with
   unpublished manifests — ANY later catalog operation first rolls
   forward (publishing is idempotent: a version already published by a
   previous roll-forward attempt verifies byte-identical and is
   skipped). So the txn record is the single durability point: before
   it, nothing is visible anywhere; after it, the whole multi-table
   commit is guaranteed to surface.

Consistency contract: a CONSISTENT cross-table snapshot is read through
the catalog (``snapshot()`` / ``read(name, seq=...)``), which resolves
every table's version from ONE txn record — all-or-nothing by
construction, and time-travels across the whole catalog for free.
Direct ``VersionedTable.read()`` on a member table still gives
per-table snapshot isolation (manifests only appear after their txn is
durable) — it just cannot promise cross-table alignment, same as
reading one Iceberg table outside the catalog.

Write contract (documented, enforced by the txn CAS): member tables are
written ONLY through ``TableCatalog.commit``. The txn log serializes
all catalog writers; a direct per-table commit would race roll-forward
for version numbers and break the "txn record describes the next
version" invariant. This is the managed-table contract every
catalog-backed format has.

Reference parity note: the reference (data/etl.py:238-260) recomputes
and overwrites all its summary outputs together, non-atomically; this
module is what makes that multi-output publish atomic at scale.
"""

from __future__ import annotations

import json
import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession

from .table import CommitConflict, VersionedTable

TXN_DIR = "_txn"
TABLES_DIR = "tables"
_TXN_RE = re.compile(r"^(\d{12})\.json$")


class TxnConflict(RuntimeError):
    """Another writer committed this transaction sequence first. Retry
    by re-deriving the writes from the new catalog state."""

    def __init__(self, seq: int):
        self.seq = seq
        super().__init__(
            f"txn {seq} was committed by another writer — re-derive "
            "from the new catalog state and retry"
        )


class CatalogCorruption(RuntimeError):
    """A member table's manifest diverged from its txn record — a
    direct (non-catalog) write violated the managed-table contract."""


class TableCatalog:
    """Handle to a catalog of versioned tables rooted at ``root``
    (created lazily on first commit). All catalog operations roll
    committed-but-unpublished transactions forward first, so readers
    and writers always observe a fully-published catalog state."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._txn = os.path.join(root, TXN_DIR)
        #: per-table key_columns/stat_columns, applied to every handle
        #: this catalog hands out (see ``configure``)
        self._table_configs: dict[str, dict] = {}

    def configure(
        self,
        name: str,
        key_columns: tuple[str, ...] = (),
        stat_columns: tuple[str, ...] = (),
        bloom_columns: tuple[str, ...] = (),
    ) -> None:
        """Set a member table's CDF key / data-skipping stat + bloom
        columns — applied to every handle the catalog creates
        (including the ones ``commit`` uses internally), so CDF and
        manifest-stat/bloom pruning work through catalog transactions
        exactly as they do on a standalone ``VersionedTable``."""
        self._table_configs[name] = {
            "key_columns": tuple(key_columns),
            "stat_columns": tuple(stat_columns),
            "bloom_columns": tuple(bloom_columns),
        }

    # ------------------------------------------------------------------
    # txn-log primitives (same atomic-create CAS as table manifests)

    def table(self, name: str) -> VersionedTable:
        """The member table handle (``root/tables/<name>``). Reading
        through it is fine; writing through it breaks the managed-table
        contract — commit via the catalog."""
        if not re.fullmatch(r"[A-Za-z0-9_.-]+", name):
            raise ValueError(f"invalid table name {name!r}")
        t = VersionedTable(
            self.spark, os.path.join(self.root, TABLES_DIR, name)
        )
        cfg = self._table_configs.get(name)
        if cfg:
            t.key_columns = cfg["key_columns"]
            t.stat_columns = cfg["stat_columns"]
            t.bloom_columns = cfg.get("bloom_columns", ())
        return t

    def _txn_path(self, seq: int) -> str:
        return os.path.join(self._txn, f"{seq:012d}.json")

    def _read_txn(self, seq: int) -> dict:
        with open(self._txn_path(seq)) as f:
            return json.load(f)

    def txns(self) -> list[int]:
        """Committed txn sequence numbers, ascending. Tolerates a torn
        trailing record exactly like ``VersionedTable.versions`` —
        under the tmp+link publish a torn record should never occur,
        but a reader must not die on one."""
        if not os.path.isdir(self._txn):
            return []
        out = []
        for name in os.listdir(self._txn):
            m = _TXN_RE.match(name)
            if m:
                out.append(int(m.group(1)))
        out.sort()
        while out:
            try:
                self._read_txn(out[-1])
                break
            except (json.JSONDecodeError, OSError):
                out.pop()
        return out

    def latest_seq(self) -> int | None:
        ts = self.txns()
        return ts[-1] if ts else None

    def _try_commit_txn(self, seq: int, record: dict) -> None:
        os.makedirs(self._txn, exist_ok=True)
        payload = json.dumps(record)
        path = self._txn_path(seq)
        tmp = os.path.join(self._txn, f".tmp_{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
        except FileExistsError:
            raise TxnConflict(seq)
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass

    # ------------------------------------------------------------------
    # roll-forward (publish committed txns' manifests, idempotently)

    def _publish_txn(self, record: dict) -> None:
        """Publish every per-table manifest a txn record stores. Safe to
        run any number of times and from any process: an already-
        published version verifies byte-identical against the record
        and is skipped; a mismatch means a non-catalog writer stole the
        version — surfaced loudly, never papered over."""
        for name, entry in record["tables"].items():
            t = self.table(name)
            prepared = dict(entry["manifest"])
            prepared["version"] = entry["version"]
            try:
                t.publish_prepared(prepared)
            except CommitConflict:
                existing = t._read_manifest(entry["version"])
                # compare the COMMIT-DEFINING keys only: committed_at is
                # wall-clock metadata — two publishes of the same txn at
                # different times are the same commit
                cmp_keys = (
                    "files", "schema", "operation", "writer",
                    "epoch", "rows", "parent", "cdf",
                )
                want = {k: prepared[k] for k in cmp_keys}
                if {k: existing.get(k) for k in cmp_keys} != want:
                    raise CatalogCorruption(
                        f"table {name!r} version {entry['version']} was "
                        "committed outside the catalog — manifest does "
                        "not match its transaction record"
                    )

    def roll_forward(self) -> None:
        """Bring every member table up to the latest committed txn.
        Cheap when nothing is pending (per-table version check, no
        manifest writes); crash recovery when something is."""
        seq = self.latest_seq()
        if seq is None:
            return
        # Older txns: publish ONLY versions ABOVE each table's current
        # latest. Never republish at-or-below latest — those manifests
        # either exist (normal) or were dropped by vacuum, and
        # recreating a vacuumed manifest would resurrect a dropped
        # version pointing at deleted data files. In practice only the
        # newest txn can be unpublished (publish happens right after
        # commit), so this walk is usually a no-op.
        for s in self.txns():
            if s == seq:
                continue
            r = self._read_txn(s)
            entries = {
                n: e
                for n, e in r["tables"].items()
                if (self.table(n).latest_version() or -1) < e["version"]
            }
            if entries:
                self._publish_txn({"tables": entries})
        # The LATEST txn is always publish-or-VERIFIED: publishing is
        # idempotent (an existing manifest is byte-compared against the
        # record), so this both completes a crashed publish AND detects
        # an out-of-band writer that stole a promised version
        # (CatalogCorruption) — the check is one small JSON read per
        # table in the newest txn.
        self._publish_txn(self._read_txn(seq))

    # ------------------------------------------------------------------
    # write path

    def epoch_committed(self, writer: str, epoch: int) -> int | None:
        """The txn seq carrying this (writer, epoch), or None — the
        streaming replay-idempotence check, catalog-wide. Scans
        newest-first: a replayed epoch is almost always recent, so the
        common hit costs O(1) record reads."""
        for s in reversed(self.txns()):
            r = self._read_txn(s)
            if r.get("writer") == writer and r.get("epoch") == epoch:
                return s
        return None

    def commit(
        self,
        overwrites: dict[str, DataFrame] | None = None,
        appends: dict[str, DataFrame] | None = None,
        writer: str | None = None,
        epoch: int | None = None,
        max_retries: int = 5,
        deletes: dict[str, str] | None = None,
    ) -> int:
        """Atomically commit writes to SEVERAL tables as one
        transaction: either every table advances to its recorded
        version, or none does. ``overwrites`` replace each table's
        content; ``appends`` add rows; ``deletes`` maps table → either
        a SQL predicate string or ``{"predicate": str, "prune":
        (col, lo, hi), "prune_eq": (col, value)}`` (the manifest-stat /
        bloom pre-prune hints ``delete_where`` takes) and runs a
        copy-on-write DELETE (the multi-table erasure shape — user
        data spans tables, and the right to be forgotten is atomic or
        it is a liability). A table may appear in only one of the
        three; a delete matching no rows drops out of the txn (its
        table does not advance). If EVERY write degenerates this way,
        data-wise nothing commits — but with (writer, epoch) set an
        empty MARKER txn is still recorded so a replayed epoch stays a
        no-op (idempotence must survive the degenerate case: without
        the marker, a replay after new appends would re-run the
        deletes against data that arrived later); without writer/epoch
        the current seq is returned (-1 when the txn log is empty).
        Optimistic concurrency: racing catalog writers are
        serialized by the txn CAS; the loser discards its staged files
        and retries against the new state. With (writer, epoch) set, a
        replayed epoch returns its original seq without re-committing —
        the foreachBatch exactly-once contract, catalog-wide.

        Returns the committed txn seq."""
        overwrites = overwrites or {}
        appends = appends or {}
        deletes = deletes or {}
        if not overwrites and not appends and not deletes:
            raise ValueError("transaction has no writes")
        groups = [set(overwrites), set(appends), set(deletes)]
        for i in range(len(groups)):
            for j in range(i + 1, len(groups)):
                both = groups[i] & groups[j]
                if both:
                    raise ValueError(
                        "tables in more than one write group: "
                        f"{sorted(both)}"
                    )
        if writer is not None and epoch is not None:
            seen = self.epoch_committed(writer, epoch)
            if seen is not None:
                return seen
        last: TxnConflict | None = None
        for _ in range(max_retries):
            self.roll_forward()
            parent_seq = self.latest_seq()
            prev_versions = (
                dict(self._read_txn(parent_seq)["table_versions"])
                if parent_seq is not None
                else {}
            )
            prepared: dict[str, dict] = {}
            try:
                for name, df in overwrites.items():
                    prepared[name] = self.table(name).prepare_commit(
                        df, mode="overwrite", writer=writer, epoch=epoch
                    )
                for name, df in appends.items():
                    prepared[name] = self.table(name).prepare_commit(
                        df, mode="append", writer=writer, epoch=epoch
                    )
                for name, spec in deletes.items():
                    if isinstance(spec, str):
                        spec = {"predicate": spec}
                    p = self.table(name).prepare_delete_where(
                        spec["predicate"],
                        prune=spec.get("prune"),
                        prune_eq=spec.get("prune_eq"),
                        writer=writer,
                        epoch=epoch,
                    )
                    if not p.get("no_match"):  # no-match: table skips txn
                        prepared[name] = p
                if not prepared and writer is None and epoch is None:
                    # every write degenerated to a no-op delete and there
                    # is no epoch to mark: nothing to record
                    return parent_seq if parent_seq is not None else -1
                # fully-degenerate EPOCH: commit an empty marker txn so
                # the (writer, epoch) replay check stays authoritative
                seq = (parent_seq if parent_seq is not None else -1) + 1
                table_versions = dict(prev_versions)
                tables = {}
                for name, p in prepared.items():
                    manifest = {
                        k: p[k]
                        for k in (
                            "files", "schema", "operation", "writer",
                            "epoch", "rows", "parent", "cdf",
                        )
                    }
                    tables[name] = {
                        "version": p["version"],
                        "manifest": manifest,
                    }
                    table_versions[name] = p["version"]
                record = {
                    "seq": seq,
                    "writer": writer,
                    "epoch": epoch,
                    "tables": tables,
                    "table_versions": table_versions,
                }
                self._try_commit_txn(seq, record)
            except BaseException as e:
                # ANY failure before the txn CAS lands — conflict,
                # schema-evolution rejection, a Spark error staging one
                # of the tables — discards EVERY table's staged files:
                # all-or-nothing applies to the failure path too
                for p in prepared.values():
                    t = VersionedTable(self.spark, p["table_root"])
                    t.discard_prepared(p)
                if not isinstance(e, (TxnConflict, CommitConflict)):
                    raise
                last = e if isinstance(e, TxnConflict) else TxnConflict(
                    (parent_seq or 0) + 1
                )
                continue
            self._publish_txn(record)
            return seq
        raise last or TxnConflict((self.latest_seq() or 0) + 1)

    # ------------------------------------------------------------------
    # read path

    def snapshot(self, seq: int | None = None) -> dict[str, int]:
        """The catalog state after txn ``seq`` (default latest): every
        member table's version, resolved from ONE txn record — the
        cross-table-consistent view, time-travelable by seq."""
        self.roll_forward()
        if seq is None:
            seq = self.latest_seq()
            if seq is None:
                raise FileNotFoundError(f"no committed txn under {self.root}")
        return dict(self._read_txn(seq)["table_versions"])

    def read(self, name: str, seq: int | None = None) -> DataFrame:
        """Table ``name`` at the version the txn-``seq`` snapshot pins —
        reads through the same snapshot are mutually consistent."""
        versions = self.snapshot(seq)
        if name not in versions:
            raise KeyError(f"table {name!r} not in catalog snapshot")
        return self.table(name).read(version=versions[name])

    def create_views(
        self, seq: int | None = None, prefix: str = ""
    ) -> dict[str, int]:
        """Register every member table as a temp view pinned to ONE
        catalog snapshot, so plain ``spark.sql`` joins across them are
        cross-table consistent (and stay so — the views hold the
        snapshot's immutable file lists even as new txns commit).
        Returns the {table: version} map that was pinned."""
        versions = self.snapshot(seq)
        for name, v in versions.items():
            self.table(name).read(version=v).createOrReplaceTempView(
                f"{prefix}{name}"
            )
        return versions

    # ------------------------------------------------------------------
    # maintenance

    def vacuum(self, keep_last_txns: int = 1) -> dict:
        """Catalog-coherent retention: drop all but the newest
        ``keep_last_txns`` txn records, then vacuum every member table
        down to exactly the versions the KEPT txns reference — so every
        kept catalog snapshot stays fully readable and everything older
        is reclaimed TOGETHER (vacuuming tables independently of the
        txn log would leave records pointing at deleted versions, or
        versions no record can ever resolve again)."""
        if keep_last_txns < 1:
            raise ValueError("keep_last_txns must be >= 1")
        self.roll_forward()
        ts = self.txns()
        drop, keep = ts[:-keep_last_txns], ts[-keep_last_txns:]
        result: dict = {"dropped_txns": drop, "tables": {}}
        if not keep:
            return result
        # oldest kept record's cumulative map = the floor version each
        # table must keep for every kept snapshot to resolve
        floor = self._read_txn(keep[0])["table_versions"]
        for name in self._read_txn(keep[-1])["table_versions"]:
            t = self.table(name)
            versions = t.versions()
            keep_count = len(
                [v for v in versions if v >= floor.get(name, versions[0])]
            )
            if 0 < keep_count < len(versions):
                result["tables"][name] = t.vacuum(keep_last=keep_count)
        for s in drop:
            os.remove(self._txn_path(s))
        return result

    def history(self) -> list[dict]:
        """Txn audit trail: seq, writer/epoch, tables touched."""
        out = []
        for s in self.txns():
            r = self._read_txn(s)
            out.append(
                {
                    "seq": s,
                    "writer": r.get("writer"),
                    "epoch": r.get("epoch"),
                    "tables": {
                        n: e["version"] for n, e in r["tables"].items()
                    },
                }
            )
        return out
