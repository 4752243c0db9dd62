"""Catalog: one atomic pointer over MANY tables — consistent cross-table
snapshots for multi-topic replication.

The reference replicates many topics per flow (mirror-maker-2 configs run
whole whitelists), and a consumer reading several replicated topics sees
each advance independently — Kafka gives no cross-topic atomicity, and the
TopicRouter inherits that: each topic's TableStore commits on its own, so
a reader joining two target tables mid-epoch can observe topic A at the
new version and topic B at the old one (a torn cross-table snapshot).
Lakehouse catalogs fix exactly this (Iceberg REST-catalog multi-table
transactions / Nessie commits): publish every table's new version behind
ONE atomic pointer swap, and have readers resolve versions through the
catalog instead of each table's own head.

Mechanics (same file discipline as TableStore):

  _catalog/
    v{n}.json        # {"tables": {name: version}, "writers": {id: epoch}}
    _current         # {"version": n} — os.replace'd atomically

* ``commit(updates, writer_id, epoch)`` carries every unlisted table
  forward unchanged — a catalog version is a TOTAL snapshot, not a delta.
* Writer-scoped epoch fencing mirrors the tables': a replayed epoch
  no-ops. The crash windows compose cleanly with per-table fencing:
    - crash BETWEEN table commits: the catalog still points at the old
      versions of every table — catalog readers keep a consistent (stale)
      view; on resume the committed tables fence to noops, the rest
      commit, then the catalog advances once.
    - crash AFTER all table commits, BEFORE the catalog commit: same —
      tables are ahead of the catalog, readers are stale-but-consistent;
      the resumed epoch re-derives the identical table-version map and
      the catalog commit lands (its writer map shows the epoch never
      committed, so it is not fenced).
* Reads: ``snapshot()`` returns the table->version map;
  ``read(spark, name)`` opens that table AS OF its catalog version via
  the stores' existing time travel — torn reads are impossible by
  construction because one catalog version never mixes epochs.

Scale: the catalog file is O(tables) json and the swap is one rename —
per-epoch cost is independent of data volume. At multi-driver scale the
pointer swap becomes a catalog-service CAS (Iceberg REST / Nessie), the
snapshot contract unchanged.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from .table_store import TableStore


class Catalog:
    def __init__(self, root: str):
        self.root = root

    # ---------- pointers ----------
    @property
    def _pointer(self) -> str:
        return os.path.join(self.root, "_current")

    def _vpath(self, version: int) -> str:
        return os.path.join(self.root, f"v{version}.json")

    def current_version(self) -> int:
        try:
            with open(self._pointer) as f:
                return json.load(f)["version"]
        except FileNotFoundError:
            return 0

    def _doc(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        if v <= 0:
            return {"tables": {}, "writers": {}}
        with open(self._vpath(v)) as f:
            return json.load(f)

    def writer_epoch(self, writer_id: str) -> int:
        """Last epoch this writer published (-1 if none — epoch 0 must
        not be fenced on a fresh catalog)."""
        return int(self._doc().get("writers", {}).get(writer_id, -1))

    # ---------- commit ----------
    def _write_lock(self):
        """Exclusive advisory lock serializing catalog commits — the same
        mechanism (and the same multi-host caveat) as TableStore's: two
        concurrent publishers would otherwise both read version N, both
        write v(N+1).json, and the last pointer swap silently drops the
        other's table updates. Readers never take it."""
        import fcntl
        from contextlib import contextmanager

        @contextmanager
        def _lock():
            os.makedirs(self.root, exist_ok=True)
            fd = os.open(os.path.join(self.root, "_lock"), os.O_CREAT | os.O_RDWR)
            try:
                fcntl.flock(fd, fcntl.LOCK_EX)
                yield
            finally:
                fcntl.flock(fd, fcntl.LOCK_UN)
                os.close(fd)

        return _lock()

    def commit(
        self, updates: dict[str, int], writer_id: str = "default",
        epoch: int | None = None,
    ) -> int:
        """Publish a new catalog version: listed tables move to their given
        versions, every other table carries forward. Atomic (write-then-
        rename, same as the table pointer), SERIALIZED under the catalog
        write lock (concurrent publishers of different tables compose
        instead of clobbering); fenced per writer when ``epoch`` is given
        (a replayed epoch returns the current version without writing)."""
        with self._write_lock():
            return self._commit_locked(updates, writer_id, epoch)

    def _commit_locked(
        self, updates: dict[str, int], writer_id: str, epoch: int | None
    ) -> int:
        cur = self.current_version()
        doc = self._doc(cur)
        if epoch is not None and epoch <= int(
            doc.get("writers", {}).get(writer_id, -1)
        ):
            return cur  # fenced: this writer already published this epoch
        tables = dict(doc.get("tables", {}))
        tables.update({k: int(v) for k, v in updates.items()})
        writers = dict(doc.get("writers", {}))
        if epoch is not None:
            writers[writer_id] = int(epoch)
        new_v = cur + 1
        os.makedirs(self.root, exist_ok=True)
        tmp = self._vpath(new_v) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"tables": tables, "writers": writers}, f)
        os.replace(tmp, self._vpath(new_v))
        with open(self._pointer + ".tmp", "w") as f:
            json.dump({"version": new_v}, f)
        os.replace(self._pointer + ".tmp", self._pointer)
        return new_v

    # ---------- reads ----------
    def snapshot(self, version: int | None = None) -> dict[str, int]:
        """The consistent table->version map at a catalog version (current
        by default). Time travel: pass an older catalog version."""
        return dict(self._doc(version).get("tables", {}))

    def table_version(self, name: str, version: int | None = None) -> int | None:
        return self.snapshot(version).get(name)

    def read(
        self,
        spark: SparkSession,
        store: TableStore,
        name: str,
        version: int | None = None,
    ) -> DataFrame:
        """Open a table AS OF its version in the catalog snapshot — the
        torn-read-free path (never the table's own head)."""
        tv = self.table_version(name, version)
        if tv is None:
            raise KeyError(f"table {name!r} not in catalog snapshot")
        return store.read_state(spark, version=tv)
