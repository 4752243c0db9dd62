"""Consumer-group failover across a replication hop — the MM2
``RemoteClusterUtils.translateOffsets`` / ``MirrorClient`` analogue.

Reference semantics (docs/consideration.md:37-48): MM2's checkpoint
connector exists so that when the primary cluster dies, a consumer group
can MOVE to the replica and resume from the translated offset instead of
reprocessing from earliest or (worse) skipping ahead. The checkpoint
topic holds sparse (source offset -> target offset) sync points; failover
is an as-of lookup over them, then a seek on the target cluster.

The lakehouse analogue here: a replica maintained by
:func:`~.changefeed.cascade_catchup` already RECORDS the checkpoint table
for free — every replica commit stamps the applied source version into
the manifest's writer-fencing map under ``cascade:<src root>`` (the Delta
txnAppId pattern). Walking the replica's manifest history therefore
yields the full (replica version <-> source version) sync table with no
extra bookkeeping, and translation is pure O(#versions) driver-side
metadata — no data files are opened, exactly like MM2's checkpoint topic
being metadata beside the mirrored data.

Downstream consumers track their position the same way (a cascade B -> C
stores "last applied B-version" in C's writer map; a dedup index / agg
view stores its source version in its own store). Failover re-points such
a consumer from dead source A to replica B:

  1. read the consumer's committed A-position ``k``;
  2. as-of translate: the greatest replica version ``v*`` whose applied
     source version ``s(v*) <= k`` (sync points are sparse — empty/echo
     source versions never commit on the replica, so translation rounds
     DOWN and the overlap ``(s(v*), k]`` is replayed; full-image upserts
     and keyed deletes make that replay value-idempotent — the same
     at-least-once contract as MM2's offset rounding);
  3. seed the consumer's writer-fencing entry for the NEW flow
     (``cascade:<B root>`` at epoch ``v*``) with a metadata-only commit,
     and register the consumer on B for vacuum retention pinning.

Replica lag surfaces, never hides: if the consumer was AHEAD of the
replica (A died before replicating everything the consumer saw),
``unreplicated = k - s(v*)`` > 0 is returned — those source versions are
lost with A (MM2 has the identical failure mode for unreplicated
offsets) and the caller decides whether the consumer's extra rows need
reconciliation. Foreign data versions on the replica (a second writer in
a bidirectional topology) are detected from the writer-map delta and
clamp the resume point so no foreign change can be skipped.
"""

from __future__ import annotations

import os

from ..sources.table_store import TableStore


def cascade_writer_id(src_root: str) -> str:
    """The writer-fencing id :func:`~.changefeed.cascade_catchup` uses for
    a flow whose SOURCE is ``src_root`` (kept in one place so failover and
    cascade can never drift apart)."""
    return f"cascade:{os.path.abspath(src_root)}"


def sync_points(replica: TableStore, src_root: str) -> list[dict]:
    """The (replica version <-> source version) checkpoint table.

    One row per replica commit that ADVANCED the cascade's applied source
    version (the writer-map delta vs the previous manifest). Maintenance
    commits (rewrite / purge / rebucket keep the writer map unchanged) and
    foreign-writer commits are classified, not dropped:

      returns rows ``{replica_version, source_version, kind}`` where kind
      is ``sync`` (cascade advanced), ``maintenance`` (no writer advanced:
      physical-only, changefeed-empty by construction), or ``foreign``
      (another writer advanced — data not derived from ``src_root``).

    Pure manifest metadata: O(#versions) small JSON reads, no data files.
    At scale this is the same cost class as Delta ``DESCRIBE HISTORY``.
    """
    writer = cascade_writer_id(src_root)
    out: list[dict] = []
    prev: dict[str, int] = {}
    for v in replica.versions():
        m = replica.manifest(v)
        if m is None:  # vacuumed below the retained floor
            continue
        cur = dict(m.get("writers") or {})
        if not cur:  # legacy single-writer manifest
            cur = {"default": m["epoch"]}
        advanced = {w for w, e in cur.items() if e > prev.get(w, -1)}
        if writer in advanced:
            kind = "sync"
        elif advanced:
            kind = "foreign"
        else:
            kind = "maintenance"
        out.append({
            "replica_version": v,
            "source_version": cur.get(writer, -1),
            "kind": kind,
        })
        prev = cur
    return out


def translate_version(
    replica: TableStore, src_root: str, source_version: int
) -> dict:
    """As-of translate a committed SOURCE version to a replica resume
    point: the greatest replica version whose applied source version is
    ``<= source_version`` (0 = replay the replica's feed from the start).

    Returns ``{replica_version, source_high, unreplicated,
    foreign_versions}``:

      * ``source_high`` — the source version the resume point actually
        covers (``<= source_version``; the gap is replayed, idempotently).
      * ``unreplicated`` — ``source_version - source_high`` when the
        consumer was AHEAD of the replica (source died before fully
        replicating): those changes are lost with the source and the
        caller must know.
      * ``foreign_versions`` — ALL replica versions committed by OTHER
        writers: the resume point is clamped to just before the first
        one, because a consumer resuming past it would never see that
        writer's changes. Empty for the plain primary->replica topology.

    ``unreplicated`` is an upper bound in version-number space: a dead
    source cannot be consulted, so source versions that were empty /
    maintenance-only (and therefore never committed on the replica)
    inflate the count — the same conservatism as MM2 reporting the raw
    offset gap for unreplicated records.
    """
    pts = sync_points(replica, src_root)
    foreign = [p["replica_version"] for p in pts if p["kind"] == "foreign"]
    ceiling = min(foreign) - 1 if foreign else None
    best_v, best_s = 0, -1
    for p in pts:
        if p["kind"] != "sync":
            continue
        v, s = p["replica_version"], p["source_version"]
        if s <= source_version and (ceiling is None or v <= ceiling):
            if s > best_s:
                best_v, best_s = v, s
    return {
        "replica_version": best_v,
        "source_high": best_s if best_s >= 0 else 0,
        "unreplicated": max(0, source_version - max(best_s, 0)),
        "foreign_versions": foreign,
    }


def failover_consumer(
    consumer: TableStore, old_src_root: str, new_src: TableStore
) -> dict:
    """Re-point a cascade consumer from dead source A to replica B.

    ``consumer`` is the downstream table C whose writer map holds its
    A-position (``cascade:<A root>`` — written by every
    :func:`~.changefeed.cascade_catchup` commit of the A -> C flow).
    After this call, ``cascade_catchup(spark, new_src, C_engine)`` resumes
    the flow as B -> C from the translated position: the overlap is
    replayed idempotently, nothing is skipped.

    Seeding is a METADATA-ONLY commit on C (no data files, buckets
    unchanged — downstream feeds see an empty diff and skip it), which
    also makes the failover itself crash-safe: re-running it is fenced by
    the same writer-epoch check as any commit. C is registered on B for
    vacuum retention pinning, replacing its registration on dead A.
    """
    k = consumer.writer_epoch(cascade_writer_id(old_src_root))
    tr = translate_version(new_src, old_src_root, k) if k > 0 else {
        "replica_version": 0, "source_high": 0,
        "unreplicated": 0, "foreign_versions": [],
    }
    v_star = tr["replica_version"]
    new_writer = cascade_writer_id(new_src.root)
    seeded = False
    if v_star > 0 and v_star > consumer.writer_epoch(new_writer):
        schema = consumer.schema()
        if schema is None:
            raise ValueError(
                "consumer store has a committed position but no schema "
                "— corrupt or not a cascade destination"
            )
        consumer.commit(None, [], [], v_star, schema, writer_id=new_writer)
        seeded = True
    group = f"cascade:{os.path.abspath(consumer.root)}"
    if v_star > 0:
        new_src.record_consumer(group, v_star)
    return {
        "old_position": k,
        "resume_version": v_star,
        **{k2: v for k2, v in tr.items() if k2 != "replica_version"},
        "seeded": seeded,
    }
