"""ACL synchronization across a replication hop (SURVEY.md §2.11).

The reference enables MirrorMaker 2's ACL sync with
``sync.topic.acls.enabled=true`` (docs/security.md:171-188) and then shows
the contract from the outside: the consumer's Read/Describe grants on the
source topic exist, and the renamed remote topic starts with no ACLs until
the sync runs. The sync semantics themselves are MM2's public KIP-382
behavior (MirrorSourceConnector.syncTopicAcls):

  - only LITERAL **topic** bindings for topics the flow replicates (the
    same topic filter as the data path) are considered;
  - an ``ALLOW WRITE`` binding is **never** propagated — only the
    replicator itself may write a remote topic;
  - ``ALLOW ALL`` is **downgraded to ALLOW READ** — remote topics are
    read-only from the consumer's point of view;
  - the resource is renamed through the replication policy
    (``alias.topic`` — the same DefaultReplicationPolicy rename the data
    path uses, operators/filters.py:cluster_prefix);
  - the sync is **additive**: bindings are created on the target, never
    deleted (revoking at the source does not revoke downstream).

Two faithful forms live here, parity-tested against each other:

:func:`sync_topic_acls`
    The declarative DataFrame form — one Catalyst filter + projection +
    distinct, used by the ``cdc_acl_sync`` oracle query. At scale ACLs are
    control-plane metadata (thousands of rows, not billions), but the
    DataFrame form matters because it is the one you'd run as a JOIN
    against a billion-row audit log ("which events were readable by whom
    after the hop") — the rules must live in the plan, not in a driver
    loop, for that composition to stay distributed.

:func:`replicate_binding` + :meth:`TableStore grants <...>`
    The plain-Python twin used by the metadata path:
    ``TableStore.grant/revoke/grants`` persist bindings one file per
    binding under ``_grants.d/`` (same atomic-replace-per-entry pattern as
    the consumer registry — two concurrent granters can never lose each
    other's entry), and ``sync_grants`` replicates a source store's
    grants into a target store through the same rules. The apply engine
    runs it per epoch when ``EngineConfig.acl_sync_source`` is set —
    MM2's periodic sync re-expressed as an epoch-time metadata step.

Normalization: operations / permissions / resource types / pattern types
compare case-insensitively and are emitted lower-case; the downgrade can
make two source bindings collide (READ + ALL -> two READs), hence the
``distinct``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: canonical column order for an ACL binding frame
ACL_COLUMNS = [
    "resource_type",
    "resource_name",
    "pattern_type",
    "principal",
    "operation",
    "permission",
    "host",
]


def sync_topic_acls(
    acls: DataFrame,
    source_alias: str,
    whitelist: str | None = None,
    blacklist: str | None = None,
    separator: str = ".",
) -> DataFrame:
    """The bindings a target cluster receives when ACL sync runs over
    ``acls`` (columns :data:`ACL_COLUMNS`) for the flow replicating
    topics selected by ``whitelist``/``blacklist``.

    Pure filter + projection + distinct: predicate pushdown reaches the
    scan, and the distinct is the only exchange — over the post-filter
    binding set, which is control-plane sized by construction.
    """
    opn = F.lower(F.col("operation"))
    perm = F.lower(F.col("permission"))
    df = acls.filter(
        (F.lower(F.col("resource_type")) == "topic")
        & (F.lower(F.col("pattern_type")) == "literal")
        & ~((perm == "allow") & (opn == "write"))
    )
    if whitelist:
        df = df.filter(F.col("resource_name").rlike(whitelist))
    if blacklist:
        df = df.filter(~F.col("resource_name").rlike(blacklist))
    out_op = (
        F.when((perm == "allow") & (opn == "all"), F.lit("read"))
        .otherwise(opn)
    )
    return df.select(
        F.lit("topic").alias("resource_type"),
        F.concat(
            F.lit(source_alias + separator), F.col("resource_name")
        ).alias("resource_name"),
        F.lit("literal").alias("pattern_type"),
        F.col("principal"),
        out_op.alias("operation"),
        perm.alias("permission"),
        F.col("host"),
    ).distinct()


def replicate_binding(
    binding: dict,
    source_alias: str,
    whitelist: str | None = None,
    blacklist: str | None = None,
    separator: str = ".",
) -> dict | None:
    """Plain-Python twin of :func:`sync_topic_acls` for ONE binding:
    returns the target-side binding, or ``None`` when the binding is not
    replicated. Keys as in :data:`ACL_COLUMNS`; parity with the DataFrame
    form is asserted by test over the full rule lattice."""
    import re

    rtype = str(binding.get("resource_type", "")).lower()
    ptype = str(binding.get("pattern_type", "")).lower()
    opn = str(binding.get("operation", "")).lower()
    perm = str(binding.get("permission", "")).lower()
    name = str(binding.get("resource_name", ""))
    if rtype != "topic" or ptype != "literal":
        return None
    if perm == "allow" and opn == "write":
        return None
    # java-regex semantics used by the data path's rlike: unanchored search
    if whitelist and not re.search(whitelist, name):
        return None
    if blacklist and re.search(blacklist, name):
        return None
    return {
        "resource_type": "topic",
        "resource_name": f"{source_alias}{separator}{name}",
        "pattern_type": "literal",
        "principal": str(binding.get("principal", "")),
        "operation": "read" if (perm == "allow" and opn == "all") else opn,
        "permission": perm,
        "host": str(binding.get("host", "*")),
    }


def sync_grants(
    source_store,
    target_store,
    source_alias: str,
    whitelist: str | None = None,
    blacklist: str | None = None,
    separator: str = ".",
) -> dict:
    """Replicate the source store's persisted grants into the target store
    (additive, idempotent — MM2 creates bindings downstream, never deletes
    them). Driver-side O(grants): grants are table-level control-plane
    metadata, not data rows."""
    existing = {_binding_key(b) for b in target_store.grants()}
    n_new = 0
    for b in source_store.grants():
        out = replicate_binding(
            b, source_alias, whitelist=whitelist, blacklist=blacklist,
            separator=separator,
        )
        if out is None or _binding_key(out) in existing:
            continue
        target_store.grant(**out)
        existing.add(_binding_key(out))
        n_new += 1
    return {"n_source": len(source_store.grants()), "n_applied": n_new}


def _binding_key(b: dict) -> tuple:
    return tuple(str(b.get(c, "")).lower() for c in ACL_COLUMNS[:3]) + tuple(
        str(b.get(c, "")) for c in ACL_COLUMNS[3:4]
    ) + tuple(str(b.get(c, "")).lower() for c in ACL_COLUMNS[4:])
