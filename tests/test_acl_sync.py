"""ACL sync across a replication hop (SURVEY.md §2.11;
docs/security.md:171-188 `sync.topic.acls.enabled=true`, MM2 KIP-382
rules): literal topic bindings on replicated topics only, ALLOW WRITE
never propagated, ALLOW ALL downgraded to ALLOW READ, resource renamed
through the replication policy, additive on the target.
"""
from __future__ import annotations

import itertools
import json

from pyspark.sql import Row

from kp_data_replication_spark.operators.acl_sync import (
    ACL_COLUMNS,
    replicate_binding,
    sync_grants,
    sync_topic_acls,
)
from kp_data_replication_spark.sources.table_store import TableStore


def _lattice():
    """Every combination over the rule-relevant axes — the full decision
    lattice both implementations must agree on."""
    rows = []
    for rtype, ptype, op, perm, topic in itertools.product(
        ["topic", "group", "cluster"],
        ["literal", "prefixed"],
        ["read", "write", "describe", "all", "create"],
        ["allow", "deny"],
        ["orders", "orders.internal", "payments"],
    ):
        rows.append({
            "resource_type": rtype,
            "resource_name": topic,
            "pattern_type": ptype,
            "principal": "User:CN=alice",
            "operation": op,
            "permission": perm,
            "host": "*",
        })
    return rows


def test_rules_write_dropped_all_downgraded_literal_topics_only(spark):
    out = sync_topic_acls(
        spark.createDataFrame([Row(**r) for r in _lattice()]),
        "dc2", whitelist="^orders", blacklist=r".*\.internal$",
    ).collect()
    got = {tuple(r[c] for c in ACL_COLUMNS) for r in out}
    # only topic+literal survive; only 'orders' passes white+blacklist
    assert all(t[0] == "topic" and t[2] == "literal" for t in got)
    assert {t[1] for t in got} == {"dc2.orders"}
    ops_by_perm = {
        perm: {t[4] for t in got if t[5] == perm} for perm in ("allow", "deny")
    }
    # ALLOW: write dropped, all downgraded to read (collides with read)
    assert ops_by_perm["allow"] == {"read", "describe", "create"}
    # DENY: passes through untouched, including write and all
    assert ops_by_perm["deny"] == {"read", "write", "describe", "all", "create"}


def test_python_twin_matches_dataframe_form(spark):
    lattice = _lattice()
    df_out = sync_topic_acls(
        spark.createDataFrame([Row(**r) for r in lattice]),
        "dc2", whitelist="^orders", blacklist=r".*\.internal$",
    ).collect()
    df_set = {tuple(r[c] for c in ACL_COLUMNS) for r in df_out}
    py_set = set()
    for b in lattice:
        out = replicate_binding(
            b, "dc2", whitelist="^orders", blacklist=r".*\.internal$"
        )
        if out is not None:
            py_set.add(tuple(out[c] for c in ACL_COLUMNS))
    assert py_set == df_set and py_set


def test_store_grants_roundtrip_and_sync(tmp_path):
    src = TableStore(str(tmp_path / "src"))
    dst = TableStore(str(tmp_path / "dst"))
    src.grant("User:CN=kp-consumer-1", "read", "kp-topic-1")
    src.grant("User:CN=kp-consumer-1", "describe", "kp-topic-1")
    src.grant("User:CN=kp-consumer-1", "write", "kp-topic-1")  # not synced
    src.grant("User:CN=kp-consumer-2", "all", "kp-topic-2")    # -> read
    src.grant("User:CN=kp-users", "read", "kp-users", resource_type="group")
    src.grant("User:CN=kp-consumer-1", "read", "kp-topic-1")  # idempotent
    assert len(src.grants()) == 5

    out = sync_grants(src, dst, "kp-remote", whitelist="^kp-topic")
    assert out == {"n_source": 5, "n_applied": 3}
    got = {(g["resource_name"], g["principal"], g["operation"])
           for g in dst.grants()}
    # docs/security.md:185-188 shows exactly this: the consumer's
    # Read/Describe land on the renamed remote topic, its Write does not
    assert got == {
        ("kp-remote.kp-topic-1", "User:CN=kp-consumer-1", "read"),
        ("kp-remote.kp-topic-1", "User:CN=kp-consumer-1", "describe"),
        ("kp-remote.kp-topic-2", "User:CN=kp-consumer-2", "read"),
    }

    # re-sync is a no-op; source revoke does NOT propagate (additive, MM2)
    assert sync_grants(src, dst, "kp-remote", whitelist="^kp-topic") == {
        "n_source": 5, "n_applied": 0,
    }
    assert src.revoke(principal="User:CN=kp-consumer-1", operation="read",
                      resource_name="kp-topic-1")
    assert len(src.grants()) == 4
    sync_grants(src, dst, "kp-remote", whitelist="^kp-topic")
    assert len(dst.grants()) == 3  # downstream grant survives


def test_engine_syncs_acls_per_epoch(spark, tmp_path):
    from pyspark.sql import functions as F

    from kp_data_replication_spark.streaming.apply import (
        CdcApplyEngine,
        EngineConfig,
    )

    src_meta = TableStore(str(tmp_path / "src_meta"))
    src_meta.grant("User:CN=c1", "read", "repos")
    src_meta.grant("User:CN=c1", "write", "repos")

    store = TableStore(str(tmp_path / "t"), n_buckets=4)
    engine = CdcApplyEngine(store, EngineConfig(
        metrics=False, acl_sync_source=src_meta.root, acl_sync_alias="src",
    ))
    img = F.struct(
        F.lit("r").alias("repo"), F.col("id").cast("string").alias("path"),
        F.lit("c0").alias("commit"), F.lit("en").alias("lang"),
        F.lit("x").alias("content"),
    )
    batch = spark.range(10).select(
        F.lit(0).alias("partition"), F.col("id").alias("lsn"),
        F.lit("c").alias("op"), F.lit(None).cast(
            "struct<repo:string,path:string,commit:string,lang:string,content:string>"
        ).alias("before"), img.alias("after"),
        F.lit(None).cast("timestamp").alias("ts_ms"),
        F.lit(None).cast("map<string,string>").alias("headers"),
        F.lit("repos").alias("source_topic"),
    )
    s1 = engine.apply_batch(batch, 0)
    assert s1["acls_applied"] == 1  # read synced, write dropped
    assert [(g["resource_name"], g["operation"]) for g in store.grants()] == [
        ("src.repos", "read")
    ]
    # next epoch: a new source grant arrives (MM2 periodic pickup)
    src_meta.grant("User:CN=c2", "describe", "repos")
    batch2 = batch.withColumn("lsn", F.col("lsn") + 100)
    s2 = engine.apply_batch(batch2, 1)
    assert s2["acls_applied"] == 1
    assert len(store.grants()) == 2


def test_cli_acl_roundtrip(tmp_path, capsys):
    from kp_data_replication_spark.cli import main

    src, dst = str(tmp_path / "a"), str(tmp_path / "b")
    main([
        "acl", src, "grant", "--principal", "User:CN=u", "--operation",
        "read", "--resource", "kp-topic-1",
    ])
    main(["acl", src, "grant", "--principal", "User:CN=u", "--operation",
          "write", "--resource", "kp-topic-1"])
    main(["acl", dst, "sync", "--source", src, "--alias", "kp-remote",
          "--topics", "^kp-topic"])
    main(["acl", dst, "list"])
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert lines[2] == {"n_source": 2, "n_applied": 1}
    assert lines[3][0]["resource_name"] == "kp-remote.kp-topic-1"
    main(["acl", src, "revoke", "--principal", "User:CN=u", "--operation",
          "write", "--resource", "kp-topic-1"])
    assert json.loads(capsys.readouterr().out)["revoked"] is True
