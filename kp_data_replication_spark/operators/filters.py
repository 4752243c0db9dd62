"""Topic selection & routing operators (SURVEY.md §2.2 F1-F3, F5-F6; §2.7 U1).

The reference selects what to replicate with regex whitelists/blacklists
(`source->target.topics=products`, docs/index.md:42-50; `topicsPattern`
mirror-maker-2/local-cluster/kafka-to-es-mm2.yml:44; default blacklist of
config-like topics docs/index.md:44-50), renames replicated topics with a
cluster prefix (`kp-remote.kp-topic-1`, docs/consideration.md:29-35), and
fans multiple replicas back in with a regex subscription
(`subscribe("^.*accounts")`, docs/consideration.md:29-35).

All of these are plain Catalyst-friendly filters/projections: `rlike`
predicates are evaluated inside WholeStageCodegen and — when the filter
column is a partition/file-pruning column — prune the scan itself.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# MM2's default blacklist excludes internal/config topics
# (docs/index.md:44-50: ".*\.internal, .*\.replica, __consumer_offsets ...").
DEFAULT_BLACKLIST = r"(^__.*|.*\.internal$|.*\.replica$)"


def topic_whitelist(df: DataFrame, pattern: str, col: str = "source_topic") -> DataFrame:
    """F1: include only topics matching the Java-regex whitelist."""
    return df.filter(F.col(col).rlike(pattern))


def topic_blacklist(
    df: DataFrame, pattern: str = DEFAULT_BLACKLIST, col: str = "source_topic"
) -> DataFrame:
    """F2: exclude config-like topics (default MM2 blacklist)."""
    return df.filter(~F.col(col).rlike(pattern))


def select_topics(
    df: DataFrame,
    whitelist: str | None = None,
    blacklist: str | None = DEFAULT_BLACKLIST,
    col: str = "source_topic",
) -> DataFrame:
    """Combined topic selection as applied per replication flow."""
    if whitelist:
        df = topic_whitelist(df, whitelist, col)
    if blacklist:
        df = topic_blacklist(df, blacklist, col)
    return df


def cluster_prefix(
    df: DataFrame,
    source_alias: str,
    col: str = "source_topic",
    out_col: str = "target_topic",
    separator: str = ".",
) -> DataFrame:
    """F5: DefaultReplicationPolicy rename ``<alias><sep><topic>``
    (docs/consideration.md:29-35, `replication.policy.separator`
    docs/mm2-vm-install.md:142). Prevents bi-directional replication loops.
    """
    return df.withColumn(out_col, F.concat(F.lit(source_alias + separator), F.col(col)))


def fan_in_union(frames: list[DataFrame]) -> DataFrame:
    """U1/F6: regex-subscription fan-in — union the local topic with every
    cluster-prefixed replica (docs/consideration.md:29-35). Schemas may have
    evolved at different rates per cluster, hence allowMissingColumns.
    """
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frames)
