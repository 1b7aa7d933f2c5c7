"""Source/sink layout utilities for scale.

The reference reads whatever the Spark catalog serves (SURVEY.md §2.B
scans). At 100 TB the *layout* of those sources decides whether joins
shuffle: this package owns bucketed table writes (shuffle-free
co-located joins), salted-join helpers for skewed keys, and partitioned
layout helpers for pruning.
"""

from spark_sql_server_spark.sources.layout import (
    salted_join,
    write_bucketed,
    write_partitioned,
)

__all__ = ["write_bucketed", "write_partitioned", "salted_join"]
