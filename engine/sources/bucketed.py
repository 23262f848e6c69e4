"""Bucketed edge store: hash-bucketed, sort-clustered persistent edge tables.

At 10^12-edge scale every graph kernel (pagerank adj build, BFS frontier
joins, CC canonicalization, triangles, k-core) begins by hash-clustering the
raw edge table on `src` — a full shuffle of the biggest table in the system,
re-paid by every job that reads it. Spark's native answer is a bucketed
table: `bucketBy(n, "src").sortBy("src")` writes each bucket as its own file
set, and every later scan reports HashPartitioning(src, n) to Catalyst, so

- `groupBy("src")` aggregations (out-degree) run with NO exchange at all;
- src-keyed sort-merge joins shuffle ONLY the other side (the O(n) rank /
  frontier vector), never the O(m) edge table — across jobs and sessions,
  not just within one kernel's persist() scope;
- the sortBy clustering gives the scan outputOrdering(src), so sort-merge
  joins skip the edge-side sort too.

The shuffle is paid exactly once, at ingest time. This is the disk-backed,
cross-session analogue of the in-kernel `repartition(P, src).
sortWithinPartitions(src)` one-time prep in operators/pagerank.py:173-195.

Bucket-count sizing at 100 TB: buckets ≈ table_bytes / 256 MB, rounded to a
multiple of the executor-core count; too few buckets caps scan parallelism,
too many makes small files. The writer validates buckets >= 1 and leaves
sizing to the caller (cluster-specific).

Plan shapes are locked by tests/test_plans.py::test_bucketed_* (no Exchange
under the out-degree aggregate; exactly one Exchange — the rank side — in
the gather join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def catalog_conf(warehouse: str | None = None, metastore_dir: str | None = None) -> dict:
    """Session conf for a persistent table catalog.

    The default in-memory catalog registers bucketed-table metadata for the
    current process only. Passing `metastore_dir` switches to the built-in
    Hive/Derby catalog rooted there, so a table bucketized by one
    spark-submit job is resolvable by every later job — the cross-process
    contract the ingest-once story needs. (On a real cluster this would be
    the shared Hive metastore / Glue / Unity catalog endpoint instead.)"""
    conf: dict = {}
    if warehouse:
        conf["spark.sql.warehouse.dir"] = warehouse
    if metastore_dir:
        conf["spark.sql.catalogImplementation"] = "hive"
        conf["spark.hadoop.javax.jdo.option.ConnectionURL"] = (
            f"jdbc:derby:;databaseName={metastore_dir};create=true"
        )
    return conf


def write_bucketed_edges(
    edges: DataFrame,
    table: str,
    buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
    sort: bool = True,
) -> None:
    """Persist (src, dst, ...) as a parquet table bucketed (and by default
    sort-clustered) on src. `path` pins the table location (otherwise the
    session warehouse dir); the table is registered in the session catalog
    so `spark.table(table)` scans it bucket-aware."""
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    if "src" not in edges.columns:
        raise ValueError("edge table must have a 'src' column")
    w = edges.write.format("parquet").mode(mode).bucketBy(buckets, "src")
    if sort:
        w = w.sortBy("src")
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed_edges(spark: SparkSession, table: str) -> DataFrame:
    """Scan a bucketed edge table (bucket metadata flows into the plan)."""
    return spark.table(table)
