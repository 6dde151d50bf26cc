"""Lakehouse-format sink adapter: Delta / Iceberg when available, parquet
job-commit otherwise.

The reference's write path promises atomic visibility + exactly-once
appends (bigquery_write.go:466-485 finalize/batch-commit; :448-460 offset
acks).  On a real cluster the production-grade carrier of that contract is
a table format with a transaction log — Delta Lake or Apache Iceberg —
whose commit protocol gives atomic multi-file visibility, snapshot
isolation, and idempotent re-runs (the same guarantees sinks/atomic.py
builds by hand over bare parquet).

Neither format's JVM package ships in this container, so this module is a
**gated integration**: format detection is real, the write plumbing is
real, and when no lakehouse format is importable it degrades to the
parquet job-commit path (still atomic per job via the FileOutputCommitter
_SUCCESS protocol — SURVEY §2.2 K4).  On a cluster with
``io.delta:delta-spark`` or ``org.apache.iceberg:iceberg-spark-runtime``
on the classpath, the same call lands in the real thing.

**Environmental seam, verified 2026-08 (r12, like the PIL seam in
operators/multimodal.py):** installing Delta in this container was
attempted and is impossible — no ``delta-spark`` wheel or Delta jar is
baked in (pyspark ships 287 jars, none Delta/Iceberg), and the container
has no network route to Maven/PyPI (``repo1.maven.org`` does not
resolve), so ``spark.jars.packages`` cannot fetch either.  The real-Delta
commit-semantics test exists and self-gates:
``tests/test_sinks.py::test_lakehouse_real_delta_commit_semantics`` runs
the full txn-log contract (``_delta_log`` JSON commits, append
atomicity, overwrite-as-new-snapshot) whenever ``available_formats``
reports delta, and skips with this seam's message otherwise — exactly
one skip in this container, zero on a provisioned cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def available_formats(spark: SparkSession) -> list[str]:
    """Probe which lakehouse table formats this session can actually write.

    Delta: the ``delta`` Python package plus its SQL extension jar.
    Iceberg: a configured Spark catalog whose implementation class is
    Iceberg's ``SparkCatalog``.  Parquet job-commit is always available.
    """
    fmts = []
    try:
        import delta  # noqa: F401

        # The pip package alone is not enough — the session needs the
        # Delta jar on the JVM classpath, or format("delta") throws
        # DATA_SOURCE_NOT_FOUND at write time instead of degrading here.
        jvm = spark._jvm
        if jvm is not None and jvm.org.apache.spark.util.Utils.classIsLoadable(
            "org.apache.spark.sql.delta.sources.DeltaDataSource"
        ):
            fmts.append("delta")
    except Exception:
        pass
    # Catalogs may be configured at runtime (spark.conf.set), which the
    # frozen SparkContext conf never sees — read the live SQL conf.
    try:
        catalog_rows = spark.sql("SET").collect()
        if any(
            r.key.startswith("spark.sql.catalog") and "org.apache.iceberg" in (r.value or "")
            for r in catalog_rows
        ):
            fmts.append("iceberg")
    except Exception:
        pass
    fmts.append("parquet")
    return fmts


def lakehouse_write(
    df: DataFrame,
    path: str,
    mode: str = "append",
    table_format: str | None = None,
    partition_by: list[str] | None = None,
) -> str:
    """Write ``df`` to ``path`` in the best available table format.

    Returns the format actually used.  ``table_format=None`` auto-selects
    (delta > iceberg > parquet); naming one that isn't available raises —
    silently downgrading an exactly-once sink to a weaker one is how
    pipelines double-write.

    All three paths are driver-light: the data never routes through the
    driver, and the commit is the format's own protocol (Delta txn log /
    Iceberg snapshot / _SUCCESS marker).
    """
    spark = df.sparkSession
    fmts = available_formats(spark)
    chosen = table_format or fmts[0]
    if chosen not in fmts:
        raise ValueError(
            f"table format {chosen!r} not available in this session "
            f"(available: {fmts}); add its package to spark.jars.packages"
        )
    writer = df.write.format(chosen).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
    return chosen
