"""Connector-shaped reader API.

Mirrors ``NewBigQueryReader(ctx, client, project, dataset, table, opts)``
(bigquery.go:65-129) as a source-agnostic handle.  Offline, ``project`` is a
scale-factor directory and ``table`` a parquet file; on a real cluster the
``fmt="bigquery"`` branch hands the same options to the Spark BigQuery
connector (DSv2), which implements the identical Storage Read session +
pushdown protocol per executor.

The reference's per-batch pull loop (``Read()`` bigquery.go:152-182) has no
user-level equivalent in Spark — a DataFrame IS the stream of batches; the
driver-side analogue ``to_batches`` is provided for parity/testing only and
must never appear in a 100 TB plan (SURVEY §4: never collect unbounded data).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from bigquack_spark.sources.parquet import load_table


@dataclass
class Reader:
    """Handle over a pushdown-configured scan (BigQueryReader analogue).

    ``selected_fields`` ≅ TableReadOptions.SelectedFields (bigquery.go:80),
    ``row_restriction`` ≅ TableReadOptions.RowRestriction (bigquery.go:80),
    ``max_streams``     ≅ MaxStreamCount (bigquery.go:93) — a repartition
    hint; Spark consumes every partition (fixes SURVEY §2.1 S4).
    """

    spark: SparkSession
    location: str  # sf_dir offline; "project.dataset" for a live connector
    table: str
    selected_fields: list[str] | None = None
    row_restriction: str | None = None
    max_streams: int | None = None
    fmt: str = "parquet"
    _df: DataFrame | None = field(default=None, repr=False)

    def dataframe(self) -> DataFrame:
        if self._df is None:
            if self.fmt == "parquet":
                df = load_table(
                    self.spark,
                    self.location,
                    self.table,
                    columns=self.selected_fields,
                    predicate=self.row_restriction,
                )
            elif self.fmt == "bigquery":  # pragma: no cover - needs connector jar
                reader = self.spark.read.format("bigquery").option(
                    "table", f"{self.location}.{self.table}"
                )
                if self.row_restriction:
                    reader = reader.option("filter", self.row_restriction)
                if self.max_streams:
                    reader = reader.option("maxParallelism", str(self.max_streams))
                df = reader.load()
                if self.row_restriction:
                    df = df.filter(self.row_restriction)
                if self.selected_fields:
                    df = df.select(*self.selected_fields)
            else:
                raise ValueError(f"unknown source format: {self.fmt}")
            if self.max_streams and self.fmt == "parquet" and df.rdd.getNumPartitions() < self.max_streams:
                df = df.repartition(self.max_streams)
            self._df = df
        return self._df

    def schema(self):
        """Source schema without scanning (bigquery.go:243-248 ``Schema()``)."""
        return self.dataframe().schema

    def to_batches(self):
        """Driver-side Arrow-batch pull loop — test/parity shim for
        ``Read()`` (bigquery.go:152-182).  Small data only."""
        return self.dataframe().toArrow().to_batches()


def read_source(
    spark: SparkSession,
    location: str,
    table: str,
    columns: list[str] | None = None,
    predicate: str | None = None,
    max_streams: int | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """One-call scan with pushdown — the ergonomic path."""
    return Reader(
        spark,
        location,
        table,
        selected_fields=columns,
        row_restriction=predicate,
        max_streams=max_streams,
        fmt=fmt,
    ).dataframe()
