"""BigQuery-field -> Spark-type mapping — the schema converter analogue.

Reference (bigquery_write.go:135-213): recursive BQ TableFieldSchema ->
Storage TableSchema conversion, covering the full type universe at
bigquery_write.go:160-193 and the NULLABLE/REQUIRED/REPEATED modes at
:195-202 (REPEATED -> ArrayType, RECORD -> StructType, recursion :204-211).

Caps and gaps are deliberate and documented (SURVEY §1.3):
- NUMERIC -> Decimal(38,9); BIGNUMERIC -> Decimal(38,18) (Spark max precision
  38 < BQ's 76,38)
- TIME has no Spark type -> microseconds-since-midnight LongType
- GEOGRAPHY -> WKT StringType
- JSON -> StringType (query with from_json/get_json_object)
- RANGE -> Struct{start,end}
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T


@dataclass
class BQField:
    """Minimal mirror of BigQuery's TableFieldSchema (name/type/mode/fields)."""

    name: str
    type: str
    mode: str = "NULLABLE"  # NULLABLE | REQUIRED | REPEATED
    fields: list["BQField"] = field(default_factory=list)


#: bigquery_write.go:160-193, column 3 of the SURVEY §1.3 table.
_SCALAR: dict[str, T.DataType] = {
    "STRING": T.StringType(),
    "BYTES": T.BinaryType(),
    "INTEGER": T.LongType(),
    "INT64": T.LongType(),
    "FLOAT": T.DoubleType(),
    "FLOAT64": T.DoubleType(),
    "BOOLEAN": T.BooleanType(),
    "BOOL": T.BooleanType(),
    "TIMESTAMP": T.TimestampType(),
    "DATE": T.DateType(),
    "TIME": T.LongType(),  # µs since midnight; no native Spark TIME
    "DATETIME": T.TimestampNTZType(),
    "NUMERIC": T.DecimalType(38, 9),
    "BIGNUMERIC": T.DecimalType(38, 18),  # BQ (76,38) capped at Spark max 38
    "GEOGRAPHY": T.StringType(),  # WKT
    "JSON": T.StringType(),
}


def bq_field_to_spark(f: BQField) -> T.StructField:
    """One field, recursively (bigquery_write.go:140-147, 204-211)."""
    kind = f.type.upper()
    if kind in ("RECORD", "STRUCT"):
        dt: T.DataType = T.StructType([bq_field_to_spark(c) for c in f.fields])
    elif kind == "RANGE":
        dt = T.StructType(
            [T.StructField("start", T.TimestampType()), T.StructField("end", T.TimestampType())]
        )
    elif kind in _SCALAR:
        dt = _SCALAR[kind]
    else:
        raise ValueError(f"unsupported BigQuery type: {f.type!r}")
    if f.mode.upper() == "REPEATED":  # bigquery_write.go:196-197
        dt = T.ArrayType(dt, containsNull=False)
    nullable = f.mode.upper() != "REQUIRED"
    return T.StructField(f.name, dt, nullable=nullable)


def bq_schema_to_struct(fields: list[BQField]) -> T.StructType:
    """Whole-schema conversion (bigquery_write.go:135-213 analogue)."""
    return T.StructType([bq_field_to_spark(f) for f in fields])
