from bigquack_spark.sources.parquet import TABLES, load_table, register_views, table_path  # noqa: F401
from bigquack_spark.sources.reader import Reader, read_source  # noqa: F401
from bigquack_spark.sources.formats import (  # noqa: F401
    load_csv,
    load_json,
    load_orc,
    load_parquet_evolving,
)
