from .bucketed import bucketed_table, write_bucketed
from .tables import (
    TABLE_NAMES,
    load_tables,
    parquet_row_count,
    read_table,
    table,
)

__all__ = [
    "TABLE_NAMES",
    "bucketed_table",
    "load_tables",
    "parquet_row_count",
    "read_table",
    "table",
    "write_bucketed",
]
