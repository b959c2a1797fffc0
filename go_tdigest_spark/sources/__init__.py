from .tables import TABLE_NAMES, load_tables, read_table, table

__all__ = ["TABLE_NAMES", "load_tables", "read_table", "table"]
