from .readers import load_events, load_star, load_table, read_csv, read_excel, read_json, read_parquet
from .writers import write_csv, write_jdbc, write_parquet, write_sqlite, save_tables

__all__ = [
    "load_events",
    "load_star",
    "load_table",
    "read_csv",
    "read_excel",
    "read_json",
    "read_parquet",
    "write_csv",
    "write_jdbc",
    "write_parquet",
    "write_sqlite",
    "save_tables",
]
