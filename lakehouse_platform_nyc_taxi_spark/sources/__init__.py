from .testdata import (
    TESTDATA_TABLES,
    load_table,
    load_table_parallel,
    load_tables,
    register_views,
)

__all__ = [
    "TESTDATA_TABLES",
    "load_table",
    "load_table_parallel",
    "load_tables",
    "register_views",
]
