from .testdata import TESTDATA_TABLES, load_table, load_tables, register_views

__all__ = ["TESTDATA_TABLES", "load_table", "load_tables", "register_views"]
