from .tables import load_table, load_tables, TPCH_TABLES

__all__ = ["load_table", "load_tables", "TPCH_TABLES"]
