from .tables import TPCH_TABLES, load_table, register_all  # noqa: F401
