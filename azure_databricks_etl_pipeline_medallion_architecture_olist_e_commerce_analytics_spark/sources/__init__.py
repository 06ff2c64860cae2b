from .loader import TABLES, load_table, load_tables, register_views
from .sinks import write_table

__all__ = ["TABLES", "load_table", "load_tables", "register_views", "write_table"]
