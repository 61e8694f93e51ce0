from .tables import TABLES, load_table, load_all, candles_view

__all__ = ["TABLES", "load_table", "load_all", "candles_view"]
