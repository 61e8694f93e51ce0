from .tables import TABLES, load_table, load_all, candles_view
from .fetchplan import (
    build_fetch_plan,
    dead_letters,
    fetch_pages,
    synthetic_fetcher,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_all",
    "candles_view",
    "build_fetch_plan",
    "dead_letters",
    "fetch_pages",
    "synthetic_fetcher",
]
