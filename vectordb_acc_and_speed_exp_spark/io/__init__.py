from .catalog import (
    TABLES,
    compact_table,
    load_table,
    load_tables,
    optimize_layout,
    register_views,
    spread_small_scan,
)

__all__ = [
    "TABLES",
    "compact_table",
    "load_table",
    "load_tables",
    "optimize_layout",
    "register_views",
    "spread_small_scan",
]
