from .trino import (
    date_diff,
    day_name,
    day_of_week_iso,
    surrogate_key,
    time_of_day,
)

__all__ = [
    "date_diff",
    "day_name",
    "day_of_week_iso",
    "surrogate_key",
    "time_of_day",
]
