from .intermediate import int_trips_cleaned, int_trips_enriched, int_trips_unified
from .marts import fct_trips, fct_trips_daily, fct_trips_monthly
from .staging import (
    STAGING_MODELS,
    stg_fhv_trips,
    stg_fhvhv_trips,
    stg_green_trips,
    stg_yellow_trips,
)

__all__ = [
    "STAGING_MODELS",
    "stg_yellow_trips",
    "stg_green_trips",
    "stg_fhv_trips",
    "stg_fhvhv_trips",
    "int_trips_unified",
    "int_trips_enriched",
    "int_trips_cleaned",
    "fct_trips",
    "fct_trips_daily",
    "fct_trips_monthly",
]
