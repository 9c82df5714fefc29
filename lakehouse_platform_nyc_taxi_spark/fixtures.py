"""Deterministic taxi-shaped raw fixtures (FIXTURES.md §1-2).

Generates the four raw source tables (yellow/green/fhv/fhvhv) as parquet
with every row class the pipeline's predicates and the 37 assertions need
exercised both ways: clean rows, staging rejects, quality-flag negatives,
speed-path cases (incl. the cleaned-filter precedence quirk), sub-5%%
bad-fare share, full temporal spread, key collisions, and NULL key
components. Seed-fixed NumPy, so byte-stable across runs.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

SEED = 42


def _base_times(rng: np.random.Generator, n: int) -> pd.Series:
    """Pickups spread over 2023-01 and 2023-02, all hours and weekdays."""
    month = rng.choice([1, 2], size=n)
    day = rng.integers(1, 28, size=n)
    hour = rng.integers(0, 24, size=n)
    minute = rng.integers(0, 60, size=n)
    second = rng.integers(0, 60, size=n)
    return pd.to_datetime(
        {
            "year": np.full(n, 2023),
            "month": month,
            "day": day,
            "hour": hour,
            "minute": minute,
            "second": second,
        }
    )


def _yellow_like(
    rng: np.random.Generator,
    n: int,
    pickup_col: str,
    dropoff_col: str,
    with_null_locations: bool = False,
) -> pd.DataFrame:
    pickup = _base_times(rng, n)
    # clean durations 1-180 min, plus tails
    dur_min = rng.uniform(1.5, 60, size=n)
    dur_min[: n // 20] = rng.uniform(181, 400, size=n // 20)          # too long
    dur_min[n // 20 : n // 20 + 5] = 0.0                               # zero duration
    dropoff = pickup + pd.to_timedelta((dur_min * 60).round(), unit="s")

    dist = rng.uniform(0.5, 20, size=n)
    dist[: n // 25] = rng.uniform(101, 200, size=n // 25)              # too far
    dist[n // 25 : n // 25 + 5] = 0.0                                  # zero distance -> NULL speed
    # a handful of very fast trips: speed in [80, 100] and > 100
    fast = slice(n // 25 + 5, n // 25 + 15)
    dist[fast] = 30.0
    dropoff.iloc[fast] = pickup.iloc[fast] + pd.to_timedelta(
        np.linspace(15, 21, 10).round(), unit="m"
    )

    fare = (2.5 + dist * 2.4 + rng.normal(0, 2, size=n)).round(2)
    total = (fare * 1.25).round(2)
    total[: max(2, n // 30)] = rng.uniform(501, 900, size=max(2, n // 30)).round(2)  # too expensive
    # sub-5% bad fares (test must pass at 5% tolerance)
    bad_fare = rng.choice(n, size=max(1, n // 40), replace=False)
    fare[bad_fare] = 0.0

    pdf = pd.DataFrame(
        {
            "vendorid": rng.choice([1, 2], size=n).astype("int64"),
            pickup_col: pickup,
            dropoff_col: dropoff,
            "passenger_count": rng.choice([1.0, 1.0, 2.0, 3.0, 6.0], size=n),
            "trip_distance": dist.round(2),
            "pulocationid": rng.integers(1, 266, size=n).astype("int64"),
            "dolocationid": rng.integers(1, 266, size=n).astype("int64"),
            "fare_amount": fare,
            "total_amount": total,
        }
    )

    # NULL passenger_count / fare on otherwise-clean rows
    pdf.loc[pdf.index[-5:], "passenger_count"] = np.nan
    pdf.loc[pdf.index[-10:-5], "fare_amount"] = np.nan
    # NULL location ids (survive staging, fail is_high_quality). Only on
    # tables without declared not_null tests (green) — the reference's
    # staging schema tests (yellow) must stay green on the fixtures.
    if with_null_locations:
        pdf.loc[pdf.index[-15:-10], "dolocationid"] = pd.NA
    pdf["dolocationid"] = pdf["dolocationid"].astype("Int64")
    # staging rejects: NULL pickup / dropoff, inverted, equal, negatives
    rej = pd.DataFrame(
        {
            "vendorid": [1, 1, 2, 2, 1, 2],
            pickup_col: [
                pd.NaT,
                pd.Timestamp("2023-01-05 10:00:00"),
                pd.Timestamp("2023-01-05 11:00:00"),
                pd.Timestamp("2023-01-05 12:00:00"),
                pd.Timestamp("2023-01-05 13:00:00"),
                pd.Timestamp("2023-01-05 14:00:00"),
            ],
            dropoff_col: [
                pd.Timestamp("2023-01-05 10:30:00"),
                pd.NaT,
                pd.Timestamp("2023-01-05 10:30:00"),  # inverted
                pd.Timestamp("2023-01-05 12:00:00"),  # equal
                pd.Timestamp("2023-01-05 13:30:00"),
                pd.Timestamp("2023-01-05 14:30:00"),
            ],
            "passenger_count": 1.0,
            "trip_distance": [2.0, 2.0, 2.0, 2.0, -1.0, 2.0],  # negative distance
            "pulocationid": 10,
            "dolocationid": 20,
            "fare_amount": 10.0,
            "total_amount": [12.0, 12.0, 12.0, 12.0, 12.0, -3.0],  # negative total
        }
    )
    rej["dolocationid"] = rej["dolocationid"].astype("Int64")
    # duplicate surrogate-key triple (same pickup ts + PU + DO, different attrs)
    dup = pdf.iloc[[0]].copy()
    dup["fare_amount"] = 99.0
    pdf = pd.concat([pdf, rej, dup], ignore_index=True)
    pdf["year"] = pdf[pickup_col].dt.year.fillna(2023).astype("int32")
    pdf["month"] = pdf[pickup_col].dt.month.fillna(1).astype("int32")
    pdf["loaded_at"] = pd.Timestamp("2023-03-01 00:00:00")
    return pdf


def _fhv(rng: np.random.Generator, n: int) -> pd.DataFrame:
    pickup = _base_times(rng, n)
    dropoff = pickup + pd.to_timedelta(rng.integers(60, 7200, size=n), unit="s")
    pdf = pd.DataFrame(
        {
            "pickup_datetime": pickup,
            "dropoff_datetime": dropoff,
            "pulocationid": rng.integers(1, 266, size=n).astype("int64"),
            "dolocationid": rng.integers(1, 266, size=n).astype("int64"),
            "dispatching_base_num": [f"B{int(i):05d}" for i in rng.integers(1, 300, size=n)],
        }
    )
    pdf.loc[pdf.index[:3], "pickup_datetime"] = pd.NaT  # rejects
    pdf["year"] = pdf["pickup_datetime"].dt.year.fillna(2023).astype("int32")
    pdf["month"] = pdf["pickup_datetime"].dt.month.fillna(1).astype("int32")
    pdf["loaded_at"] = pd.Timestamp("2023-03-01 00:00:00")
    return pdf


def _fhvhv(rng: np.random.Generator, n: int) -> pd.DataFrame:
    pickup = _base_times(rng, n)
    dropoff = pickup + pd.to_timedelta(rng.integers(120, 5400, size=n), unit="s")
    miles = rng.uniform(0.5, 25, size=n).round(2)
    miles[:3] = -1.0  # rejects
    pdf = pd.DataFrame(
        {
            "pickup_datetime": pickup,
            "dropoff_datetime": dropoff,
            "pulocationid": rng.integers(1, 266, size=n).astype("int64"),
            "dolocationid": rng.integers(1, 266, size=n).astype("int64"),
            "trip_miles": miles,
            "base_passenger_fare": (miles * 2.1 + 3).round(2),
            "hvfhs_license_num": rng.choice(["HV0002", "HV0003", "HV0004", "HV0005"], size=n),
            "dispatching_base_num": [f"B{int(i):05d}" for i in rng.integers(1, 300, size=n)],
        }
    )
    pdf["year"] = pdf["pickup_datetime"].dt.year.astype("int32")
    pdf["month"] = pdf["pickup_datetime"].dt.month.astype("int32")
    pdf["loaded_at"] = pd.Timestamp("2023-03-01 00:00:00")
    return pdf


def generate_raw_tables(n: int = 2000) -> dict[str, pd.DataFrame]:
    rng = np.random.default_rng(SEED)
    return {
        "yellow_trips": _yellow_like(rng, n, "tpep_pickup_datetime", "tpep_dropoff_datetime"),
        "green_trips": _yellow_like(
            rng, n, "lpep_pickup_datetime", "lpep_dropoff_datetime", with_null_locations=True
        ),
        "fhv_trips": _fhv(rng, n // 2),
        "fhvhv_trips": _fhvhv(rng, n),
    }


def write_raw_tables(out_dir: str, n: int = 2000) -> dict[str, str]:
    """Write the fixtures as parquet (µs timestamps — matches TLC files)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, pdf in generate_raw_tables(n).items():
        path = os.path.join(out_dir, f"{name}.parquet")
        pdf.to_parquet(path, index=False, coerce_timestamps="us", allow_truncated_timestamps=True)
        paths[name] = path
    return paths
