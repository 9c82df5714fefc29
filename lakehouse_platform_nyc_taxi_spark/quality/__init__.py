from .assertions import (
    AssertionResult,
    accepted_range,
    accepted_values,
    expression_is_true,
    not_null,
    run_assertions,
    source_freshness,
)
from .suite import taxi_assertion_suite

__all__ = [
    "AssertionResult",
    "not_null",
    "accepted_values",
    "accepted_range",
    "expression_is_true",
    "source_freshness",
    "run_assertions",
    "taxi_assertion_suite",
]
