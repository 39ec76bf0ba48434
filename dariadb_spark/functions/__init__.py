"""Statistic-function library (reference: statistic/calculator.h)."""

from dariadb_spark.functions.statistics import (
    FUNCTION_REGISTRY,
    apply_functions,
    function_names,
)

__all__ = ["FUNCTION_REGISTRY", "apply_functions", "function_names"]
