from .registry import Pipeline, DatasetDef, ExpectationViolation
from .expectations import Expectation, apply_expectations, expectation_metrics

__all__ = [
    "Pipeline",
    "DatasetDef",
    "ExpectationViolation",
    "Expectation",
    "apply_expectations",
    "expectation_metrics",
]
