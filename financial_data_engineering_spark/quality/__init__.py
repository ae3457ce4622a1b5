from financial_data_engineering_spark.quality.report import ValidationReport
from financial_data_engineering_spark.quality.rules import (
    CompletenessRule,
    CustomRule,
    FreshnessRule,
    PatternRule,
    RangeRule,
    Rule,
    RuleResult,
    RuleSet,
    UniquenessRule,
)
from financial_data_engineering_spark.quality.validator import DataValidator

__all__ = [
    "CompletenessRule",
    "CustomRule",
    "FreshnessRule",
    "DataValidator",
    "PatternRule",
    "RangeRule",
    "Rule",
    "RuleResult",
    "RuleSet",
    "UniquenessRule",
    "ValidationReport",
]
