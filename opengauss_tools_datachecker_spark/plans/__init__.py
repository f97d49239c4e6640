from opengauss_tools_datachecker_spark.plans.rule import (  # noqa: F401
    CheckContext,
    Rule,
    VIOLATION_COLS,
    verdicts_from_violations,
)
