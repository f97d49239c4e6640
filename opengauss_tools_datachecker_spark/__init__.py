"""PySpark-native data validation engine.

A from-scratch re-expression of the query semantics of
opengauss-mirror/openGauss-tools-datachecker (reference snapshot at
/root/reference, read-only): per-row checksums over type-canonicalized
columns, symmetric-difference comparison, violation recovery — plus the
BASELINE.json rule suite (column stats, uniqueness, referential,
distribution drift, sha256 content integrity, checkpoint/resume) and
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing).

Architecture is Spark-first: every operator is a lazy DataFrame program
expressed with built-in Catalyst expressions; vectorized pandas/Arrow
kernels appear only where built-ins cannot express the semantics
(two-sample chi-square / KS drift statistics, stateful streaming
progress) or cannot express them efficiently (per-pair vector math and
per-shingle hashing, where Spark's higher-order-function lambdas
evaluate interpreted — the kernels replay the identical fold order /
hash strings, so results are bit-equal to the Catalyst spec). No
row-at-a-time Python UDFs anywhere (BASELINE.json input_hint).
"""

__version__ = "0.1.0"

from opengauss_tools_datachecker_spark.session import get_spark  # noqa: F401
from opengauss_tools_datachecker_spark.plans.runner import (  # noqa: F401
    RunResult,
    check_incremental,
    check_tables,
    run_suite,
)
