from opengauss_tools_datachecker_spark.operators.checksum import (  # noqa: F401
    checksum_table,
    column_diff,
    multiset_diff,
    recover_rows,
    symmetric_diff,
)
