from opengauss_tools_datachecker_spark.functions.canon import (  # noqa: F401
    canon_column,
    checksum_column,
    row_checksum,
)
