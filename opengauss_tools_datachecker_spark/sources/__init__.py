from opengauss_tools_datachecker_spark.sources.catalog import (  # noqa: F401
    filter_tables,
    like_to_regex,
    read_table,
)
