from ecommerce_lakehouse_spark.lake.cdf import table_changes  # noqa: F401
from ecommerce_lakehouse_spark.lake.merge import (  # noqa: F401
    merge_aggregate,
    merge_upsert,
    table_diff,
)
from ecommerce_lakehouse_spark.lake.stream_source import (  # noqa: F401
    LakeTableDataSource,
    register_lake_source,
)
from ecommerce_lakehouse_spark.lake.table import (  # noqa: F401
    ConcurrentWriteError,
    LakeTable,
)
