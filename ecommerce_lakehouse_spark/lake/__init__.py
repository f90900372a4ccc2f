from ecommerce_lakehouse_spark.lake.merge import (  # noqa: F401
    merge_aggregate,
    merge_upsert,
    table_diff,
)
from ecommerce_lakehouse_spark.lake.table import (  # noqa: F401
    ConcurrentWriteError,
    LakeTable,
)
