from ecommerce_lakehouse_spark.operators.relational import asof_join, dedup_by_key  # noqa: F401
from ecommerce_lakehouse_spark.operators.scale import (  # noqa: F401
    bucketed_join,
    salted_join,
    write_bucketed,
)
