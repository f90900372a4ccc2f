from ecommerce_lakehouse_spark.lake.merge import merge_upsert  # noqa: F401
from ecommerce_lakehouse_spark.lake.table import LakeTable  # noqa: F401
