from ecommerce_lakehouse_spark.operators.relational import asof_join, dedup_by_key  # noqa: F401
