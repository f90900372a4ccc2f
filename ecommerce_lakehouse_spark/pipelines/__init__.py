from ecommerce_lakehouse_spark.pipelines.medallion import run_medallion  # noqa: F401
