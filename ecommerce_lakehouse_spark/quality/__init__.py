from ecommerce_lakehouse_spark.quality.rules import (  # noqa: F401
    NotNull,
    Range,
    RefIntegrity,
    Custom,
    validate,
    split_valid_rejected,
)
