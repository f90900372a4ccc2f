from ecommerce_lakehouse_spark.quality.rules import (  # noqa: F401
    NotNull,
    Range,
    RefIntegrity,
    Custom,
    validate,
    split_valid_rejected,
)
from ecommerce_lakehouse_spark.quality.alerts import (  # noqa: F401
    AlertPolicy,
    QualityAlertError,
    evaluate_alerts,
)
