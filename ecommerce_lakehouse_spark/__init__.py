"""ecommerce_lakehouse_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference lakehouse (KPrince-coder/ecommerce-lakehouse):
medallion ETL (validate → split → dedup → upsert), gold-layer analytics
(joins, hash aggregations, window top-1, segmentation ladders), plus the
large-scale training-data-pipeline operators the 100 TB north star needs
(dedup families, similarity search, text analysis, multimodal plumbing,
structured streaming).

Everything is declarative DataFrame / SQL so Catalyst + AQE pick physical
strategies; Python UDFs appear only where built-ins cannot express the
semantics (Arrow-batched, never per-row).
"""

__version__ = "0.1.0"

from ecommerce_lakehouse_spark.session import get_spark  # noqa: F401
