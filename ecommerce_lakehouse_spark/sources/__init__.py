from ecommerce_lakehouse_spark.sources.readers import (  # noqa: F401
    cast_to_schema,
    read_csv,
    read_json,
    read_table,
)
from ecommerce_lakehouse_spark.sources.sinks import (  # noqa: F401
    read_shards,
    with_shard,
    write_sharded,
)
