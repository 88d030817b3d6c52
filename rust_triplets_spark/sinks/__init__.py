from rust_triplets_spark.sinks.bucketed import (  # noqa: F401
    read_bucketed,
    write_bucketed,
    write_partitioned_parquet,
)
