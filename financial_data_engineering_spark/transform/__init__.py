from financial_data_engineering_spark.transform.base_transformer import (
    BaseTransformer,
    TransformationResult,
)
from financial_data_engineering_spark.transform.clustered import (
    write_clustered_parquet,
)
from financial_data_engineering_spark.transform.date_dim import build_date_dimension
from financial_data_engineering_spark.transform.export import (
    export_jsonl_shards,
    read_jsonl_shards,
    with_shard,
)
from financial_data_engineering_spark.transform.scd import scd2_from_observations
from financial_data_engineering_spark.transform.star_schema import StarSchemaBuilder

__all__ = [
    "BaseTransformer",
    "StarSchemaBuilder",
    "TransformationResult",
    "build_date_dimension",
    "scd2_from_observations",
    "write_clustered_parquet",
]
