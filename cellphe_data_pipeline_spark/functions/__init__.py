from cellphe_data_pipeline_spark.functions.scalars import (
    euclid,
    natural_sort_key,
    portable_hash64,
    safe_ratio,
)

__all__ = ["euclid", "safe_ratio", "natural_sort_key", "portable_hash64"]
