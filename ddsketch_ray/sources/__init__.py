from ddsketch_ray.sources.readers import (
    read_sketch_parquet,
    read_values_csv,
    read_webpages,
    write_sketch_parquet,
)

__all__ = [
    "read_values_csv",
    "read_webpages",
    "write_sketch_parquet",
    "read_sketch_parquet",
]
