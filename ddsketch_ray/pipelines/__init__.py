from ddsketch_ray.pipelines.webpages import (
    derive_page_features,
    quantiles_by_group,
    webpages_sketch_report,
)

__all__ = [
    "derive_page_features",
    "webpages_sketch_report",
    "quantiles_by_group",
]
