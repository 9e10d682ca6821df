from ddsketch_ray.stages.builders import (
    MergeSketchBytesAgg,
    SketchBuilder,
    sketch_via_actor_pool,
)

__all__ = ["SketchBuilder", "MergeSketchBytesAgg", "sketch_via_actor_pool"]
