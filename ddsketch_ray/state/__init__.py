from ddsketch_ray.state.checkpoint import (
    CheckpointedSketchJob,
    load_merged_sketches,
)

__all__ = ["CheckpointedSketchJob", "load_merged_sketches"]
