"""ddsketch_ray — Ray-Data-native distributed sketch engine."""

__version__ = "0.1.0"


def tune_for_sketch_pipelines() -> None:
    """Apply the DataContext settings this engine's pipelines are tuned
    for (safe pre- or post-ray.init; no session is created):

    - ``op_resource_reservation_ratio = 0.2`` — the 0.5 default reserves
      half the CPUs for downstream operators, which idles half the
      cluster when the downstream is a KB-sized sketch merge (measured
      +85% on the webpages suite at 32 CPUs; BASELINE.md).
    """
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.op_resource_reservation_ratio = 0.2
