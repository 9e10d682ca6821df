from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole test run (driver requirement)."""
    import ray

    created = False
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        created = True
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield ray
    if created:  # never tear down a session someone else owns
        # Settle before shutdown: back-to-back streaming-dedup runs can
        # leave a core-worker cleanup thread mid-flight; an immediate
        # ray.shutdown() then wedges in core_worker_process.cc:926
        # ("worker accessed after shutdown") — reproduced 5/5 without
        # the sleep, 7/7 clean with it (see CLAUDE.md).
        import time

        time.sleep(2)
        ray.shutdown()


# The reference's six test distributions (/root/reference/main.cpp:175-181),
# seeded numpy analogues at reduced n (FIXTURES.md §2).
DISTRIBUTIONS = {
    "normal": lambda rng, n: rng.normal(2, 3, n),
    "normal2": lambda rng, n: rng.normal(10, 3, n),
    "exponential": lambda rng, n: rng.exponential(1 / 17, n),
    "uniform_neg": lambda rng, n: rng.uniform(-50, 0, n),
    "uniform_wide": lambda rng, n: rng.uniform(10, 4e5, n),
    "gamma": lambda rng, n: rng.gamma(2, 2, n),
}


@pytest.fixture(params=sorted(DISTRIBUTIONS))
def dist_values(request):
    rng = np.random.default_rng(42)
    return request.param, DISTRIBUTIONS[request.param](rng, 100_000)
