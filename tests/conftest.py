import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session", autouse=True)
def empty_batch_probe():
    """Property-check EVERY package map_batches UDF the suite drives on
    0-row and 1-row batches (the r04 d_crosslang_dups flake class)."""
    from fhir_data_validation_ray.functions import batchprobe

    undo = batchprobe.install()
    yield
    undo()


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()
