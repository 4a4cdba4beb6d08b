import os
import sys

import pytest
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session", autouse=True)
def ray_session():
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
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()
    # bounded disk: drop per-Graph build dirs from PREVIOUS sessions. Keep
    # the library-default 6h cutoff: a 1h cutoff could rmtree a workdir a
    # long-lived concurrent driver (a soak run, the 2M-doc probe) built
    # >1h ago but still reads from — its mtime never updates on read.
    from graphblas_algorithms_ray._util import sweep_graph_workdirs

    sweep_graph_workdirs()


@pytest.fixture(scope="module", autouse=True)
def _drain_actor_pool_caches():
    """Kill cached BSP/dense actor meshes after each test module. The
    class-level pool caches (amortizing actor startup within a kernel
    sequence) otherwise accumulate one idle P-actor mesh per distinct
    partition count across the whole session — by the late suite the
    heavy tests ran 4-6x slower than in isolation."""
    yield
    from graphblas_algorithms_ray.stages import bsp_actors as b

    for ws in list(b.DensePool._meshes.values()):
        for w in ws:
            ray.kill(w)
    b.DensePool._meshes.clear()
    b.DensePool._bases.clear()
    for ws in list(b.BSPPool._shared_workers.values()):
        for w in ws:
            ray.kill(w)
    b.BSPPool._shared_workers.clear()
    b.BSPPool._round_bases.clear()
    b.BSPPool._peers_wired.clear()
