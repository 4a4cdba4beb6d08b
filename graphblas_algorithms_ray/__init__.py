"""graphblas_algorithms_ray — a Ray-Data-native link-graph analytics engine.

From-scratch re-expression of python-graphblas/graphblas-algorithms'
semantics (see SURVEY.md) as ray.data.Dataset pipelines: zero-copy Arrow
batches, per-partition CSR shards broadcast through the object store,
one groupby-aggregate shuffle per BSP superstep.

Must NOT call ray.init()/ray.shutdown() anywhere (driver owns the session).
"""

from .state.graph import Graph
from .stages.fixpoint import ConvergenceFailure

__all__ = ["Graph", "ConvergenceFailure"]
__version__ = "0.1.0"
