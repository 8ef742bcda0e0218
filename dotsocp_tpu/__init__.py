"""dotsocp_tpu — TPU-native framework for dynamic optimal transport via SOCP.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
chlhnu/DOT-SOCP (MATLAB + C++ MEX): staggered-grid Benamou-Brenier dynamic
optimal transport solved through a second-order cone reformulation with a
family of first-order primal-dual methods (PALM / inPALM / ALG2 / acc-ADMM /
sGS variants), multilevel warm starting, and weighted (obstacle) transport —
plus the parallel substrate the reference lacks: batch + spatial sharding
over a TPU mesh via pjit/shard_map.
"""

from .ops.geometry import Geometry
from .ops.staggered import Staggered

__version__ = "0.1.0"

__all__ = ["Geometry", "Staggered", "__version__"]
