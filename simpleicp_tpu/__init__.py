"""simpleicp_tpu — a TPU-native point-cloud registration framework.

A brand-new JAX/XLA/Pallas implementation of rigid 6-DoF point-to-plane ICP
with the full capabilities of the reference `pglira/simpleICP` family
(see /root/reference): normal estimation from k-NN covariance
eigendecomposition, fixed-count correspondence selection,
`max_overlap_distance` gating, MAD + planarity outlier rejection,
Gauss-Newton point-to-plane solves with optional direct observations of the
six rigid-body parameters (free / weighted / frozen), a-posteriori parameter
uncertainties, and the reference's logging + CLI contract.

Design (TPU-first, not a port):
  * no KD-trees — nearest-neighbor search is a tiled distance kernel that
    rides the MXU via the ||q-r||^2 = |q|^2+|r|^2-2 q.r matmul trick
    (Pallas kernel for the hot path, lax fallback everywhere);
  * no dynamic shapes — rejection uses boolean validity masks with masked
    median/MAD statistics, so the entire ICP iteration loop compiles into a
    single `lax.while_loop` with on-device convergence;
  * the 6x6 normal equations are on-chip masked J^T W J / J^T W r reductions;
  * multi-chip scaling shards clouds over a `jax.sharding.Mesh` with
    `shard_map` + `psum`/`all_gather` collectives (see simpleicp_tpu.parallel).

Public API mirrors the reference Python package
(/root/reference/python/simpleicp/__init__.py:12-14).
"""

__version__ = "0.1.0"

import logging

# Library best practice mirrored from the reference
# (/root/reference/python/simpleicp/__init__.py:3-7): never emit logs unless
# the application opts in.
logging.getLogger(__name__).addHandler(logging.NullHandler())

from .config import IcpConfig  # noqa: E402
from .models.solver import Parameter, RigidBodyParameters  # noqa: E402
from .models.icp import IcpResult, icp_register  # noqa: E402
from .api import PointCloud, PointCloudException, SimpleICP, SimpleICPException  # noqa: E402

__all__ = [
    "IcpConfig",
    "IcpResult",
    "icp_register",
    "Parameter",
    "PointCloud",
    "PointCloudException",
    "RigidBodyParameters",
    "SimpleICP",
    "SimpleICPException",
    "__version__",
]
