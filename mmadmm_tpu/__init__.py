"""mmadmm_tpu — a TPU-native moving-mesh framework (MM-ADMM).

A from-scratch JAX/XLA/Pallas implementation of implicit MMPDE integration
via ADMM splitting of the Huang mesh-adaptation functional, with the same
capabilities as the reference C++/Eigen/OpenMP code (connortannahill/MM-ADMM),
re-designed TPU-first:

* mesh state is dense arrays ``X[NP, D]`` / ``F[NF, D+1]`` (no objects),
* the per-element proximal subproblems are a batched, branch-free damped
  Newton solve (vmapped XLA or a fused Pallas kernel) over the element axis,
* the global consensus x-update is closed form (the reference's
  ``t = M + dt^2 (WD)^T(WD)`` is diagonal because ``D`` is a pure gather,
  cf. reference ``src/Mesh.cpp:704-753`` / ``src/MeshIntegrator.cpp:43-58``),
* multi-chip scaling shards the element batch over a ``jax.sharding.Mesh``
  with ``psum`` node reductions (``shard_map``), replacing the reference's
  single-node OpenMP loop (``src/Mesh.cpp:945-948``).

Numerics default to float64 (the reference is all-double Eigen); the TPU fast
path runs float32 with float64 energy reductions.
"""

import jax as _jax

# The reference is an all-double scientific code; outer-loop convergence tests
# compare energy deltas down to ~1e-8 (main.cpp:200-208 with DtTol=1e-5 and
# dt=5e-3), which is below float32 resolution. Enable x64 so reductions and
# (optionally) the full state can be double precision. Compute dtype remains
# per-config (float32 fast path on TPU).
_jax.config.update("jax_enable_x64", True)

# Safety net: TPU f32 dot_general defaults to bf16 MXU passes; this code has
# no large matmuls, so full precision costs nothing and protects any
# remaining contraction (the hot-path small products are hand-unrolled VPU
# ops anyway — see ops/huang.py).
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"

from .config import ExperimentConfig, load_experiment_config  # noqa: E402
from .geometry.node_type import NodeType  # noqa: E402
from .mesh import MovingMesh  # noqa: E402
from .integrators.admm import ADMMIntegrator  # noqa: E402
from .integrators.euler import EulerIntegrator  # noqa: E402
from .integrators.backward_euler import BackwardEulerIntegrator  # noqa: E402

__all__ = [
    "ExperimentConfig",
    "load_experiment_config",
    "NodeType",
    "MovingMesh",
    "ADMMIntegrator",
    "EulerIntegrator",
    "BackwardEulerIntegrator",
]
