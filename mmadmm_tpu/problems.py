"""Experiment setup: config -> (mesh, integrator).

The TPU-native analogue of the reference's driver layer
(``setUpBoxExperiment`` / ``setUpLevelSetExperiment`` /
``setUpShoulderExperiment`` / ``setUpFileExperiment`` + ``runAlgo``,
``main.cpp:142-782``).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from .config import ExperimentConfig
from .geometry import io as mesh_io
from .geometry.level_set import circle_phi, mesh_from_level_set, sphere_phi
from .geometry.node_type import NodeType
from .geometry.rect_mesh import generate_uniform_rect_mesh
from .geometry.shoulder import make_shoulder_mesh
from .integrators.admm import ADMMIntegrator
from .integrators.backward_euler import BackwardEulerIntegrator
from .integrators.euler import EulerIntegrator
from .mesh import MovingMesh
from .monitors import get_monitor

_DTYPES = {"float32": jnp.float32, "float64": jnp.float64}


def build_geometry(cfg: ExperimentConfig, base_dir: str | None = None):
    """Return (X, F, mask, Xc) for the config's TestType
    (dispatch mirrors main.cpp:874-904)."""
    if base_dir is None:
        base_dir = cfg.base_dir
    btype = NodeType(cfg.boundary_node_type)
    if cfg.test_type == "SquareGrid":
        X, F, mask = generate_uniform_rect_mesh(
            cfg.dim, cfg.nx, cfg.ny, cfg.nz,
            cfg.xa, cfg.xb, cfg.ya, cfg.yb, cfg.za, cfg.zb, btype,
        )
        Xc = X.copy()
    elif cfg.test_type == "Shoulder":
        X, F, mask = make_shoulder_mesh(
            cfg.dim, cfg.nx, cfg.ny, cfg.nz,
            cfg.xa, cfg.xb, cfg.ya, cfg.yb, cfg.za, cfg.zb, btype,
        )
        Xc = X.copy()
    elif cfg.test_type == "LevelSet":
        # 2D uses the circle, 3D the sphere (main.cpp:333-397)
        phi = circle_phi if cfg.dim == 2 else sphere_phi
        normal = "circle" if cfg.dim == 2 else "grad"
        X, F, mask = mesh_from_level_set(
            phi, cfg.dim, cfg.nx, cfg.ny, cfg.nz,
            cfg.xa, cfg.xb, cfg.ya, cfg.yb, cfg.za, cfg.zb, btype,
            normal=normal,
        )
        Xc = X.copy()
    elif cfg.test_type == "FromFile":
        X, F, mask = mesh_io.read_mesh(
            os.path.join(base_dir, cfg.triangles_file),
            os.path.join(base_dir, cfg.pnts_file),
            os.path.join(base_dir, cfg.mask_file),
        )
        Xc = X.copy()
    else:
        raise ValueError(f"unknown TestType {cfg.test_type!r}")
    return X, F, mask, Xc


def build_problem(cfg: ExperimentConfig, base_dir: str | None = None):
    """Return (mesh, integrator) ready to run."""
    X, F, mask, Xc = build_geometry(cfg, base_dir)
    monitor = get_monitor(cfg.dim, cfg.mon_type)
    mesh = MovingMesh(
        X, F, mask, monitor,
        rho=cfg.rho, tau=cfg.tau,
        comp_mesh=cfg.comp_mesh, Xc=Xc if cfg.comp_mesh else None,
        dtype=_DTYPES[cfg.dtype],
        prox_backend=cfg.prox_backend,
    )
    device_mesh = None
    if cfg.n_devices > 1:
        from .parallel import make_device_mesh

        device_mesh = make_device_mesh(cfg.n_devices)
    if cfg.method == 0:
        # the 6.1M-tet tier (3DMonitor180/280): element-major layouts pad
        # 20-100x under XLA:TPU's (8,128) tiling and cannot fit one chip
        # (scripts/tpu_280_probe.py) — big 3D meshes route to the
        # channel-major slab-streamed step (integrators/admm_soa.py).
        # MMADMM_SOA=1/0 forces/disables; threshold via MMADMM_SOA_MIN.
        soa_env = os.environ.get("MMADMM_SOA")
        soa_min = int(os.environ.get("MMADMM_SOA_MIN", 1_500_000))
        # box meshes get the 3D STENCIL consensus (zero index ops), which
        # beats the stock path well below the memory-driven 1.5M cutoff
        if cfg.dim == 3 and cfg.test_type in ("SquareGrid", "Shoulder"):
            soa_min = min(
                soa_min,
                int(os.environ.get("MMADMM_SOA_STENCIL_MIN", 500_000)),
            )
        want_soa = (
            soa_env == "1"
            or (soa_env != "0" and mesh.n_elements >= soa_min)
        )
        soa_ok = (
            cfg.dim == 3 and not cfg.comp_mesh and device_mesh is None
            and (mesh.grid.constant
                 or (mesh.grid.cell_table is not None
                     and mesh.grid.cell_table.shape[-1] == 48))
        )
        if want_soa and soa_ok:
            from .integrators.admm_soa import SoAADMM3D

            integ = SoAADMM3D(
                mesh, cfg.dt,
                admm_iters=cfg.admm_iter, tol=cfg.step_tol,
                prox_max_iters=cfg.prox_newton_iters,
                grad_use=cfg.grad_use,
                # box meshes get the 3D stencil consensus ops
                grid_dims=(
                    (cfg.nx, cfg.ny, cfg.nz)
                    if cfg.test_type in ("SquareGrid", "Shoulder")
                    else None
                ),
            )
            return mesh, integ
        # structured 2D meshes at scale: the stencil engine replaces the
        # index-bound gather/scatter pair (~2/3 of the ADMM iteration,
        # COVERAGE.md roofline) with shifted-slice arithmetic
        # (integrators/admm_grid2d.py). MMADMM_GRID2D=1/0 forces/disables.
        # Gate: measured a clear win down to Monitor180 (19.2k live /
        # 25.6k dense elements: 4.4 -> 1.5 ms/step on-chip, row 4.8x ->
        # 14.3x), so the threshold sits below its LIVE count; smaller
        # shipped configs are ineligible anyway (NFd % 1024 != 0).
        g2_env = os.environ.get("MMADMM_GRID2D")
        g2_min = int(os.environ.get("MMADMM_GRID2D_MIN", 15_000))
        want_g2 = (
            g2_env == "1"
            or (g2_env != "0" and mesh.n_elements >= g2_min)
        )
        g2_ok = (
            cfg.dim == 2 and not cfg.comp_mesh and device_mesh is None
            and cfg.test_type in ("SquareGrid", "Shoulder")
            and mesh.grid.cell_table is not None
            and not mesh.grid.constant
            and mesh.grid.cell_table.shape[-1] == 16
            and (4 * cfg.nx * cfg.ny) % 1024 == 0
            and mesh.n_pnts == (cfg.nx + 1) * (cfg.ny + 1) + cfg.nx * cfg.ny
            and os.environ.get("MMADMM_PROX") != "vmap"
        )
        if want_g2 and g2_ok:
            from .integrators.admm_grid2d import GridADMM2D

            integ = GridADMM2D(
                mesh, cfg.dt, cfg.nx, cfg.ny,
                admm_iters=cfg.admm_iter, tol=cfg.step_tol,
                prox_max_iters=cfg.prox_newton_iters,
                grad_use=cfg.grad_use,
            )
            return mesh, integ
        integ = ADMMIntegrator(
            mesh, cfg.dt,
            admm_iters=cfg.admm_iter, tol=cfg.step_tol,
            prox_max_iters=cfg.prox_newton_iters, grad_use=cfg.grad_use,
            device_mesh=device_mesh,
        )
    elif cfg.method == 1:
        g2_dims = (
            (cfg.nx, cfg.ny)
            if cfg.dim == 2 and cfg.test_type in ("SquareGrid", "Shoulder")
            else None
        )
        integ = EulerIntegrator(
            mesh, cfg.dt, device_mesh=device_mesh, grid2d_dims=g2_dims
        )
    elif cfg.method == 2:
        # structured 2D meshes: hand the cell-grid dims to BE so its
        # Richardson matvecs can run on the stencil engine at scale
        g2_dims = (
            (cfg.nx, cfg.ny)
            if cfg.dim == 2 and cfg.test_type in ("SquareGrid", "Shoulder")
            else None
        )
        integ = BackwardEulerIntegrator(
            mesh, cfg.dt, tol=cfg.step_tol, device_mesh=device_mesh,
            grid2d_dims=g2_dims,
        )
    else:
        raise ValueError(f"unknown method {cfg.method}")
    return mesh, integ
