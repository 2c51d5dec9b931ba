"""Explicit Euler gradient-flow integrator (reference methodType 1).

``MeshIntegrator::eulerStep`` (``src/MeshIntegrator.cpp:87-94``):
``x <- x - (dt/tau) grad I(x)`` with the gradient assembled to INTERIOR
nodes only (``Mesh::eulerStepMod``, ``src/Mesh.cpp:533-579``). Returns the
functional value at the pre-step positions.

Sharded execution (``device_mesh``): the element batch is sharded over the
``"elems"`` mesh axis exactly like the ADMM step (RCB-ordered
``ElemShards``); each shard assembles its local partial node gradient and
one ``psum`` completes the field — the reference's eulerStepMod is a
*serial* loop, so this is a new capability, not a port. Semantics match
the single-device step to float reduction order
(tests/test_spmd_methods.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..mesh import MovingMesh
from ..ops.reductions import block_sum_f64


class EulerState(NamedTuple):
    x: jnp.ndarray


def build_sharded_gradient(mesh: MovingMesh, shards):
    """Shard-local (ih, grad) assembly for the ``interior_only`` gradient
    path (Mesh::eulerStepMod semantics): per-element energy+grad on the
    local slice, padding masked by ``valid``, one psum over ``"elems"``.
    Returns ``grad_at(x, F_l, xi_l, valid_l, dense_l, grid, interior)``
    for use INSIDE shard_map. Shared by the Euler and backward-Euler
    sharded steps."""
    from ..ops import huang
    from ..ops.monitor_grid import gather_cell
    from ..ops.scatter import scatter_add_dense

    ehat, cm = mesh.ehat, mesh.comp_mesh
    n_pnts = mesh.n_pnts

    gather_cells = jax.vmap(
        jax.vmap(gather_cell, in_axes=(None, 0)), in_axes=(None, 0)
    )

    def _eg(z, xi, cells):
        return huang.element_energy_grad(
            z, xi, None, ehat, cm, cells=cells
        )

    def grad_at(xv, F_l, xi_l, valid_l, dense_l, grid, interior):
        z_l = xv[F_l]
        cells_l = gather_cells(grid, z_l)
        ih_e, g_e = jax.vmap(_eg)(z_l, xi_l, cells_l)
        vals = g_e * valid_l[:, None, None]
        part = scatter_add_dense(vals, dense_l.reshape(n_pnts, -1))
        g = jax.lax.psum(part, "elems") * interior
        ih = jax.lax.psum(block_sum_f64(ih_e * valid_l), "elems")
        return ih, g

    return grad_at


class EulerIntegrator:
    def __init__(self, mesh: MovingMesh, dt: float, *, device_mesh=None,
                 grid2d_dims: tuple[int, int] | None = None):
        self.mesh = mesh
        self.dt = float(dt)
        dt_tau = self.dt / mesh.tau
        self.device_mesh = device_mesh
        self._multi_cache: dict[int, object] = {}
        self._run_cache: dict[int, object] = {}

        if device_mesh is None:
            self.shards = None

            # structured 2D at scale: the (ih, grad) eval runs on the
            # stencil engine + VMEM component kernels (the backward-Euler
            # machinery, ops/dense_eg2d.py). MMADMM_EULER_GRID=0 for A/B.
            import os

            self._grid2d = None
            env_eg = os.environ.get("MMADMM_EULER_GRID")
            if (
                grid2d_dims is not None and mesh.dim == 2
                and env_eg != "0"
                and (env_eg == "1" or mesh.n_elements >= 50_000)
            ):
                from ..ops.dense_eg2d import make_dense_eg2d

                self._grid2d = make_dense_eg2d(mesh, *grid2d_dims)

            if self._grid2d is not None:
                g2_consts, eg_fn = self._grid2d

                def step(x, F, xi, grid, masks, g2c):
                    ih, g = eg_fn(x, grid, g2c, masks[1])
                    return x - dt_tau * g, ih

                self._step_fn = step
                self._step_jit = jax.jit(step)
                self._args = (
                    mesh.F, mesh.xi, mesh.grid,
                    (mesh.elem_free, mesh.interior_nodes, mesh.dense_idx),
                    g2_consts,
                )
            else:
                # mesh arrays are call arguments, not closure constants
                # (same compile-size rationale as ADMMIntegrator._consts)
                def step(x, F, xi, grid, masks):
                    ih, g = mesh._gradient_impl(
                        x, F, xi, grid, masks, True
                    )
                    return x - dt_tau * g, ih

                self._step_fn = step
                self._step_jit = jax.jit(step)
                self._args = (
                    mesh.F, mesh.xi, mesh.grid,
                    (mesh.elem_free, mesh.interior_nodes, mesh.dense_idx),
                )
        else:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from ..parallel.spmd import put_global

            shards = mesh.build_shards(device_mesh.devices.size)
            assert shards.dense_idx is not None, (
                "sharded Euler requires the degree-padded scatter plan"
            )
            self.shards = shards
            grad_at = build_sharded_gradient(mesh, shards)

            def local_step(x, F_l, xi_l, valid_l, dense_l, grid, interior):
                ih, g = grad_at(x, F_l, xi_l, valid_l, dense_l, grid,
                                interior)
                return x - dt_tau * g, ih

            sharded = shard_map(
                local_step,
                mesh=device_mesh,
                in_specs=(P(), P("elems"), P("elems"), P("elems"),
                          P("elems", None, None), P(), P()),
                out_specs=(P(), P()),
                check_vma=False,
            )
            self._step_fn = sharded
            self._step_jit = jax.jit(sharded)
            self._args = tuple(
                put_global(a, device_mesh, s)
                for a, s in zip(
                    (shards.F, shards.xi, shards.valid, shards.dense_idx,
                     mesh.grid, mesh.interior_nodes),
                    (P("elems"), P("elems"), P("elems"),
                     P("elems", None, None), P(), P()),
                )
            )

    def init_state(self) -> EulerState:
        x0 = self.mesh.X0
        if self.device_mesh is not None:
            from jax.sharding import PartitionSpec as P

            from ..parallel.spmd import put_global

            x0 = put_global(x0, self.device_mesh, P())
        return EulerState(x=x0)

    def run_device(self, state, *, cap, dt_tol, target_ih=None,
                   min_steps=0, stop_on_rise=False):
        """Whole-run device loop (see ``ADMMIntegrator.run_device``).
        Returns (state', ih_trace[cap] f64, steps i32)."""
        cap = int(cap)
        if cap not in self._run_cache:
            from .device_loop import build_run_loop

            step_fn = self._step_fn

            def step2(s, c):
                x, ih = step_fn(s.x, *c)
                return EulerState(x=x), ih

            run = jax.jit(build_run_loop(step2, self.dt, cap))
            self._run_cache[cap] = lambda s, *a: run(s, self._args, *a)
        use = target_ih is not None
        return self._run_cache[cap](
            state,
            jnp.asarray(dt_tol, jnp.float64),
            jnp.asarray(target_ih if use else 0.0, jnp.float64),
            jnp.asarray(use),
            jnp.asarray(min_steps, jnp.int32),
            jnp.asarray(bool(stop_on_rise)),
        )

    def step(self, state: EulerState):
        x, ih = self._step_jit(state.x, *self._args)
        return EulerState(x=x), float(ih)

    def multi_step(self, state: EulerState, k: int):
        """K Euler steps in ONE device program (lax.scan) — amortizes the
        per-step dispatch latency that dominates small problems on TPU
        (the analogue of ADMMIntegrator.multi_step). Returns
        (state', ih[k])."""
        k = int(k)
        if k not in self._multi_cache:
            step_fn = self._step_fn

            def scan_fn(x, *args):
                def body(xc, _):
                    xn, ih = step_fn(xc, *args)
                    return xn, ih

                return jax.lax.scan(body, x, None, length=k)

            self._multi_cache[k] = jax.jit(scan_fn)
        x, ihs = self._multi_cache[k](state.x, *self._args)
        return EulerState(x=x), ihs

    def energy(self, state: EulerState) -> float:
        return float(self.mesh.energy(state.x))

    def run(self, n_steps: int, dt_tol: float, state=None, verbose=False):
        if state is None:
            state = self.init_state()
        ih_trace = [self.energy(state)]
        ih_prev = float("inf")
        for i in range(n_steps):
            state, ih = self.step(state)
            ih_trace.append(ih)
            if verbose:
                print(f"step {i}: Ih={ih:.8g}")
            if i != 0 and abs((ih - ih_prev) / self.dt) < dt_tol:
                break
            ih_prev = ih
        return state, ih_trace
