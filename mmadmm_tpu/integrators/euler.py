"""Explicit Euler gradient-flow integrator (reference methodType 1).

``MeshIntegrator::eulerStep`` (``src/MeshIntegrator.cpp:87-94``):
``x <- x - (dt/tau) grad I(x)`` with the gradient assembled to INTERIOR
nodes only (``Mesh::eulerStepMod``, ``src/Mesh.cpp:533-579``). Returns the
functional value at the pre-step positions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..mesh import MovingMesh


class EulerState(NamedTuple):
    x: jnp.ndarray


class EulerIntegrator:
    def __init__(self, mesh: MovingMesh, dt: float):
        self.mesh = mesh
        self.dt = float(dt)
        dt_tau = self.dt / mesh.tau

        # mesh arrays are call arguments, not closure constants (same
        # compile-size rationale as ADMMIntegrator._consts)
        def step(x, F, xi, grid, masks):
            ih, g = mesh._gradient_impl(x, F, xi, grid, masks, True)
            return x - dt_tau * g, ih

        self._step_jit = jax.jit(step)
        self._args = (
            mesh.F, mesh.xi, mesh.grid,
            (mesh.elem_free, mesh.interior_nodes, mesh.dense_idx),
        )

    def init_state(self) -> EulerState:
        return EulerState(x=self.mesh.X0)

    def step(self, state: EulerState):
        x, ih = self._step_jit(state.x, *self._args)
        return EulerState(x=x), float(ih)

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
