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

        def step(x):
            ih, g = mesh.gradient(x, interior_only=True)
            return x - (self.dt / mesh.tau) * g, ih

        self._step = jax.jit(step)

    def init_state(self) -> EulerState:
        return EulerState(x=self.mesh.X0)

    def step(self, state: EulerState):
        x, ih = self._step(state.x)
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
