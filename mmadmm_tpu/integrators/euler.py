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

        self._step_fn = step
        self._step_jit = jax.jit(step)
        self._args = (
            mesh.F, mesh.xi, mesh.grid,
            (mesh.elem_free, mesh.interior_nodes, mesh.dense_idx),
        )
        self._multi_cache: dict[int, object] = {}
        self._run_cache: dict[int, object] = {}

    def init_state(self) -> EulerState:
        return EulerState(x=self.mesh.X0)

    def run_device(self, state, *, cap, dt_tol, target_ih=None,
                   min_steps=0):
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

            def scan_fn(x, F, xi, grid, masks):
                def body(xc, _):
                    xn, ih = step_fn(xc, F, xi, grid, masks)
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
