"""Whole-run device loop: the outer DtTol time loop as ONE compiled program.

The reference's outer loop is a tight C++ loop (``main.cpp:180-211``):
step, check ``|Ih - Ihprev| / dt < DtTol``, stop. Round 3 kept that loop
on the host (chunked ``lax.scan`` dispatches), which puts the ~100-250 ms
tunnel round-trip in series with every chunk — the measured floor for the
small baseline configs (3DMonitor110_m1 0.478x, Monitor120_m2 0.121x in
``Results/tpu_bench.json``). This module folds the stop into the device
program: a ``lax.while_loop`` over outer steps with the DtTol test (and an
optional target-energy test) in-graph, returning the energy trace and the
number of steps taken. Small configs then pay ONE dispatch for the whole
run.

Stop semantics are the reference's exactly: the first step never stops,
``ih_prev`` updates every non-stopping step, and the loop runs at most
``cap`` steps (``nSteps``). The optional ``target_ih`` stop (first touch
of a given energy) exists for honest time-to-reference-quality
measurement: the bench reruns the program with the target stop enabled
and times that single dispatch — wall time to the step where the
reference's converged energy is first reached, with no post-hoc
interpolation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def build_run_loop(step_fn, dt: float, cap: int):
    """Compile-ready whole-run loop around ``step_fn(state, consts) ->
    (state', ih_f64)``.

    Returns ``run(state, consts, dt_tol, target_ih, use_target,
    min_steps, stop_on_rise) -> (state', trace[cap] f64, steps i32)`` —
    jit it (or shard_map it) at the call site. ``cap`` is the static step
    bound (``nSteps``); ``dt_tol``/``target_ih``/``use_target``/
    ``min_steps``/``stop_on_rise`` are traced scalars so stop criteria
    change without recompiling.
    ``min_steps`` arms the target stop only from that step on — an energy
    trace under the predictor guard is not monotone, so "time to
    reference quality" must mean the LAST downward crossing (the same
    reset-on-rise rule the host bench applies); the caller finds that
    step from a full DtTol run's trace and reruns with ``min_steps`` set
    to it. Unwritten trace slots are NaN.
    """
    cap = int(cap)
    dt = float(dt)

    def run(state, consts, dt_tol, target_ih, use_target, min_steps,
            stop_on_rise):
        trace0 = jnp.full((cap,), jnp.nan, dtype=jnp.float64)

        def cond(carry):
            _state, _ih_prev, k, _trace, done = carry
            return jnp.logical_and(k < cap, ~done)

        def body(carry):
            state, ih_prev, k, trace, _done = carry
            state, ih = step_fn(state, consts)
            ih = ih.astype(jnp.float64)
            trace = jax.lax.dynamic_update_index_in_dim(trace, ih, k, 0)
            stop_dttol = jnp.logical_and(
                k > 0, jnp.abs((ih - ih_prev) / dt) < dt_tol
            )
            stop_target = jnp.logical_and(
                jnp.logical_and(use_target, k + 1 >= min_steps),
                ih <= target_ih,
            )
            # stop-on-rise: the rule the reference's RECORDED artifacts
            # evidently used for some runs — `|| dIdt > 0` survives as a
            # commented-out clause of the shipped stop (main.cpp:204),
            # and e.g. Results/Monitor2320/Ih1.txt ends on an energy
            # RISE after 7 steps, which the shipped |dIh/dt| rule cannot
            # produce. Opt-in, for artifact-faithful comparisons.
            stop_rise = jnp.logical_and(
                jnp.logical_and(stop_on_rise, k > 0), ih > ih_prev
            )
            # divergence stop: a non-finite energy ends the run (the
            # harness NaN watchdog's in-graph analogue; the reference
            # aborts on its Edet assert instead)
            stop_nan = ~jnp.isfinite(ih)
            done = jnp.logical_or(
                jnp.logical_or(stop_dttol, stop_target),
                jnp.logical_or(stop_rise, stop_nan),
            )
            return state, ih, k + 1, trace, done

        init = (
            state,
            jnp.asarray(jnp.inf, jnp.float64),
            jnp.zeros((), jnp.int32),
            trace0,
            jnp.zeros((), bool),
        )
        state, _ih, steps, trace, _done = jax.lax.while_loop(cond, body, init)
        return state, trace, steps

    return run
