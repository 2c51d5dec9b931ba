"""Verify the persistent compile cache round-trips on the axon backend.

Run twice: first run populates .jax_cache, second should hit it.
Prints compile seconds for a non-trivial jit so a hit is unmistakable.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from mmadmm_tpu.runtime.cache import enable_persistent_cache

path = enable_persistent_cache()
print("cache dir:", path, flush=True)

import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)


def f(x):
    def body(i, c):
        return c * 0.999 + jnp.sin(c) * 1e-3 + i * 0.0

    return jax.lax.fori_loop(0, 37, body, x @ x.T)


x = jnp.ones((256, 256), jnp.float32)
t0 = time.perf_counter()
c = jax.jit(f).lower(x).compile()
t1 = time.perf_counter()
r = c(x)
jax.block_until_ready(r)
print(f"compile {t1-t0:.2f} s  run {(time.perf_counter()-t1)*1e3:.1f} ms", flush=True)
