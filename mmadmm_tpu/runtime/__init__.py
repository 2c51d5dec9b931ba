"""Runtime support: native (C++) kernel bindings, profiling."""

from .native import glibc_rand_fill, grid_nn_map, native_available

__all__ = ["grid_nn_map", "glibc_rand_fill", "native_available"]
