"""Host-side geometry: mesh generation, carving, topology, IO.

Everything in this subpackage is trace-time / setup-time NumPy (optionally
accelerated by the C++ native module in ``native/``); device code lives in
``mmadmm_tpu.ops``.
"""

from .node_type import NodeType
from .rect_mesh import generate_uniform_rect_mesh
from .topology import reorient_elements, node_degrees, build_boundary_faces
from .level_set import mesh_from_level_set
from .shoulder import make_shoulder_mesh
from . import io

__all__ = [
    "NodeType",
    "generate_uniform_rect_mesh",
    "reorient_elements",
    "node_degrees",
    "build_boundary_faces",
    "mesh_from_level_set",
    "make_shoulder_mesh",
    "io",
]
