"""Geometry: generators, orientation, topology, carve, IO."""

import numpy as np
import pytest

from mmadmm_tpu.geometry import io as mesh_io
from mmadmm_tpu.geometry.level_set import circle_phi, mesh_from_level_set
from mmadmm_tpu.geometry.node_type import NodeType
from mmadmm_tpu.geometry.rect_mesh import generate_uniform_rect_mesh
from mmadmm_tpu.geometry.shoulder import make_shoulder_mesh
from mmadmm_tpu.geometry.topology import (
    build_boundary_faces,
    element_edge_dets,
    node_degrees,
    partition_elements,
    reorient_elements,
    sorted_scatter_plan,
)


def test_rect_2d_counts():
    nx = ny = 4
    X, F, mask = generate_uniform_rect_mesh(2, nx, ny)
    assert X.shape == ((nx + 1) * (ny + 1) + nx * ny, 2)
    assert F.shape == (4 * nx * ny, 3)
    # corners fixed (MeshUtils.h:173-177)
    for cid in [0, nx, (nx + 1) * ny, (nx + 1) * (ny + 1) - 1]:
        assert mask[cid] == NodeType.BOUNDARY_FIXED
    # midpoints interior
    assert (mask[(nx + 1) * (ny + 1):] == NodeType.INTERIOR).all()


def test_rect_2d_covers_domain():
    X, F, _ = generate_uniform_rect_mesh(2, 3, 3, xa=0, xb=1, ya=0, yb=1)
    F = reorient_elements(X, F)
    areas = element_edge_dets(X, F) / 2.0
    assert np.all(areas > 0)
    assert np.isclose(areas.sum(), 1.0)


def test_rect_3d_counts_and_volume():
    nx = ny = nz = 3
    X, F, mask = generate_uniform_rect_mesh(3, nx, ny, nz)
    assert X.shape == ((nx + 1) ** 3 + nx**3, 3)
    assert F.shape == (12 * nx**3, 4)
    F = reorient_elements(X, F)
    vols = element_edge_dets(X, F) / 6.0
    assert np.all(vols > 0)
    assert np.isclose(vols.sum(), 1.0)


def test_rect_3d_boundary_mask():
    nx = ny = nz = 4
    X, F, mask = generate_uniform_rect_mesh(
        3, nx, ny, nz, boundary_type=NodeType.BOUNDARY_FREE
    )
    n_grid = (nx + 1) ** 3
    on_bdy = (
        np.isclose(X[:n_grid], 0.0) | np.isclose(X[:n_grid], 1.0)
    ).any(axis=1)
    assert (mask[:n_grid][~on_bdy] == NodeType.INTERIOR).all()
    assert (mask[:n_grid][on_bdy] != NodeType.INTERIOR).all()
    # cube edges fixed
    n_ext = (np.isclose(X[:n_grid], 0.0) | np.isclose(X[:n_grid], 1.0)).sum(axis=1)
    assert (mask[:n_grid][n_ext >= 2] == NodeType.BOUNDARY_FIXED).all()


def test_reorient_fixes_negative_elements():
    X, F, _ = generate_uniform_rect_mesh(2, 2, 2)
    Fbad = F.copy()
    Fbad[:, [1, 2]] = Fbad[:, [2, 1]]  # flip all
    Ffix = reorient_elements(X, Fbad)
    assert np.all(element_edge_dets(X, Ffix) > 0)


def test_degrees_and_scatter_plan():
    X, F, _ = generate_uniform_rect_mesh(2, 3, 3)
    deg = node_degrees(F, X.shape[0])
    assert deg.sum() == F.size
    # midpoints touch exactly 4 triangles
    assert (deg[(3 + 1) * (3 + 1):] == 4).all()
    perm, seg = sorted_scatter_plan(F, X.shape[0])
    vals = np.random.RandomState(0).randn(F.shape[0], F.shape[1], 2)
    dense = np.zeros((X.shape[0], 2))
    for e in range(F.shape[0]):
        for s in range(F.shape[1]):
            dense[F[e, s]] += vals[e, s]
    flat = vals.reshape(-1, 2)
    out = np.zeros_like(dense)
    np.add.at(out, seg, flat[perm])
    np.testing.assert_allclose(out, dense, rtol=1e-14)


def test_boundary_faces_2d():
    X, F, mask = generate_uniform_rect_mesh(2, 3, 3)
    faces = build_boundary_faces(F, mask)
    # 2D: each boundary cell side contributes one edge face: 4*nx edges
    assert faces.shape == (4 * 3, 2)
    assert (mask[faces] != NodeType.INTERIOR).all()


def test_partition_balanced():
    X, F, _ = generate_uniform_rect_mesh(2, 8, 8)
    perm = partition_elements(X, F, 8)
    assert sorted(perm.tolist()) == list(range(F.shape[0]))


def test_level_set_circle():
    X, F, mask = mesh_from_level_set(circle_phi, 2, 24, 24)
    F2 = reorient_elements(X, F)
    areas = element_edge_dets(X, F2) / 2.0
    assert np.all(areas > 0)
    # carved area close to circle area (r = 0.35)
    assert abs(areas.sum() - np.pi * 0.35**2) / (np.pi * 0.35**2) < 0.15
    # boundary nodes on the circle
    bdy = mask == NodeType.BOUNDARY_FIXED
    assert bdy.sum() > 0
    r = np.sqrt(((X[bdy] - 0.5) ** 2).sum(axis=1))
    np.testing.assert_allclose(r, 0.35, atol=1e-9)
    # all F indices valid & used
    assert F.min() == 0 and F.max() == X.shape[0] - 1


def test_shoulder_mesh_2d():
    X, F, mask = make_shoulder_mesh(2, 20, 20)
    # elements in the top-right quadrant removed: 3/4 of cells remain
    assert F.shape[0] == 4 * 20 * 20 * 3 // 4
    F2 = reorient_elements(X, F)
    assert np.all(element_edge_dets(X, F2) > 0)
    # re-entrant corner node (0.5, 0.5) is fixed
    nid = np.where((np.abs(X[:, 0] - 0.5) < 1e-12) & (np.abs(X[:, 1] - 0.5) < 1e-12))[0]
    # the corner node itself is unperturbed: exact match must exist
    assert nid.size == 1
    assert mask[nid[0]] == NodeType.BOUNDARY_FIXED


def test_shoulder_perturbation_deterministic():
    X1, _, _ = make_shoulder_mesh(2, 10, 10, seed=69)
    X2, _, _ = make_shoulder_mesh(2, 10, 10, seed=69)
    np.testing.assert_array_equal(X1, X2)
    X3, _, _ = make_shoulder_mesh(2, 10, 10, perturb=False)
    assert not np.allclose(X1, X3)
    # perturbation bounded by h/10
    d = np.linalg.norm(X1 - X3, axis=1)
    h = np.sqrt(2) * 0.1
    assert d.max() <= h / 10.0 + 1e-15


def test_io_roundtrip(tmp_path):
    X, F, mask = generate_uniform_rect_mesh(2, 3, 3)
    mesh_io.write_points(tmp_path / "p.txt", X)
    mesh_io.write_triangles(tmp_path / "t.txt", F)
    mesh_io.write_mask(tmp_path / "m.txt", mask)
    X2, F2, mask2 = mesh_io.read_mesh(
        tmp_path / "t.txt", tmp_path / "p.txt", tmp_path / "m.txt"
    )
    np.testing.assert_allclose(X2, X, atol=1e-5)  # 6 sig digits in files
    np.testing.assert_array_equal(F2, F)
    np.testing.assert_array_equal(mask2, mask)


def test_read_shipped_circle_mesh():
    """FromFile mode reads the reference's shipped BaseCircle meshes
    (Monitor3* configs)."""
    import os

    base = "/root/reference/Experiments/Results/BaseCircle"
    if not os.path.isdir(base):
        pytest.skip("reference not mounted")
    X, F, mask = mesh_io.read_mesh(
        f"{base}/CircleEx12triangles.txt",
        f"{base}/CircleEx12points.txt",
        f"{base}/CircleEx12mask.txt",
    )
    assert X.shape[1] == 2 and F.shape[1] == 3
    assert F.max() < X.shape[0]
    assert mask.shape[0] == X.shape[0]
    F2 = reorient_elements(X, F)
    assert np.all(element_edge_dets(X, F2) > 0)


def test_boundary_projection_2d():
    """Free-slip projection (Mesh::projection2D semantics, Mesh.cpp:119-174):
    a perturbed BOUNDARY_FREE node returns to the closest point on an
    incident boundary edge; an off-segment projection clamps to the nearer
    endpoint; fixed/interior nodes never move."""
    import jax.numpy as jnp

    from mmadmm_tpu.ops.boundary import make_boundary_projector

    X, F, mask = generate_uniform_rect_mesh(
        2, 4, 4, 0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0,
        boundary_type=NodeType.BOUNDARY_FREE,
    )
    from mmadmm_tpu.geometry.topology import build_boundary_faces

    faces = build_boundary_faces(F, mask)
    assert faces.shape[0] > 0
    project = make_boundary_projector(faces, mask, 2)

    x = jnp.asarray(X)
    # pick a free node on the bottom edge (y == 0, not a corner)
    free = np.nonzero(
        (mask == NodeType.BOUNDARY_FREE) & (X[:, 1] == 0.0)
        & (X[:, 0] > 0.0) & (X[:, 0] < 1.0)
    )[0]
    assert free.size > 0
    n = int(free[0])
    # pull it off the boundary; projection against the committed geometry
    # puts it back on y = 0 keeping x
    x_pert = x.at[n, 1].add(0.07)
    x_proj = project(x_pert, x)
    np.testing.assert_allclose(float(x_proj[n, 1]), 0.0, atol=1e-12)
    np.testing.assert_allclose(float(x_proj[n, 0]), X[n, 0], atol=1e-12)
    # everything else untouched
    others = np.ones(X.shape[0], bool)
    others[n] = False
    np.testing.assert_array_equal(
        np.asarray(x_proj)[others], np.asarray(x_pert)[others]
    )


def test_boundary_projection_3d():
    import jax.numpy as jnp

    from mmadmm_tpu.geometry.topology import build_boundary_faces
    from mmadmm_tpu.ops.boundary import make_boundary_projector

    X, F, mask = generate_uniform_rect_mesh(
        3, 3, 3, 3, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0,
        boundary_type=NodeType.BOUNDARY_FREE,
    )
    faces = build_boundary_faces(F, mask)
    project = make_boundary_projector(faces, mask, 3)

    x = jnp.asarray(X)
    free = np.nonzero(
        (mask == NodeType.BOUNDARY_FREE) & (X[:, 2] == 0.0)
        & (X[:, 0] > 0.0) & (X[:, 0] < 1.0)
        & (X[:, 1] > 0.0) & (X[:, 1] < 1.0)
    )[0]
    assert free.size > 0
    n = int(free[0])

    # reference semantics (projection3D, Mesh.cpp:176-233): a proposal
    # straight above the node itself projects onto a VERTEX (barycentric
    # (0,0,1)), which CHECK_EPS rejects -> the node does not move
    x_vert = x.at[n, 2].add(0.05)
    np.testing.assert_array_equal(
        np.asarray(project(x_vert, x)), np.asarray(x_vert)
    )

    # a proposal above a strictly interior point of an incident boundary
    # triangle projects onto exactly that point
    incident = [f for f in faces if n in f and np.all(X[f][:, 2] == 0.0)]
    target = X[incident[0]].mean(axis=0)  # centroid, strictly inside
    x_pert = x.at[n].set(jnp.asarray(target + np.array([0.0, 0.0, 0.05])))
    x_proj = project(x_pert, x)
    np.testing.assert_allclose(np.asarray(x_proj)[n], target, atol=1e-12)


def test_boundary_projection_via_mesh_api():
    """MovingMesh.project_onto_boundary on an all-fixed mesh is a no-op
    (no BOUNDARY_FREE nodes -> identity), and runs jitted."""
    import jax.numpy as jnp

    from mmadmm_tpu.config import ExperimentConfig
    from mmadmm_tpu.problems import build_problem

    cfg = ExperimentConfig(
        test_type="SquareGrid", dim=2, mon_type=1, method=0,
        nx=4, ny=4, dt=5e-3, tau=0.1, rho=50.0,
    )
    mesh, _ = build_problem(cfg)
    x2 = mesh.project_onto_boundary(mesh.X0)
    np.testing.assert_array_equal(np.asarray(x2), np.asarray(mesh.X0))
