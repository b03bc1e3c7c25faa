"""Synthetic mesh fixtures for tests and benchmarks.

The reference ships zero tests and no fixtures (SURVEY.md section 4); this
module is the from-scratch fixture factory: structured hexahedral GLL
meshes over boxes and spherical shells (the two geometries seismic meshes
are made of), with smooth analytic fields that interpolation must
reproduce, plus writers for Salvus-format HDF5 files (see io.salvus).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from .core import gll


@dataclasses.dataclass
class StructuredMesh:
    """A structured hex mesh with GLL lattice nodes per element.

    points:        [nelem, n_gll, dim]  node coordinates (canonical order)
    connectivity:  [nelem, 2^dim]       corner-vertex indices into `vertices`
    vertices:      [nvert, dim]         unique corner vertices
    order:         polynomial order of the per-element lattice
    layer_id:      [nelem]              integer layer of each element
    """

    points: np.ndarray
    connectivity: np.ndarray
    vertices: np.ndarray
    order: int
    layer_id: np.ndarray

    @property
    def nelem(self) -> int:
        return self.points.shape[0]

    @property
    def dim(self) -> int:
        return self.points.shape[2]

    @property
    def n_gll(self) -> int:
        return self.points.shape[1]

    def centroids(self) -> np.ndarray:
        return self.points.mean(axis=1)


def _structured_corners(shape, dim):
    """Vertex grid + per-element corner connectivity for a structured grid.

    Corner ordering is canonical (order-1 lattice ordering, matching
    gll.corner_indices).
    """
    nv = [s + 1 for s in shape]
    vert_idx = np.arange(int(np.prod(nv))).reshape(nv)
    grids = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    if dim == 3:
        i, j, k = grids
        cols = [
            vert_idx[i + a, j + b, k + c_].ravel()
            for a in (0, 1) for b in (0, 1) for c_ in (0, 1)
        ]
    else:
        i, j = grids
        cols = [
            vert_idx[i + a, j + b].ravel()
            for a in (0, 1) for b in (0, 1)
        ]
    return np.stack(cols, axis=-1).astype(np.int64)


def box_mesh(
    shape=(4, 4, 4),
    order: int = 4,
    extent=None,
    warp: float = 0.0,
    seed: int = 0,
) -> StructuredMesh:
    """Structured box mesh of hex elements with GLL lattices.

    ``warp`` > 0 applies a smooth sinusoidal deformation to interior
    vertices (elements become non-affine but stay valid for warp <~ 0.2).
    """
    dim = len(shape)
    if extent is None:
        extent = [(0.0, 1.0)] * dim
    axes = [np.linspace(lo, hi, s + 1) for (lo, hi), s in zip(extent, shape)]
    grids = np.meshgrid(*axes, indexing="ij")
    vertices = np.stack([g.ravel() for g in grids], axis=-1)

    conn = _structured_corners(shape, dim)

    # Per-element GLL lattice via the (possibly warped) geometry map: we
    # evaluate the warp at the *physical* lattice positions so elements
    # are genuinely curved, not just trilinear with moved corners.
    lat = gll.lattice_coords(order, dim)  # [n, dim] in [-1,1]
    n = lat.shape[0]
    corners = vertices[conn]  # [E, 2^dim, dim]
    # trilinear basis at the lattice, pure numpy (fixtures must not touch
    # the device): prod_d (1 + ref_d * corner_ref_d) / 2^dim
    corner_ref = gll.lattice_coords(1, dim)  # [2^dim, dim]
    tri_basis = np.prod(
        1.0 + lat[:, None, :] * corner_ref[None, :, :], axis=-1
    ) / (2.0**dim)  # [n, 2^dim]
    points = np.einsum("nc,ecd->end", tri_basis, corners)

    if warp > 0.0:
        spans = np.array([hi - lo for lo, hi in extent])
        lo = np.array([lo for lo, hi in extent])
        u = (points - lo) / spans  # in [0,1]^d
        bump = np.sin(np.pi * u)  # vanishes on every face
        disp = np.zeros_like(points)
        for d in range(dim):
            # the extra bump[..., d] factor keeps the displacement zero
            # wherever u_d is 0 or 1, so the warped mesh still covers
            # exactly the nominal box (a face-normal displacement would
            # push boundary faces inward and make points near the
            # nominal extent spuriously exterior)
            disp[..., d] = (
                spans[d]
                * warp**2
                * bump[..., d]
                * bump[..., (d + 1) % dim]
                * bump[..., (d + 2) % dim if dim == 3 else (d + 1) % dim]
                * 0.5
            )
        points = points + disp
        # keep corner vertices consistent with the warped geometry
        ci = gll.corner_indices(order, dim)
        flat_conn = conn.ravel()
        vertices = vertices.copy()
        vertices[flat_conn] = points[:, ci, :].reshape(-1, dim)

    layer_id = np.zeros(conn.shape[0], dtype=np.int64)
    return StructuredMesh(points, conn, vertices, order, layer_id)


def shell_mesh(
    n_lat: int = 6,
    n_lon: int = 8,
    n_rad: int = 3,
    order: int = 4,
    r_inner: float = 3.48e6,
    r_outer: float = 6.371e6,
    lat_extent=(0.5, 1.2),
    lon_extent=(0.3, 1.4),
    n_layers: int = 1,
) -> StructuredMesh:
    """Curved spherical-shell mesh chunk at Earth scale.

    Element GLL nodes are placed on exact spherical surfaces, reproducing
    the curved-element geometry of global seismic (Salvus) meshes; radial
    element bands are tagged with descending layer ids (outermost layer has
    the largest id, matching the convention the reference relies on in
    utils._assess_layers, reference multi_mesh/utils.py:394-436).
    """
    shape = (n_rad, n_lat, n_lon)
    mesh = box_mesh(
        shape=shape,
        order=order,
        extent=[(r_inner, r_outer), lat_extent, lon_extent],
    )

    def to_cart(p):
        r, theta, phi = p[..., 0], p[..., 1], p[..., 2]
        return np.stack(
            [
                r * np.sin(theta) * np.cos(phi),
                r * np.sin(theta) * np.sin(phi),
                r * np.cos(theta),
            ],
            axis=-1,
        )

    points = to_cart(mesh.points)
    vertices = to_cart(mesh.vertices)

    # radial band index of each element (0 = innermost); split bands into
    # n_layers contiguous groups.  Outer layers get larger ids so that
    # sorting ids descending puts the crust first, the convention
    # _assess_layers depends on (reference utils.py:396 sorts descending).
    band = (np.arange(mesh.nelem) // (n_lat * n_lon)).astype(np.int64)
    group = (band * n_layers) // n_rad
    layer_id = group + 1
    return StructuredMesh(points, mesh.connectivity, vertices, mesh.order,
                          layer_id)


def smooth_field(points: np.ndarray, kind: str = "smooth",
                 scale: float | None = None) -> np.ndarray:
    """Analytic scalar fields for transfer-accuracy tests.

    ``points`` [..., dim] -> [...].  "smooth" is infinitely differentiable
    (interpolation error decays spectrally); "linear" must be reproduced to
    round-off by any order >= 1.  ``scale`` normalizes coordinates and MUST
    be consistent between mesh-sampled and truth evaluations; by default
    small-coordinate inputs use 1.0 and Earth-scale inputs use R_EARTH.
    """
    if scale is None:
        scale = 1.0 if float(np.max(np.abs(points))) <= 100.0 else 6.371e6
    u = points / scale
    if kind == "linear":
        out = 2.0 + u[..., 0] + 0.5 * u[..., 1]
        if points.shape[-1] == 3:
            out = out - 0.25 * u[..., 2]
        return out
    if kind == "smooth":
        out = (
            4.5
            + np.sin(3.0 * u[..., 0])
            * np.cos(2.0 * u[..., 1] + 0.5)
        )
        if points.shape[-1] == 3:
            out = out + 0.3 * np.sin(2.0 * u[..., 2] + 1.0)
        return out
    raise ValueError(kind)


def element_nodal_field(mesh: StructuredMesh, kind: str = "smooth"):
    """Sample a smooth_field at every GLL node: [nelem, n_gll]."""
    return smooth_field(mesh.points, kind=kind)


def write_salvus_fixture(
    filename,
    mesh: StructuredMesh,
    parameters=("VP", "VS", "RHO"),
    fluid: np.ndarray | None = None,
    global_strings: dict | None = None,
    field_kind: str = "smooth",
):
    """Write a StructuredMesh as a Salvus-format HDF5 file with analytic
    nodal fields (each parameter gets a scaled copy of the same field so
    transfers of multiple parameters are distinguishable)."""
    from .io import salvus as sio

    base = element_nodal_field(mesh, field_kind)
    nodal = {
        p: base * (1.0 + 0.1 * i) for i, p in enumerate(parameters)
    }
    r = np.linalg.norm(mesh.points, axis=-1)
    nodal["z_node_1D"] = r / 6.371e6  # spherical 1D radius fraction
    if fluid is None:
        fluid = np.zeros(mesh.nelem)
    elemental = {
        "fluid": np.asarray(fluid, np.float64),
        "layer": mesh.layer_id.astype(np.float64),
    }
    sio.write_salvus_mesh(
        filename, mesh.points, nodal, elemental, global_strings or {}
    )
    return nodal


def write_exodus_fixture(
    filename, mesh: StructuredMesh, parameters=("VP", "VS", "RHO"),
    field_kind: str = "smooth",
):
    """Write the corner-vertex skeleton of a StructuredMesh as an Exodus II
    file with analytic nodal fields."""
    from .io import exodus as eio

    base = smooth_field(mesh.vertices, field_kind)
    nodal = {p: base * (1.0 + 0.1 * i) for i, p in enumerate(parameters)}
    elemental = {"something_elemental": np.arange(mesh.nelem, dtype=float)}
    eio.write_exodus(
        filename, mesh.vertices, mesh.connectivity, nodal, elemental,
        canonical_order=True,
    )
    return nodal


def smooth_field_jnp(points, kind: str = "smooth", scale: float = 6.371e6):
    """Device (jax.numpy) twin of smooth_field for on-device accuracy
    checks at scales where evaluating 10^8 transcendentals on the host
    would dominate; Earth-scale normalization by default."""
    import jax.numpy as jnp

    u = points / scale
    if kind == "linear":
        out = 2.0 + u[..., 0] + 0.5 * u[..., 1]
        if points.shape[-1] == 3:
            out = out - 0.25 * u[..., 2]
        return out
    if kind == "smooth":
        out = (
            4.5
            + jnp.sin(3.0 * u[..., 0]) * jnp.cos(2.0 * u[..., 1] + 0.5)
        )
        if points.shape[-1] == 3:
            out = out + 0.3 * jnp.sin(2.0 * u[..., 2] + 1.0)
        return out
    raise ValueError(kind)
