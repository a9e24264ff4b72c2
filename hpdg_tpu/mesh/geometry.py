"""First-class general (affine) element geometry.

The reference consumes arbitrary per-point geometry through DUNE's
``jacobianInverseTransposed`` inside every assembler
(gausslobattoipdgassembler.hh:337-350); its grids (UGGrid etc.) supply
the maps.  The TPU-native design stores one affine map per element as
mesh data — ``x_phys = mesh.shift[e] + mesh.jac[e] @ x_param`` — and
folds the geometry into the *coefficient tensors* every batched kernel
already consumes:

* bulk:   |det A| A^-1 K A^-T replaces K (the pullback identity),
* faces:  the co-normal flux  n_phys . K grad_phys u  per side becomes
  ``sum_b k_eff[ax, b] (1/h_b) d_b u`` with the SAME trace-gradient
  (``Dall``) contraction the tensor-coefficient path uses (Nanson's
  ``da_phys = |det A| |A^-T n| da_param`` cancels the normalization of
  the physical normal, leaving exactly the parametric face measure in
  the quadrature weight),
* penalty: sigma p^2 |f_phys| mean(1/h_phys), from the per-side face
  Jacobian factors ``g = |det A| |A^-T e_axis|``.

So general geometry needs no new kernels: every operator (assembled,
matrix-free, diagonal blocks, oracle) takes the tensor-coefficient fast
path with per-element-constant (or pointwise, when composed with a
variable medium K(x)) effective tensors.  The parametric boxes remain
the topology carrier: face matching, 2:1 refinement, partitions and the
whole sharded layer are geometry-agnostic.

Supported maps are affine per element (parallelepiped hexes).  Smooth
curvilinear domains enter through :func:`affinize` (per-element
linearization at the element center — the degree-1 isoparametric
approximation); genuinely trilinear hexes are not representable and the
importer rejects them.
"""

from __future__ import annotations

import numpy as np

from hpdg_tpu.mesh.structured import Mesh, from_boxes
from dataclasses import replace


def has_affine(mesh: Mesh) -> bool:
    return getattr(mesh, "jac", None) is not None


def apply_map(mesh: Mesh, elems, x):
    """Map parametric points (n, q, dim) to physical space."""
    if not has_affine(mesh):
        return x
    A = mesh.jac[elems]
    s = mesh.shift[elems]
    return s[:, None, :] + np.einsum("eab,eqb->eqa", A, np.asarray(x))


def geometry_tensor(mesh: Mesh, elems) -> np.ndarray:
    """Per-element effective tensor G_e = |det A| A^-1 A^-T (n, d, d).
    For axis-aligned meshes this is the identity."""
    if not has_affine(mesh):
        d = mesh.dim
        return np.broadcast_to(np.eye(d), (len(elems), d, d))
    A = mesh.jac[elems]
    Ai = np.linalg.inv(A)
    det = np.abs(np.linalg.det(A))
    return det[:, None, None] * np.einsum("eab,ecb->eac", Ai, Ai)


def effective_tensor(mesh: Mesh, elems, k, nq: int):
    """Fold the affine geometry into an evaluated coefficient.

    ``k``: None | (n, q) scalar array | (n, q, d, d) tensor array — the
    user's medium K evaluated at the physical quadrature points (numpy
    or traced jax array).  Returns the (n, q, d, d) effective tensor
    |det A| A^-1 K A^-T (a jax array when k is traced).  Only call for
    affine meshes."""
    d = mesh.dim
    A = mesh.jac[elems]
    Ai = np.linalg.inv(A)
    det = np.abs(np.linalg.det(A))
    G = det[:, None, None] * np.einsum("eab,ecb->eac", Ai, Ai)  # (n, d, d)
    if k is None:
        return np.broadcast_to(G[:, None], (len(elems), nq, d, d))
    if k.ndim == 2:  # scalar medium
        return k[:, :, None, None] * G[:, None]
    # tensor medium: |det A| A^-1 K(x_q) A^-T per point
    import jax.numpy as jnp
    return (jnp.einsum("eab,eqbc,edc->eqad", Ai, k, Ai)
            * det[:, None, None, None])


def detj_phys(mesh: Mesh, elems) -> np.ndarray:
    """|det| of the full parametric->physical volume element, i.e. the
    factor multiplying prod(extent) in physical integrals."""
    if not has_affine(mesh):
        return np.ones(len(elems))
    return np.abs(np.linalg.det(mesh.jac[elems]))


def face_jacobian_factor(mesh: Mesh, elems, axis) -> np.ndarray:
    """Nanson factor g = |det A| |A^-T e_axis| per element: physical face
    measure = g * parametric face measure for a face with parametric
    normal e_axis."""
    if not has_affine(mesh):
        return np.ones(len(elems))
    A = mesh.jac[elems]
    Ai = np.linalg.inv(A)
    det = np.abs(np.linalg.det(A))
    axis = np.broadcast_to(np.asarray(axis), (len(elems),))
    rows = Ai[np.arange(len(elems)), axis, :]  # A^-T e_ax = (A^-1)[ax, :]
    return det * np.linalg.norm(rows, axis=1)


def face_penalty_geometry(mesh: Mesh, fg):
    """(fmeas_phys, inv_h_phys_in, inv_h_phys_out) for a face group.

    h_phys per side = vol_phys / face_phys = extent[axis] |det A| / g —
    reduces to the parametric values for axis-aligned meshes."""
    ein = mesh.faces.inside[fg.face_ids]
    eout = mesh.faces.outside[fg.face_ids]
    if not has_affine(mesh):
        return fg.fmeas, fg.inv_h_in, fg.inv_h_out
    g_in = face_jacobian_factor(mesh, ein, fg.axis)
    g_out = face_jacobian_factor(mesh, eout, fg.axis)
    det_in = detj_phys(mesh, ein)
    det_out = detj_phys(mesh, eout)
    # conforming affine meshes have identical physical faces from both
    # sides; affinized curvilinear maps differ at the linearization
    # error — use the mean (symmetric, consistent)
    fmeas = 0.5 * (g_in + g_out) * fg.fmeas
    ih_in = fg.inv_h_in * g_in / det_in
    ih_out = fg.inv_h_out * g_out / det_out
    return fmeas, ih_in, ih_out


def boundary_penalty_geometry(mesh: Mesh, bg):
    """(fmeas_phys, inv_h_phys) for a boundary group."""
    elems = mesh.bfaces.elem[bg.face_ids]
    if not has_affine(mesh):
        return bg.fmeas, bg.inv_h
    g = face_jacobian_factor(mesh, elems, bg.axis)
    det = detj_phys(mesh, elems)
    return g * bg.fmeas, bg.inv_h * g / det


def penalty_coef_mesh(mesh: Mesh, fg, penalty: float, pmax: int,
                      scaling: str = "measure") -> np.ndarray:
    """Affine-aware face penalty coefficient c_f (= mu_f |f_phys|); for
    axis-aligned meshes identical to assemble.plan.penalty_coef."""
    if scaling == "measure":
        return penalty * pmax**2 * np.ones(len(fg.face_ids))
    if scaling == "normal":
        fmeas, ih_in, ih_out = face_penalty_geometry(mesh, fg)
        return penalty * pmax**2 * fmeas * 0.5 * (ih_in + ih_out)
    raise ValueError(scaling)


def boundary_penalty_coef_mesh(mesh: Mesh, bg, penalty: float,
                               scaling: str = "measure") -> np.ndarray:
    if scaling == "measure":
        return penalty * bg.p**2 * np.ones(len(bg.face_ids))
    if scaling == "normal":
        fmeas, ih = boundary_penalty_geometry(mesh, bg)
        return penalty * bg.p**2 * fmeas * ih
    raise ValueError(scaling)


# ---------------------------------------------------------------------------
# constructors
# ---------------------------------------------------------------------------

def affine_image(mesh: Mesh, A, b=None) -> Mesh:
    """The image of a box mesh under ONE global affine map x -> A x + b
    (sheared/rotated/stretched domains; exactly conforming)."""
    A = np.asarray(A, np.float64)
    b = np.zeros(mesh.dim) if b is None else np.asarray(b, np.float64)
    n = mesh.n_elements
    return replace(mesh,
                   jac=np.broadcast_to(A, (n, mesh.dim, mesh.dim)).copy(),
                   shift=np.broadcast_to(b, (n, mesh.dim)).copy())


def affinize(mesh: Mesh, phi, dphi=None) -> Mesh:
    """Per-element affine approximation of a smooth map ``phi`` (the
    degree-1 isoparametric geometry): A_e = Dphi(center_e) (central
    finite differences unless ``dphi`` is given), shift chosen so the
    element center maps exactly.  For a globally affine ``phi`` this is
    exact and conforming; for curved maps neighboring maps disagree at
    O(h^2) on shared faces (standard first-order geometry)."""
    c = mesh.centers()
    n, d = c.shape
    if dphi is not None:
        A = np.asarray(dphi(c), np.float64).reshape(n, d, d)
    else:
        A = np.empty((n, d, d))
        h = 1e-5 * max(float(mesh.extent.min()), 1e-3)
        for a in range(d):
            e = np.zeros(d)
            e[a] = h
            A[:, :, a] = (np.asarray(phi(c + e)) - np.asarray(phi(c - e))) \
                / (2 * h)
    shift = np.asarray(phi(c), np.float64) - np.einsum("eab,eb->ea", A, c)
    if np.linalg.det(A).min() <= 0:
        raise ValueError("affinize: map is orientation-reversing or "
                         "degenerate on some element")
    return replace(mesh, jac=A, shift=shift)


# VTK/Gmsh hexahedron vertex ordering: bottom quad (0,1,2,3) CCW, top
# quad (4,5,6,7); reference-cell (z,y,x)-bit corners in our C-order
# convention mapped accordingly.
_VTK_CORNER_REF = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.float64)


def from_hex_lattice(points, cells, lattice_shape, tol: float = 1e-9
                     ) -> Mesh:
    """Import an unstructured-hex mesh (meshio/Gmsh-style arrays) whose
    cells form a structured lattice: ``points`` (npts, 3) vertex
    coordinates, ``cells`` (ncells, 8) vertex indices in VTK hexahedron
    ordering, ``lattice_shape`` the (nx, ny, nz) cell layout in C order
    (last axis fastest — the order Gmsh transfinite/structured grids
    emit).  Every hex must be a parallelepiped (affine image of the
    cube) to ``tol``; genuinely trilinear cells raise.

    The parametric domain is the unit lattice; topology comes from it,
    geometry from the vertices.  Use ``meshio.read(...)`` to get the
    arrays from .msh/.vtu files when meshio is available."""
    points = np.asarray(points, np.float64)
    cells = np.asarray(cells)
    shape = tuple(int(s) for s in lattice_shape)
    n = cells.shape[0]
    if int(np.prod(shape)) != n:
        raise ValueError(f"lattice_shape {shape} does not match "
                         f"{n} cells")
    if points.shape[1] != 3 or cells.shape[1] != 8:
        raise ValueError("expected (npts, 3) points and (ncells, 8) hexes")
    corners = points[cells]  # (n, 8, 3)
    # affine fit: A columns from the three edge vectors at corner 0,
    # x_phys = v0 + A @ (ref - corner0_ref); ref coords are the VTK unit
    # cube in (x, y, z); our parametric axes are (a0, a1, a2) = (x, y, z)
    v0 = corners[:, 0]
    A = np.stack([corners[:, 1] - v0,      # d/dx
                  corners[:, 3] - v0,      # d/dy
                  corners[:, 4] - v0],     # d/dz
                 axis=-1)                  # (n, 3, 3)
    # parallelepiped check: predicted corners vs actual
    pred = v0[:, None, :] + np.einsum("eab,cb->eca", A, _VTK_CORNER_REF)
    scale = np.abs(A).sum(axis=(1, 2))[:, None, None] + 1e-30
    err = np.abs(pred - corners).max(axis=(1, 2)) / scale.reshape(-1)
    bad = np.where(err > tol)[0]
    if len(bad):
        raise ValueError(
            f"cells {bad[:5].tolist()}... are not parallelepipeds "
            f"(max relative deviation {err.max():.2e}); trilinear hex "
            "geometry is not representable by per-element affine maps")
    # parametric unit lattice in C order (last axis fastest)
    idx = np.stack(np.meshgrid(*[np.arange(s) for s in shape],
                               indexing="ij"), axis=-1).reshape(-1, 3)
    lower = idx.astype(np.float64)
    extent = np.ones_like(lower)
    # physical map on parametric coords x: shift + A x with
    # shift = v0 - A @ lower (per element)
    shift = v0 - np.einsum("eab,eb->ea", A, lower)
    if np.linalg.det(A).min() <= 0:
        raise ValueError("negative-volume hex (check vertex ordering)")
    m = from_boxes(lower, extent, jac=A, shift=shift)
    # conformity: shared parametric faces must map to the same physical
    # face from both sides (vertices already guarantee it for a valid
    # import; verify cheaply via the shared-face centroids)
    f = m.faces
    if len(f):
        ctr_in = _face_centroid(m, f.inside, f.axis, high=True)
        ctr_out = _face_centroid(m, f.outside, f.axis, high=False)
        dev = np.abs(ctr_in - ctr_out).max()
        if dev > 1e-8 * max(1.0, np.abs(points).max()):
            raise ValueError(f"imported hexes disagree on shared faces "
                             f"(max deviation {dev:.2e}) — the cell "
                             "array is not lattice-ordered")
    return m


def _face_centroid(mesh: Mesh, elems, axis, high: bool) -> np.ndarray:
    ctr = mesh.lower[elems] + 0.5 * mesh.extent[elems]
    off = np.zeros_like(ctr)
    off[np.arange(len(elems)), axis] = (0.5 if high else -0.5) \
        * mesh.extent[elems, axis]
    x = ctr + off
    return mesh.shift[elems] + np.einsum("eab,eb->ea", mesh.jac[elems], x)
