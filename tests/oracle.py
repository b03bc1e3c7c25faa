"""Independent NumPy/SciPy oracle for point location + GLL interpolation.

Deliberately written the "reference way": scipy cKDTree candidates,
per-point Python loop, np.linalg-based Newton with early exit -- so the
device engine is validated against a structurally different implementation
(SURVEY.md section 4, BASELINE.md accuracy metric).
"""
import numpy as np
from scipy.spatial import cKDTree


def _gll_nodes_np(order):
    if order == 1:
        return np.array([-1.0, 1.0])
    if order == 2:
        return np.array([-1.0, 0.0, 1.0])
    if order == 4:
        s = np.sqrt(3.0 / 7.0)
        return np.array([-1.0, -s, 0.0, s, 1.0])
    raise NotImplementedError(order)


def _lagrange_all(nodes, x):
    """Values of all cardinal polys at scalar/array x: [..., n]."""
    x = np.asarray(x)[..., None]
    n = len(nodes)
    out = np.ones(x.shape[:-1] + (n,))
    for i in range(n):
        for j in range(n):
            if i != j:
                out[..., i] *= (x[..., 0] - nodes[j]) / (nodes[i] - nodes[j])
    return out


def _lagrange_deriv_all(nodes, x):
    x = np.asarray(x)
    n = len(nodes)
    out = np.zeros(np.shape(x) + (n,))
    for i in range(n):
        for k in range(n):
            if k == i:
                continue
            term = np.ones_like(x) / (nodes[i] - nodes[k])
            for j in range(n):
                if j != i and j != k:
                    term = term * (x - nodes[j]) / (nodes[i] - nodes[j])
            out[..., i] += term
    return out


def tensor_basis_np(order, ref):
    """ref [d] -> [(p+1)^d], canonical row-major ordering."""
    nodes = _gll_nodes_np(order)
    d = len(ref)
    ls = [_lagrange_all(nodes, ref[a]) for a in range(d)]
    if d == 3:
        out = np.einsum("i,j,k->ijk", ls[0], ls[1], ls[2]).ravel()
    else:
        out = np.einsum("i,j->ij", ls[0], ls[1]).ravel()
    return out


def tensor_basis_grad_np(order, ref):
    nodes = _gll_nodes_np(order)
    d = len(ref)
    ls = [_lagrange_all(nodes, ref[a]) for a in range(d)]
    ds = [_lagrange_deriv_all(nodes, ref[a]) for a in range(d)]
    cols = []
    for a in range(d):
        fs = [ds[b] if b == a else ls[b] for b in range(d)]
        if d == 3:
            cols.append(np.einsum("i,j,k->ijk", *fs).ravel())
        else:
            cols.append(np.einsum("i,j->ij", *fs).ravel())
    return np.stack(cols, axis=-1)  # [n, d]


def newton_inverse_np(elem_nodes, point, order, max_iter=50, rtol=1e-12):
    """Scalar Newton inverse of the shape map; returns (ref, converged)."""
    d = elem_nodes.shape[1]
    ref = np.zeros(d)
    scale = np.max(elem_nodes.max(axis=0) - elem_nodes.min(axis=0))
    tol = rtol * max(scale, 1e-300)
    for _ in range(max_iter):
        basis = tensor_basis_np(order, ref)
        x = basis @ elem_nodes
        r = point - x
        if np.max(np.abs(r)) < tol:
            return ref, True
        grad = tensor_basis_grad_np(order, ref)  # [n, d_ref]
        jac = grad.T @ elem_nodes  # [d_ref, d_x]^T ... J[a,b]=dx_b/dr_a
        try:
            step = np.linalg.solve(jac.T, r)
        except np.linalg.LinAlgError:
            return ref, False
        ref = np.clip(ref + step, -8, 8)
    return ref, False


def locate_np(points, elem_nodes, order, k=20, tol=1.05, snap=False,
              snap_clip=1.02):
    """Reference-style locate: cKDTree candidates, first-accept scan,
    best-so-far snap fallback.  Returns (elements, refs, weights)."""
    centroids = elem_nodes.mean(axis=1)
    tree = cKDTree(centroids)
    k = min(k, len(centroids))
    _, cand = tree.query(points, k=k)
    if k == 1:
        cand = cand[:, None]
    n = elem_nodes.shape[1]
    N = len(points)
    elements = np.full(N, -1, dtype=np.int64)
    refs = np.zeros((N, points.shape[1]))
    weights = np.zeros((N, n))
    for i, p in enumerate(points):
        best = None
        best_max = np.inf
        for e in cand[i]:
            ref, conv = newton_inverse_np(elem_nodes[e], p, order)
            if not conv:
                continue
            m = np.max(np.abs(ref))
            if m < best_max:
                best_max, best = m, (e, ref)
            if m < tol:
                elements[i] = e
                refs[i] = ref
                weights[i] = tensor_basis_np(order, ref)
                break
        else:
            if snap and best is not None:
                e, ref = best
                ref = np.clip(ref, -snap_clip, snap_clip)
                elements[i] = e
                refs[i] = ref
                weights[i] = tensor_basis_np(order, ref)
    return elements, refs, weights


def interpolate_np(points, elem_nodes, nodal_field, order, **kw):
    """Full oracle pipeline: locate + gather + weighted sum."""
    elements, refs, weights = locate_np(points, elem_nodes, order, **kw)
    vals = np.einsum("pn,pn->p", weights, nodal_field[elements])
    vals[elements < 0] = 0.0
    return vals, elements
