"""Sharded matrix-free SIPG operator + solver steps (uniform degree).

Slab decomposition of a structured box mesh along axis 0 over a 1D
device mesh.  Every shard runs the identical local program (SPMD):

* bulk + slab-interior face terms: the standard batched sum-factorized
  apply on the local sub-mesh (reusing hpdg_tpu.matrixfree);
* shard-interface terms: ppermute one element layer to each neighbor,
  then add the cross-face SIPG terms, masked by "do I have a neighbor";
* domain x-boundaries: Dirichlet terms applied where there is NO
  neighbor (the complementary mask) — so the same program is valid on
  every shard, no data-dependent control flow.

This is the ICI analog of the reference's per-level
VariableSizeCommunicator halo exchange (parallel/communicationhpdg.hh):
variable-size MPI buffers become fixed-shape [layer, (p+1)^d] arrays.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.basis import tensor
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble.plan import build_plan
from hpdg_tpu.matrixfree.sumfact import sipg_operator
from hpdg_tpu.matrixfree.diagonal import sipg_diagonal_blocks


@dataclass
class ShardedPoisson:
    """A sharded 2D/3D Poisson SIPG problem (uniform degree)."""

    cells: tuple  # global cells
    p: int
    ndev: int
    axis_name: str
    mesh: Mesh
    local_basis: DGBasis
    layer: int  # elements per x-layer
    n_local: int
    apply: callable  # global [N, bs] -> [N, bs] (sharded)
    precond: callable  # block-Jacobi r -> Dinv r (local, sharded)
    sharding: NamedSharding

    @property
    def n_global(self) -> int:
        return self.n_local * self.ndev


def _face_mats(p, dim, nq1, family):
    """Fixed x-axis cross-face matrices (inside = high side of low slab)."""
    fin = tensor.face_tables(p, dim, 0, 1, nq1, family=family)
    fout = tensor.face_tables(p, dim, 0, 0, nq1, family=family)
    return fin, fout


def build_sharded_poisson(cells, p: int, devices=None, penalty: float = 2.0,
                          dirichlet: bool = True, axis_name: str = "x",
                          dtype=jnp.float64) -> ShardedPoisson:
    cells = tuple(int(c) for c in cells)
    dim = len(cells)
    devices = devices if devices is not None else jax.devices()
    ndev = len(devices)
    if cells[0] % ndev != 0:
        raise ValueError(f"cells[0]={cells[0]} not divisible by {ndev} devices")
    local_cells = (cells[0] // ndev,) + cells[1:]
    if local_cells[0] < 1:
        raise ValueError("each shard needs at least one element layer")
    h = 1.0 / np.asarray(cells)
    layer = int(np.prod(local_cells[1:]))
    n_local = int(np.prod(local_cells))
    bs = (p + 1) ** dim

    # local sub-mesh: geometry is translation-invariant, so one template
    # mesh serves every shard (constant coefficients assumed here)
    lmesh = hmesh.structured(local_cells,
                             upper=tuple(np.asarray(local_cells) * h))
    lbasis = DGBasis(lmesh, np.full(n_local, p))
    plan = build_plan(lbasis)
    # interior/bulk operator: Dirichlet only on non-x boundaries; the two
    # x-boundaries of the slab are handled by the masked interface terms
    plan_nox = replace(plan, boundary_groups=tuple(
        bg for bg in plan.boundary_groups if bg.axis != 0))
    op_inner = sipg_operator(lbasis, penalty=penalty, dirichlet=dirichlet,
                             plan=plan_nox, dtype=dtype)

    # ---- fixed cross-face data (x axis, uniform geometry) ----
    nq1 = p + 2
    fin, fout = _face_mats(p, dim, nq1, lbasis.family)
    w = jnp.asarray(fin["weights"], dtype)
    Vi, Di = jnp.asarray(fin["V"], dtype), jnp.asarray(fin["Dn"], dtype)
    Vo, Do = jnp.asarray(fout["V"], dtype), jnp.asarray(fout["Dn"], dtype)
    fmeas = float(np.prod(h[1:]))
    inv_h = float(1.0 / h[0])
    pen_w = penalty * p**2 * w  # mu |f| w

    def cross_face_out(u_in, u_out):
        """Output into the OUTSIDE (low-side-local) elements of an x-face."""
        uinq = u_in @ Vi
        uoutq = u_out @ Vo
        dninq = (u_in @ Di) * inv_h
        dnoutq = (u_out @ Do) * inv_h
        jump = uinq - uoutq
        avg = 0.5 * (dninq + dnoutq)
        zw = fmeas * w[None, :]
        t1 = zw * avg - pen_w[None, :] * jump
        t2 = zw * (-0.5 * jump) * inv_h
        return t1 @ Vo.T + t2 @ Do.T

    def cross_face_in(u_in, u_out):
        """Output into the INSIDE (high-side-local) elements of an x-face."""
        uinq = u_in @ Vi
        uoutq = u_out @ Vo
        dninq = (u_in @ Di) * inv_h
        dnoutq = (u_out @ Do) * inv_h
        jump = uinq - uoutq
        avg = 0.5 * (dninq + dnoutq)
        zw = fmeas * w[None, :]
        t1 = zw * (-avg) + pen_w[None, :] * jump
        t2 = zw * (-0.5 * jump) * inv_h
        return t1 @ Vi.T + t2 @ Di.T

    # Dirichlet terms on the domain x-boundaries (masked in when no
    # neighbor exists)
    def diri_terms(side):
        ft = tensor.face_tables(p, dim, 0, side, p + 2, family=lbasis.family)
        V, D = jnp.asarray(ft["V"], dtype), jnp.asarray(ft["Dn"], dtype)
        sign = 1.0 if side == 1 else -1.0

        def apply_b(u):
            uq = u @ V
            dnq = (u @ D) * (sign * inv_h)
            zw = fmeas * w[None, :]
            t1 = zw * (-dnq) + pen_w[None, :] * uq
            t2 = zw * (-uq) * (sign * inv_h)
            return t1 @ V.T + t2 @ D.T

        return apply_b

    diri_low = diri_terms(0)
    diri_high = diri_terms(1)

    def local_apply(x):
        """x: [n_local, bs] shard-local block; runs inside shard_map."""
        idx = jax.lax.axis_index(axis_name)
        nshards = jax.lax.axis_size(axis_name)
        has_left = (idx > 0).astype(x.dtype)
        has_right = (idx < nshards - 1).astype(x.dtype)
        # halo exchange: send last layer right, first layer left
        right_perm = [(i, i + 1) for i in range(nshards - 1)]
        left_perm = [(i + 1, i) for i in range(nshards - 1)]
        xl = jax.lax.ppermute(x[-layer:], axis_name, right_perm)  # from left nbr
        xr = jax.lax.ppermute(x[:layer], axis_name, left_perm)  # from right nbr

        y = op_inner({p: x})[p]
        u0 = x[:layer]
        un = x[-layer:]
        # x-low side of the slab
        low_cross = cross_face_out(xl, u0)
        low_diri = diri_low(u0) if dirichlet else jnp.zeros_like(u0)
        y = y.at[:layer].add(has_left * low_cross + (1 - has_left) * low_diri)
        # x-high side
        high_cross = cross_face_in(un, xr)
        high_diri = diri_high(un) if dirichlet else jnp.zeros_like(un)
        y = y.at[-layer:].add(has_right * high_cross
                              + (1 - has_right) * high_diri)
        return y

    device_mesh = Mesh(np.array(devices), (axis_name,))
    sharding = NamedSharding(device_mesh, P(axis_name, None))

    apply_sharded = jax.jit(jax.shard_map(
        local_apply, mesh=device_mesh, in_specs=P(axis_name, None),
        out_specs=P(axis_name, None)))

    # block-Jacobi preconditioner: diagonal blocks of the LOCAL operator
    # are wrong at shard interfaces (missing cross-face M11/M22) — fix by
    # adding the uniform-geometry interface contributions, masked.
    D0 = sipg_diagonal_blocks(lbasis, penalty=penalty, dirichlet=dirichlet,
                              plan=plan_nox, dtype=dtype)[p]
    wnp = fin["weights"]
    AVDo = np.einsum("iq,q,jq->ij", fout["V"], wnp, fout["Dn"])
    BVVo = np.einsum("iq,q,jq->ij", fout["V"], wnp, fout["V"])
    AVDi_ = np.einsum("iq,q,jq->ij", fin["V"], wnp, fin["Dn"])
    BVVi_ = np.einsum("iq,q,jq->ij", fin["V"], wnp, fin["V"])
    pen_s = penalty * p**2
    # M22 of an x-face (element on the high/outside = local low layer)
    M22 = 0.5 * fmeas * inv_h * (AVDo + AVDo.T) + pen_s * BVVo
    # M11 (element on the low/inside = local high layer)
    M11 = -0.5 * fmeas * inv_h * (AVDi_ + AVDi_.T) + pen_s * BVVi_
    # Dirichlet diagonal terms for the domain x-boundaries
    ft0 = tensor.face_tables(p, dim, 0, 0, p + 2, family=lbasis.family)
    ft1 = tensor.face_tables(p, dim, 0, 1, p + 2, family=lbasis.family)
    AVD0 = np.einsum("iq,q,jq->ij", ft0["V"], wnp, ft0["Dn"])
    BVV0 = np.einsum("iq,q,jq->ij", ft0["V"], wnp, ft0["V"])
    AVD1 = np.einsum("iq,q,jq->ij", ft1["V"], wnp, ft1["Dn"])
    BVV1 = np.einsum("iq,q,jq->ij", ft1["V"], wnp, ft1["V"])
    Md0 = fmeas * inv_h * (AVD0 + AVD0.T) + pen_s * BVV0  # side 0: sign -1
    Md1 = -fmeas * inv_h * (AVD1 + AVD1.T) + pen_s * BVV1

    J = lambda a: jnp.asarray(a, dtype)  # noqa: E731

    def local_dinv(_):
        idx = jax.lax.axis_index(axis_name)
        nshards = jax.lax.axis_size(axis_name)
        has_left = (idx > 0).astype(dtype)
        has_right = (idx < nshards - 1).astype(dtype)
        D = jnp.broadcast_to(D0, (n_local, bs, bs))
        add_low = has_left * J(M22) + (1 - has_left) * (
            J(Md0) if dirichlet else jnp.zeros((bs, bs), dtype))
        add_high = has_right * J(M11) + (1 - has_right) * (
            J(Md1) if dirichlet else jnp.zeros((bs, bs), dtype))
        D = D.at[:layer].add(add_low[None])
        D = D.at[-layer:].add(add_high[None])
        return jnp.linalg.inv(D)

    dinv_sharded = jax.jit(jax.shard_map(
        local_dinv, mesh=device_mesh, in_specs=P(axis_name),
        out_specs=P(axis_name, None, None)))
    Dinv = dinv_sharded(jnp.zeros(ndev))

    def precond(r):
        return jnp.einsum("nij,nj->ni", Dinv, r,
                          preferred_element_type=dtype)

    return ShardedPoisson(cells=cells, p=p, ndev=ndev, axis_name=axis_name,
                          mesh=device_mesh, local_basis=lbasis, layer=layer,
                          n_local=n_local, apply=apply_sharded,
                          precond=precond, sharding=sharding)


def pcg_step(prob: ShardedPoisson):
    """One preconditioned-CG iteration on global sharded arrays — the
    'training step' of this framework.  All reductions become psums over
    the device mesh; the operator apply does halo ppermutes."""

    def safe_div(a, b):
        # CG run for a FIXED iteration count reaches rz -> 0; guard the
        # divisions so converged iterations become no-ops instead of NaNs
        return jnp.where(jnp.abs(b) > 0, a / jnp.where(b == 0, 1.0, b), 0.0)

    def step(state):
        x, r, z, pvec, rz = state
        Ap = prob.apply(pvec)
        alpha = safe_div(rz, jnp.vdot(pvec, Ap))
        x = x + alpha * pvec
        r = r - alpha * Ap
        z = prob.precond(r)
        rz_new = jnp.vdot(r, z)
        beta = safe_div(rz_new, rz)
        pvec = z + beta * pvec
        return x, r, z, pvec, rz_new

    return step


def init_state(prob: ShardedPoisson, b):
    r = b
    z = prob.precond(r)
    return (jnp.zeros_like(b), r, z, z, jnp.vdot(r, z))


def pcg_solve(prob: ShardedPoisson, b, iters: int):
    """Run `iters` PCG iterations as ONE compiled XLA program
    (lax.fori_loop), so all ppermute/psum collectives are sequenced
    inside a single executable — the production shape for TPU (and it
    sidesteps XLA:CPU's in-process-collective rendezvous flakiness under
    pipelined dispatch of many small executables)."""
    step = pcg_step(prob)

    @jax.jit
    def run(b):
        state = init_state(prob, b)
        state = jax.lax.fori_loop(0, iters, lambda i, s: step(s), state)
        x, r, *_ = state
        return x, jnp.linalg.norm(r)

    return run(b)
