"""Host-grid / sub-grid cross evaluation (dune-subgrid analogs):
subgrid_map containment, L2 functional of a host function on the sub
basis (dunefunctionssubgridl2functionalassembler.hh), and sub-function
evaluation through the host basis
(subgriddiscreteglobalbasisfunction.hh)."""

import numpy as np
import jax.numpy as jnp

from hpdg_tpu import mesh as hmesh
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.blocks import api
from hpdg_tpu.blocks.subgrid import (subgrid_map, l2_functional_from_host,
                                     sub_function_on_host)
from hpdg_tpu.mesh.adaptive import refine_local


def _lshape_mask(n):
    mask = np.ones((n, n), dtype=bool)
    mask[n // 2:, n // 2:] = False
    return mask


def test_subgrid_map_masked_lshape():
    host = hmesh.structured((4, 4))
    sub = hmesh.structured((4, 4), mask=_lshape_mask(4))
    smap = subgrid_map(host, sub)
    assert len(smap.sub_to_host) == sub.n_elements == 12
    # 1:1 inverse on covered elements, -1 on the cut corner
    covered = smap.host_to_sub >= 0
    assert covered.sum() == 12
    for s, h in enumerate(smap.sub_to_host):
        assert smap.host_to_sub[h] == s
        assert np.allclose(host.lower[h], sub.lower[s])


def test_subgrid_map_refined_sub():
    """Sub elements may be refinements of host elements (containment,
    not identity)."""
    host = hmesh.structured((2, 2))
    sub0 = hmesh.structured((2, 2), mask=np.array([[True, True],
                                                   [True, False]]))
    sub = refine_local(sub0, np.array([True, False, False]))
    smap = subgrid_map(host, sub)
    assert (smap.sub_to_host >= 0).all()
    # the four children map to the same host element
    kids = np.where(sub.child_pos >= 0)[0]
    assert len(np.unique(smap.sub_to_host[kids])) == 1


def test_l2_functional_from_host_exact_for_polynomials():
    """With g a polynomial representable on both grids, the sub-assembled
    functional of the host interpolant equals the directly assembled
    analytic functional (quadrature-exactness check of the coupling)."""
    g = lambda x: (1.0 + x[..., 0]) * (2.0 - x[..., 1])  # bilinear

    host = hmesh.structured((4, 4))
    hbasis = DGBasis(host, np.full(16, 2))
    x_host = api.interpolate(hbasis, g)

    rng = np.random.default_rng(3)
    sub0 = hmesh.structured((4, 4), mask=_lshape_mask(4))
    sub = refine_local(sub0, rng.random(12) < 0.4)
    sbasis = DGBasis(sub, rng.choice([1, 2, 3], size=sub.n_elements))

    b_cross = l2_functional_from_host(sbasis, hbasis, x_host)
    b_direct = api.l2_functional(sbasis, g)
    for p in b_direct:
        assert np.allclose(np.asarray(b_cross[p]), np.asarray(b_direct[p]),
                           atol=1e-12), p


def test_sub_function_on_host_roundtrip():
    """A sub discrete function pushed into the host basis agrees on the
    1:1-covered elements and takes the fill value elsewhere."""
    g = lambda x: x[..., 0] ** 2 + 0.5 * x[..., 1]
    host = hmesh.structured((4, 4))
    hbasis = DGBasis(host, np.full(16, 3))
    sub = hmesh.structured((4, 4), mask=_lshape_mask(4))
    sbasis = DGBasis(sub, np.full(12, 2))
    x_sub = api.interpolate(sbasis, g)
    smap = subgrid_map(host, sub)
    x_host = sub_function_on_host(sbasis, x_sub, hbasis, smap, fill=7.0)
    # covered elements: interpolant of g (exact, quadratic into cubic)
    ref = api.interpolate(hbasis, g)
    for h in range(16):
        ph = 3
        pos = hbasis.elem_bucket_pos[h]
        got = np.asarray(x_host[ph])[pos]
        if smap.host_to_sub[h] >= 0:
            assert np.allclose(got, np.asarray(ref[ph])[pos], atol=1e-12)
        else:
            assert np.allclose(got, 7.0)
