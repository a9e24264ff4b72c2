"""Multi-chip domain decomposition over a jax.sharding.Mesh.

TPU-native replacement of the reference's MPI layer
(parallel/communicationhpdg.hh, iterationsteps/parmgsetup.hh): the mesh
is partitioned into slabs (1-axis) or blocks (multi-axis device grids,
``hp.build_hp_sharded(device_grid=...)``) — or by cut planes on general
adaptive meshes with hanging nodes (``hp.build_hp_sharded_general``) —
element coefficient arrays are sharded on their leading axis, and the
only communication in an operator apply is the exchange of one element
layer with each neighbor — `jax.lax.ppermute` over ICI inside
`shard_map`.  ``adaptive.sharded_adaptive_solve`` runs the full
solve → estimate → mark → refine → repartition → migrate loop.

The reference's four vector primitives (restrict / accumulate / collect
/ copy, communicationhpdg.hh:374-418) exist because its MPI vectors are
*overlapping* (ghost copies of shared dofs).  The sharded layout here is
non-overlapping by construction — each element's block lives on exactly
one shard — so those primitives collapse to: halo gather (ppermute)
before face terms, and nothing after.  Global reductions (norms, dot
products, Dörfler thresholds — the reference's rank-0
gather/&broadcast, estimators/utility.hh:86-116) are psums emitted
automatically by XLA on the sharded arrays.
"""

from hpdg_tpu.parallel.sharded import (  # noqa: F401
    ShardedPoisson, build_sharded_poisson)
