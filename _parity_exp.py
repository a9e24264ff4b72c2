"""Residual-history parity: python lex-GS hp-MG vs C++ baseline_mg3d."""
import json, subprocess
import numpy as np, jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from hpdg_tpu import mesh as hmesh
from hpdg_tpu.basis.dgbasis import DGBasis
from hpdg_tpu.assemble import assemble_laplace, l2_functional
from hpdg_tpu.solvers.multigrid import multigrid_solver
from hpdg_tpu.linalg import blockmatrix as bm, blockvector as bvv

n, p = 4, 2
out = subprocess.run(["/root/repo/cpp/baseline_mg3d", str(n), str(p), "1e-8"],
                     capture_output=True, text=True, check=True)
cpp = json.loads(out.stdout)
print("cpp history:", ["%.6e" % h for h in cpp["history"]])

meshes = hmesh.hierarchy(hmesh.structured((n//2,)*3), 1)
mesh = meshes[-1]
basis = DGBasis(mesh, np.full(mesh.n_elements, p))
A = assemble_laplace(basis, penalty=2.0, dirichlet=True,
                     penalty_scaling="normal")
fac = lambda bas: assemble_laplace(bas, penalty=2.0, dirichlet=True,
                                   penalty_scaling="normal")
f = lambda x: (2*jnp.pi**2 * jnp.sin(jnp.pi*x[...,0]) * jnp.sin(jnp.pi*x[...,1])
               * jnp.sin(jnp.pi*x[...,2]))
b = l2_functional(basis, f)
step, _ = multigrid_solver(basis, A, operator_factory=fac, meshes=meshes,
                           smoother="lex", pre_steps=3, post_steps=3,
                           coarse="dense")
js = jax.jit(step)
nb = float(bvv.norm(b))
x = bvv.zeros_like(b)
hist = [1.0]
for _ in range(len(cpp["history"]) - 1):
    x = js(x, b)
    hist.append(float(bvv.norm(bvv.sub(b, bm.matvec(A, x)))) / nb)
print("py  history:", ["%.6e" % h for h in hist])
rel = [abs(a-bb)/max(abs(bb), 1e-300) for a, bb in zip(hist, cpp["history"])]
print("rel diffs:  ", ["%.1e" % r for r in rel])
