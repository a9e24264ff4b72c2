"""Benchmark: 3D SIPG Poisson p=4 on one TPU chip (BASELINE headline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

* metric/value: assembled DOF/s for the 3D SIPG p=4 stiffness matrix
  (bulk + faces + Dirichlet), jitted with a traced geometry scale so XLA
  cannot constant-fold the assembly.
* vs_baseline: ratio against the single-core C++ reference implementing
  the dune-hpdg assembly algorithm generalized to 3D
  (cpp/baseline_sipg3d.cc, verified to produce the identical operator to
  3e-15); its DOF/s is cached in cpp/baseline_result.json and re-measured
  here if the binary is available.
* extra sub-metrics (matrix-free apply DOF/s, multigrid time-to-1e-8)
  go to stderr so stdout stays a single JSON line.
"""

import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import jax

# TPU f32 matmuls default to bf16-input passes — numerically too sloppy
# for FEM operators (the multigrid contraction even diverges).  All
# reported numbers use honest full-f32 precision.
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp  # noqa: E402

REPO = Path(__file__).resolve().parent


def _force(out):
    """Fetch one scalar from a pytree output — forces the whole executable
    to have completed (outputs materialize together), unlike
    block_until_ready which can return at enqueue time over the axon
    tunnel."""
    leaf = jax.tree.leaves(out)[0]
    return float(leaf.reshape(-1)[0])


def timeit(fn, *args, reps: int = 20):
    """Steady-state seconds per call: `reps` async dispatches back to back
    (they serialize on the device), one final host fetch.  The single
    fetch's tunnel RTT is amortized into the result (slightly
    pessimistic, i.e. conservative for DOF/s claims)."""
    _force(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / reps


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def cpp_baseline_dofs_per_s() -> float:
    cache = REPO / "cpp" / "baseline_result.json"
    exe = REPO / "cpp" / "baseline_sipg3d"
    src = REPO / "cpp" / "baseline_sipg3d.cc"
    try:
        if not exe.exists() and src.exists():
            subprocess.run(["g++", "-O3", "-march=native", "-std=c++17",
                            "-o", str(exe), str(src)], check=True, timeout=120)
        if exe.exists():
            out = subprocess.run([str(exe), "8"], capture_output=True,
                                 text=True, timeout=300, check=True)
            res = json.loads(out.stdout.strip())
            # conservative vs host load: the baseline is the FASTEST
            # single-core run ever observed on this machine
            if cache.exists():
                prev = float(json.loads(cache.read_text())["dofs_per_s"])
                if prev > res["dofs_per_s"]:
                    res["dofs_per_s"] = prev
            cache.write_text(json.dumps(res))
            return float(res["dofs_per_s"])
    except Exception as e:  # fall back to the cached measurement
        log(f"# cpp baseline re-measure failed ({e}); using cache")
    if cache.exists():
        return float(json.loads(cache.read_text())["dofs_per_s"])
    return float("nan")


def main():
    from hpdg_tpu import mesh as hmesh
    from hpdg_tpu.basis.dgbasis import DGBasis
    from hpdg_tpu.assemble import assemble_laplace, build_plan
    from hpdg_tpu.matrixfree import sipg_operator

    dtype = jnp.float32
    p, n = 4, 12
    mesh = hmesh.structured((n, n, n))
    basis = DGBasis(mesh, np.full(mesh.n_elements, p))
    plan = build_plan(basis)
    ndof = basis.ndof
    log(f"# assembly bench: {n}^3 hexes, p={p}, {ndof} dofs on "
        f"{jax.devices()[0]}")

    asm = jax.jit(lambda s: assemble_laplace(
        basis, penalty=2.0, dirichlet=True, plan=plan, dtype=dtype,
        geom_scale=s).values)
    t_asm = timeit(asm, jnp.float32(1.0))
    asm_rate = ndof / t_asm
    log(f"# assembly: {t_asm*1e3:.2f} ms -> {asm_rate:,.0f} DOF/s")

    # ---- extra: matrix-free sum-factorized apply ----
    try:
        n2 = 16
        mesh2 = hmesh.structured((n2, n2, n2))
        basis2 = DGBasis(mesh2, np.full(mesh2.n_elements, p))
        op = jax.jit(sipg_operator(basis2, penalty=2.0, dirichlet=True,
                                   dtype=dtype))
        x = {p: jnp.asarray(np.random.default_rng(1).standard_normal(
            (mesh2.n_elements, (p + 1) ** 3)), dtype)}
        t_ap = timeit(op, x)
        log(f"# matrix-free apply ({n2}^3, {basis2.ndof} dofs): "
            f"{t_ap*1e3:.2f} ms -> {basis2.ndof/t_ap:,.0f} DOF/s")
    except Exception as e:
        log(f"# matrix-free bench failed: {e}")

    # ---- extra: fused Pallas uniform-SIPG apply ----
    try:
        from hpdg_tpu.ops.pallas_uniform import pallas_uniform_sipg_operator
        pal = jax.jit(pallas_uniform_sipg_operator(basis2, penalty=2.0,
                                                   dirichlet=True))
        t_pal = timeit(pal, x)
        log(f"# pallas fused apply ({n2}^3): {t_pal*1e3:.2f} ms -> "
            f"{basis2.ndof/t_pal:,.0f} DOF/s")
    except Exception as e:
        log(f"# pallas bench failed: {e}")

    # ---- extra: multigrid time to 1e-8 relative residual ----
    # f32 on the TPU compute path (f64 hits pathologically slow remote
    # compiles on this TPU generation); the V-cycle contraction rate is
    # dtype-independent, so time-to-1e-8 = cycles(1e-8) * time/cycle with
    # the rate measured over the first f32 cycles.  Guarded by a hard
    # alarm so a slow remote compile can never stall the whole bench.
    import signal

    class _BenchTimeout(Exception):
        pass

    def _alarm(sig, frame):
        raise _BenchTimeout("multigrid sub-bench timed out")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(900)
    try:
        import math
        from hpdg_tpu.solvers.multigrid import multigrid_solver
        from hpdg_tpu.linalg import blockmatrix as bm, blockvector as bvv
        from hpdg_tpu.assemble import l2_functional
        # full hp-hierarchy on the headline mesh: 3^3 -> 6^3 -> 12^3 at
        # p = 4 -> 2 -> 1 (h-levels below p=1), re-assembled level operators
        meshes_mg = hmesh.hierarchy(hmesh.structured((3, 3, 3)), 2)
        mesh_mg = meshes_mg[-1]
        basis_mg = DGBasis(mesh_mg, np.full(mesh_mg.n_elements, p))
        plan_mg = build_plan(basis_mg)
        A32 = assemble_laplace(basis_mg, penalty=2.0, dirichlet=True,
                               plan=plan_mg, dtype=dtype)
        factory = lambda bas: assemble_laplace(  # noqa: E731
            bas, penalty=2.0, dirichlet=True, dtype=dtype)
        step, _ = multigrid_solver(basis_mg, A32, operator_factory=factory,
                                   meshes=meshes_mg, dtype=dtype)
        f = lambda x: (2 * jnp.pi**2  # noqa: E731
                       * jnp.sin(jnp.pi * x[..., 0])
                       * jnp.sin(jnp.pi * x[..., 1])
                       * jnp.sin(jnp.pi * x[..., 2]))
        b = l2_functional(basis_mg, f, dtype=dtype)
        # hoist the level matrices (100s of MB) out of the program: jit of
        # the raw closure embeds them as HLO constants (688 MB of program
        # text!) and blows the remote-compile request limit.
        from hpdg_tpu.solvers.cg import hoist_constants
        x0 = bvv.zeros_like(b)
        g, consts = hoist_constants(lambda xx, bb: step(xx, bb), x0, b)
        jg = jax.jit(g)
        jstep = lambda xx, bb: jg(consts, xx, bb)  # noqa: E731
        jax.block_until_ready(jstep(x0, b))  # compile
        nb = float(bvv.norm(b))
        # measure the contraction rate over a few cycles (f32 floor ~1e-6)
        x = x0
        res = [nb]
        for _ in range(6):
            x = jstep(x, b)
            res.append(float(bvv.norm(bvv.sub(b, bm.matvec(A32, x)))))
        rate = (res[-1] / res[1]) ** (1.0 / (len(res) - 2))
        cycles_needed = math.ceil(math.log(1e-8) / math.log(min(rate, 0.99)))
        t_cycle = timeit(lambda v: jstep(v, b), x0, reps=5)
        log(f"# multigrid: rate/cycle {rate:.3f}, {t_cycle*1e3:.1f} ms/cycle"
            f" -> time-to-1e-8 ~ {cycles_needed * t_cycle:.3f} s"
            f" ({cycles_needed} cycles, {basis_mg.ndof} dofs,"
            f" measured f32 rel residual {res[-1]/nb:.2e})")
    except Exception as e:
        log(f"# multigrid bench failed: {e}")
    finally:
        signal.alarm(0)

    base = cpp_baseline_dofs_per_s()
    vs = asm_rate / base if base == base else None
    print(json.dumps({
        "metric": "3d_sipg_p4_assembled_dofs_per_s",
        "value": round(asm_rate, 1),
        "unit": "DOF/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }), flush=True)


if __name__ == "__main__":
    main()
