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
# x64 enables the HOST-side f64 ground-truth operator + residuals of the
# multigrid solve metric; every TPU-path array passes an explicit f32
# dtype, so nothing f64 ever reaches the TPU compiler.
jax.config.update("jax_enable_x64", True)
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
            # single-core run ever observed on this machine.  MERGE into
            # the cache (an overwrite would drop solve_seconds)
            data = json.loads(cache.read_text()) if cache.exists() else {}
            if data.get("dofs_per_s", 0) > res["dofs_per_s"]:
                res["dofs_per_s"] = data["dofs_per_s"]
            data.update(res)
            cache.write_text(json.dumps(data))
            return float(data["dofs_per_s"])
    except Exception as e:  # fall back to the cached measurement
        log(f"# cpp baseline re-measure failed ({e}); using cache")
    if cache.exists():
        return float(json.loads(cache.read_text())["dofs_per_s"])
    return float("nan")


def cpp_baseline_solve_seconds():
    """Single-core C++ hp-MG time-to-1e-8 (cpp/baseline_mg3d), cached in
    cpp/baseline_result.json under 'solve_seconds'."""
    cache = REPO / "cpp" / "baseline_result.json"
    exe = REPO / "cpp" / "baseline_mg3d"
    src = REPO / "cpp" / "baseline_mg3d.cc"
    try:
        if not exe.exists() and src.exists():
            subprocess.run(["g++", "-O3", "-march=native", "-std=c++17",
                            "-o", str(exe), str(src)], check=True,
                           timeout=300)
        if exe.exists():
            out = subprocess.run([str(exe)], capture_output=True, text=True,
                                 timeout=1200, check=True)
            res = json.loads(out.stdout.strip().splitlines()[-1])
            data = json.loads(cache.read_text()) if cache.exists() else {}
            # baseline = fastest single-core run observed on this machine
            prev = data.get("solve_seconds")
            sec = float(res["solve_seconds"])
            if prev is not None and float(prev) < sec:
                sec = float(prev)
            data["solve_seconds"] = sec
            cache.write_text(json.dumps(data))
            return sec
    except Exception as e:
        log(f"# cpp MG baseline re-measure failed ({e}); using cache")
    if cache.exists():
        data = json.loads(cache.read_text())
        if "solve_seconds" in data:
            return float(data["solve_seconds"])
    return None


def main():
    from hpdg_tpu import mesh as hmesh
    from hpdg_tpu.basis.dgbasis import DGBasis
    from hpdg_tpu.assemble import assemble_laplace, build_plan
    from hpdg_tpu.matrixfree import sipg_operator

    dtype = jnp.float32
    # 16^3 rather than 12^3: the assembly is HBM-write-bound and the
    # larger batch reaches the chip's effective write bandwidth
    # (measured 240 GB/s vs 186 GB/s at 12^3 -> 72.6M vs 57M DOF/s)
    p, n = 4, 16
    mesh = hmesh.structured((n, n, n))
    basis = DGBasis(mesh, np.full(mesh.n_elements, p))
    plan = build_plan(basis)
    ndof = basis.ndof
    log(f"# assembly bench: {n}^3 hexes, p={p}, {ndof} dofs on "
        f"{jax.devices()[0]}")

    # ---- fused Pallas uniform-SIPG apply ----
    try:
        from hpdg_tpu.ops.pallas_uniform import pallas_uniform_sipg_operator
        n2 = 16
        mesh2 = hmesh.structured((n2, n2, n2))
        basis2 = DGBasis(mesh2, np.full(mesh2.n_elements, p))
        xmf = {p: jnp.asarray(np.random.default_rng(1).standard_normal(
            (mesh2.n_elements, (p + 1) ** 3)), dtype)}
        pal = jax.jit(pallas_uniform_sipg_operator(basis2, penalty=2.0,
                                                   dirichlet=True))
        t_pal = timeit(pal, xmf)
        log(f"# pallas fused apply ({n2}^3): {t_pal*1e3:.2f} ms -> "
            f"{basis2.ndof/t_pal:,.0f} DOF/s")
    except Exception as e:
        log(f"# pallas bench failed: {e}")

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

    # (pallas was measured first — see above)

    # ---- extra: multigrid, MEASURED time to <=1e-8 relative residual ----
    # Scheme: f32 V-cycles on the TPU inside an f64 iterative-refinement
    # loop whose residuals are evaluated on the host CPU against the f64
    # operator (the TRUE system).  The reported time is the full solve
    # wall time — TPU cycles + host residual checks + transfers — from
    # x = 0 until the measured f64 relative residual is <= 1e-8.
    # Penalty scaling is "normal" (sigma p^2 |f|/h): in 2D it coincides
    # with the reference's sigma p^2/|e| (gausslobattoipdgassembler.hh:167,
    # |e| = h), and it is the correct 3D generalization — the literal
    # |f|^-1 convention over-penalizes by 1/h in 3D and degrades the MG
    # rate from ~0.11 to ~0.55/cycle.  Guarded by a hard alarm so a slow
    # remote compile can never stall the whole bench.
    import signal

    class _BenchTimeout(Exception):
        pass

    def _alarm(sig, frame):
        raise _BenchTimeout("multigrid sub-bench timed out")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(1200)
    time_to_1e8 = None
    mg_rate = None
    try:
        from hpdg_tpu.solvers.multigrid import multigrid_solver
        from hpdg_tpu.linalg import blockmatrix as bm, blockvector as bvv
        from hpdg_tpu.assemble import l2_functional
        from hpdg_tpu.solvers.cg import hoist_constants
        cpu = jax.devices("cpu")[0]
        tpu = jax.devices()[0]
        # full hp-hierarchy on the headline mesh: 3^3 -> 6^3 -> 12^3 at
        # p = 4 -> 2 -> 1 (h-levels below p=1), re-assembled level operators
        meshes_mg = hmesh.hierarchy(hmesh.structured((3, 3, 3)), 2)
        mesh_mg = meshes_mg[-1]
        basis_mg = DGBasis(mesh_mg, np.full(mesh_mg.n_elements, p))
        plan_mg = build_plan(basis_mg)
        # f64 ground truth on the host (jitted on CPU; f64 never touches
        # the TPU compile path)
        asm64 = jax.jit(lambda: assemble_laplace(
            basis_mg, penalty=2.0, dirichlet=True, plan=plan_mg,
            dtype=jnp.float64, penalty_scaling="normal").values, device=cpu)
        A64 = bm.BlockSparseMatrix(plan_mg.pattern, 3, asm64())
        f = lambda x: (2 * jnp.pi**2  # noqa: E731
                       * jnp.sin(jnp.pi * x[..., 0])
                       * jnp.sin(jnp.pi * x[..., 1])
                       * jnp.sin(jnp.pi * x[..., 2]))
        with jax.default_device(cpu):
            b64 = l2_functional(basis_mg, f, dtype=jnp.float64)
        g64, c64 = hoist_constants(lambda x: bm.matvec(A64, x), b64)
        jg64 = jax.jit(g64, device=cpu)
        mv64 = lambda x: jg64(c64, x)  # noqa: E731
        # f32 TPU operator = downcast of the same entries
        A32 = bm.BlockSparseMatrix(
            plan_mg.pattern, 3,
            {k: jax.device_put(v.astype(jnp.float32), tpu)
             for k, v in A64.values.items()})
        b32 = {k: jax.device_put(v.astype(jnp.float32), tpu)
               for k, v in b64.items()}
        # inner TPU solver: the fully matrix-free MG with the fused
        # Pallas stencil apply (10.5 ms/cycle at rate 0.386 = 25
        # ms/decade, vs 33 ms/cycle at 0.287 = 61 ms/decade for the
        # assembled-SpMV MG); assembled-MG fallback if the kernel is
        # unavailable in this environment
        chain_k = 8  # cheby-4 rate 0.304: 0.304^8 = 7e-5 per chain;
        # 2 chains reach 1e-8
        try:
            from hpdg_tpu.solvers.multigrid import \
                matrixfree_multigrid_solver
            step, _ = matrixfree_multigrid_solver(
                basis_mg, penalty=2.0, dirichlet=True, meshes=meshes_mg,
                penalty_scaling="normal", use_pallas=True, cheby_degree=4,
                dtype=dtype)
            log("# multigrid inner solver: matrix-free (pallas fused)")
        except Exception as e:
            log(f"# pallas MF-MG unavailable ({e}); assembled fallback")
            factory = lambda bas: assemble_laplace(  # noqa: E731
                bas, penalty=2.0, dirichlet=True, dtype=dtype,
                penalty_scaling="normal")
            step, _ = multigrid_solver(basis_mg, A32,
                                       operator_factory=factory,
                                       meshes=meshes_mg, dtype=dtype)
            chain_k = 6
        x0 = bvv.zeros_like(b32)

        def chain(rhs, k=chain_k):  # k V-cycles from zero (1 inner solve)
            x = bvv.zeros_like(rhs)
            for _ in range(k):
                x = step(x, rhs)
            return x

        # hoist the level matrices (100s of MB) out of the program: jit of
        # the raw closure embeds them as HLO constants and blows the
        # remote-compile request limit.
        g, consts = hoist_constants(chain, b32)
        jg = jax.jit(g)
        jchain = lambda rhs: jg(consts, rhs)  # noqa: E731
        _force(jchain(b32))  # compile
        # single-cycle rate + time (diagnostics)
        gs1, cs1 = hoist_constants(lambda xx, bb: step(xx, bb), x0, b32)
        jg1 = jax.jit(gs1)
        jstep = lambda xx, bb: jg1(cs1, xx, bb)  # noqa: E731
        _force(jstep(x0, b32))
        nb32 = float(bvv.norm(b32))
        x = x0
        res = [nb32]
        for _ in range(6):
            x = jstep(x, b32)
            res.append(float(bvv.norm(bvv.sub(b32, bm.matvec(A32, x)))))
        mg_rate = (res[-1] / res[1]) ** (1.0 / (len(res) - 2))
        t_cycle = timeit(lambda v: jstep(v, b32), x0, reps=5)
        # one fused host step: apply the correction in f64, recompute the
        # f64 residual and its norm, and emit the f32-rescaled rhs for the
        # next TPU solve (single CPU executable per refinement step)
        def host_step(x64, c32, scale):
            x64 = {k: x64[k] + scale * c32[k].astype(jnp.float64)
                   for k in x64}
            r64 = bvv.sub(b64, bm.matvec(A64, x64))
            nr = bvv.norm(r64)
            r32n = {k: (v / nr).astype(jnp.float32) for k, v in r64.items()}
            return x64, r32n, nr

        gh, ch = hoist_constants(host_step, b64,
                                 jax.tree.map(
                                     lambda v: v.astype(jnp.float32), b64),
                                 jnp.float64(1.0))
        jh = jax.jit(gh, device=cpu)
        hstep = lambda x64, c32, s: jh(ch, x64, c32, s)  # noqa: E731
        jax.block_until_ready(hstep(jax.tree.map(jnp.zeros_like, b64),
                                    jax.tree.map(
                                        lambda v: v.astype(jnp.float32), b64),
                                    jnp.float64(0.0)))

        # ---- the measured solve (best of 2: host-load noise on the
        # f64 refinement steps swings the wall time ~1.5x; each run is a
        # COMPLETE from-zero solve with its measured residual) ----
        nb = float(bvv.norm(b64))
        time_to_1e8 = None
        hist = [1.0]
        for run in range(2):
            x64 = jax.tree.map(jnp.zeros_like, b64)
            hist_r = [1.0]
            t_solve0 = time.perf_counter()
            # r(x=0) = b: no residual evaluation needed for the 1st step
            r32 = {k: jax.device_put((v / nb).astype(jnp.float32), tpu)
                   for k, v in b64.items()}
            scale = nb
            for _ in range(6):
                c32 = jax.device_get(jchain(r32))  # TPU solve + one fetch
                x64, r32n, nr = hstep(x64, c32, jnp.float64(scale))
                nr = float(nr)
                hist_r.append(nr / nb)
                if nr / nb <= 1e-8:
                    break
                r32 = {k: jax.device_put(v, tpu) for k, v in r32n.items()}
                scale = nr
            t_run = time.perf_counter() - t_solve0
            log(f"# multigrid measured solve run {run + 1}: "
                f"{hist_r[-1]:.2e} in {t_run:.3f} s")
            if hist_r[-1] <= 1e-8 and (time_to_1e8 is None
                                       or t_run < time_to_1e8):
                time_to_1e8 = t_run
                hist = hist_r
        log(f"# multigrid (normal scaling): rate/cycle {mg_rate:.3f}, "
            f"{t_cycle*1e3:.1f} ms/cycle; MEASURED f64 rel residual "
            f"{hist[-1]:.2e} in "
            f"{time_to_1e8 if time_to_1e8 else float('nan'):.3f} s "
            f"({len(hist)-1} refinement steps x {chain_k} V-cycles, "
            f"{basis_mg.ndof} dofs, history "
            f"{['%.1e' % h for h in hist]})")
        if time_to_1e8 is None:
            log("# WARNING: 1e-8 not reached; reporting null time_to_1e8_s")
    except Exception as e:
        log(f"# multigrid bench failed: {e}")
    finally:
        signal.alarm(0)

    base = cpp_baseline_dofs_per_s()
    vs = asm_rate / base if base == base else None
    solve_base = cpp_baseline_solve_seconds()
    out = {
        "metric": "3d_sipg_p4_assembled_dofs_per_s",
        "value": round(asm_rate, 1),
        "unit": "DOF/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }
    if time_to_1e8 is not None:
        out["time_to_1e8_s"] = round(time_to_1e8, 3)
        out["mg_rate_per_cycle"] = round(mg_rate, 3)
        if solve_base is not None:
            out["vs_baseline_solve"] = round(solve_base / time_to_1e8, 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
