"""Smoke tests: every example in examples/ runs end-to-end (tiny sizes)."""

import os
import runpy
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")


def run_example(name, argv):
    old = sys.argv
    sys.argv = [name] + argv
    try:
        runpy.run_path(os.path.join(EXAMPLES, name), run_name="__main__")
    finally:
        sys.argv = old


def test_poisson_example(capsys):
    run_example("poisson.py", ["--n", "6", "--p", "2"])
    assert "L2 error" in capsys.readouterr().out


def test_adaptive_lshape_example(capsys):
    run_example("adaptive_lshape.py", ["--steps", "2"])
    out = capsys.readouterr().out
    assert "step 1" in out


def test_obstacle_example(capsys):
    run_example("obstacle.py", ["--n", "4"])
    assert "TNNMG" in capsys.readouterr().out


def test_heat_example(capsys):
    run_example("heat.py", ["--n", "6", "--steps", "2"])
    assert "t=" in capsys.readouterr().out


def test_elasticity_example(capsys):
    run_example("elasticity.py", ["--n", "2", "--levels", "1", "--p", "1"])
    assert "elasticity" in capsys.readouterr().out


def test_parallel_poisson_example(capsys):
    import jax
    import pytest
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    run_example("parallel_poisson.py", ["--cells", "8,4", "--iters", "15"])
    out = capsys.readouterr().out
    assert "sharded MG-PCG" in out


def test_affine_geometry_example(capsys):
    run_example("affine_geometry.py", ["--case", "shear", "--n", "6"])
    assert "affine elements" in capsys.readouterr().out


def test_anisotropic_line_mg_example(capsys):
    run_example("anisotropic_line_mg.py", ["--cycles", "5"])
    out = capsys.readouterr().out
    assert "serial line" in out


def test_curved_geometry_example(capsys):
    run_example("curved_geometry.py", ["--n", "4", "--p", "2",
                                       "--levels", "2"])
    out = capsys.readouterr().out
    assert "curved elements" in out
    assert "ratio" in out


def test_unstructured_cg_example(capsys):
    run_example("unstructured_cg.py", [])
    out = capsys.readouterr().out
    assert "imported annulus ring" in out
    assert "CG vs DG nodal agreement" in out
