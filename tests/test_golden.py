"""Golden-table parity against the reference's committed expected files.

The reference's regression bar is a column-by-column diff of the
temporal tables produced by each scheme's ex1 configuration against
files committed under ``tests/<scheme>/expected/`` (comparator:
/root/reference/tests/common.h:30-90, tolerance PETSC_SMALL ~1e-10).

These tests reproduce that bar end-to-end:

* the initial particle load is **bit-for-bit** the reference's — the
  exact default-seeded mt19937 + libstdc++ uniform_real_distribution
  stream (native/xpic_native.cpp) drawn in the reference's interleaved
  per-particle order (set_particles.cpp:28-40, particles_load.cpp:12-75,
  operand order sin-then-modulus).  This is proven by the step-0
  ``electrons/density`` dump matching the committed float32 file with
  **zero** max abs diff and wK(0) matching all printed digits;
* ``basic`` (explicit, no linear solve) then matches the full 100-step
  energy / energy-conservation / momentum tables to ~1e-13 (most
  columns literally print-identical) and charge tables to ~4e-11;
* ``ecsim``/``ecsimcorr`` involve a Krylov solve: our GMRES and PETSc's
  converge to the same 1e-7 budget but along different arithmetic
  paths, and the N-body dynamics amplifies that residual-level
  difference exponentially.  Step-1 columns match to ~2e-10; over the
  full 100 steps trajectory columns drift to ~2.6e-5 (ecsim) / ~1.4e-5
  (ecsimcorr).  The *identity* columns (dE+dB+dK, the ecsimcorr work
  bookkeeping PWD/LdK/WD, charge conservation norms) stay at
  1e-10..1e-15 for the whole horizon — those are solver-independent
  and carry the tight tolerances below.

  **Measured evidence that the trajectory tolerances are solver noise,
  not a physics bug** (2026-08-19, the XPIC_KSP_TOL experiment, 20
  steps of the ecsim config): tightening OUR solve from 1e-7 to 1e-10
  leaves the reference-vs-ours trajectory diffs unchanged (dE 6.58e-7
  -> 6.56e-7, dK 6.14e-7 -> 6.16e-7) while our own closure identity
  drops proportionally to the residual (dE+dB+dK diff 1.1e-9 ->
  6.9e-13).  The step-20 diff floor is therefore the *reference's* own
  1e-7 KSP budget, which no tightening on our side can remove; the
  measured growth from there (2.1e-7 @ step 10, 6.6e-7 @ 20, 2.6e-5 @
  100 => e-folding ~0.046/step) sets the full-horizon tolerances.

Measured-vs-asserted margins are ~5-20x.  Reference configs:
tests/{basic,ecsim,ecsimcorr}/{basic,ecsim,ecsimcorr}_ex1.cpp.
"""

import os
import sys

import jax
import numpy as np
import pytest

from xpic_tpu.commands import particles_load
from xpic_tpu.config import Config
from xpic_tpu.schemes import build_simulation

REF = "/root/reference/tests"
STEPS = 100


def reference_available() -> bool:
    return os.path.isdir(REF)


pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference expected files not present"
)


def make_config(out_dir, scheme, L, d, dt, nt):
    return Config.from_json({
        "Simulation": scheme,
        "OutputDirectory": str(out_dir),
        "Geometry": {
            "x": L, "y": L, "z": L, "t": nt * dt,
            "dx": d, "dy": d, "dz": d, "dt": dt,
            "diagnose_period": nt * dt / 2,
            "da_boundary_x": "DM_BOUNDARY_PERIODIC",
            "da_boundary_y": "DM_BOUNDARY_PERIODIC",
            "da_boundary_z": "DM_BOUNDARY_PERIODIC",
        },
        "Particles": [
            {"sort_name": "electrons", "Np": 100, "n": 1.0, "q": -1.0,
             "m": 1.0, "T": 0.1}
        ],
        "Presets": [
            {"command": "SetParticles", "particles": "electrons",
             "coordinate": {"name": "CoordinateInBox"},
             "momentum": {"name": "MaxwellianMomentum", "tov": True}}
        ],
        "Diagnostics": [
            {"diagnostic": "FieldView", "field": "E"},
            {"diagnostic": "FieldView", "field": "B"},
            {"diagnostic": "DistributionMoment", "particles": "electrons",
             "moment": "density"},
        ],
    })


def run_reference_config(tmp, scheme, *, L, d, dt, nt):
    particles_load.use_reference_rng()
    cfg = make_config(tmp, scheme, L, d, dt, nt)
    os.environ["XPIC_RNG"] = "reference"
    try:
        sim = build_simulation(cfg)
        sim.initialize()
        sim.calculate()
        sim.finalize()
        hist = getattr(sim, "ksp_history", None)
        if hist:
            np.savetxt(os.path.join(cfg.out_dir, "temporal",
                                    "ksp_iters.txt"), hist, fmt="%d")
    finally:
        os.environ.pop("XPIC_RNG", None)
        particles_load.seed(5489)
    return cfg.out_dir


def read_table(path):
    with open(path) as fh:
        header = fh.readline().split()
        rows = np.loadtxt(fh)
    if rows.ndim == 1:
        rows = rows[None, :]
    return header, rows


def assert_table(out_dir, scheme, diag, tolerances, nrows=None):
    """Column-by-column absolute-diff comparison, reference comparator
    semantics (tests/common.h:56-89): identical headers, identical row
    count, per-column tolerance."""
    exp_path = os.path.join(REF, scheme, "expected", f"{scheme}_ex1",
                            "temporal", diag)
    he, ee = read_table(exp_path)
    ho, oo = read_table(os.path.join(out_dir, "temporal", diag))
    assert ho == he, f"{diag}: header mismatch\n exp {he}\n got {ho}"
    if nrows is None:
        assert oo.shape == ee.shape, f"{diag}: row count mismatch"
        nrows = ee.shape[0]
    for c, name in enumerate(he):
        if name == "Time":
            continue
        tol = tolerances.get(name, tolerances.get("*"))
        assert tol is not None, f"no tolerance for column {name}"
        d = np.abs(oo[:nrows, c] - ee[:nrows, c])
        assert d.max() <= tol, (
            f"{diag} col {name}: max |diff| {d.max():.3e} > {tol:.1e} "
            f"at row {d.argmax()}"
        )


def assert_dump(out_dir, scheme, series, t, nt, atol):
    wid = len(str(nt))
    name = f"{t:0{wid}d}"
    exp = np.fromfile(os.path.join(REF, scheme, "expected", f"{scheme}_ex1",
                                   series, name), dtype=np.float32)
    got = np.fromfile(os.path.join(out_dir, series, name), dtype=np.float32)
    assert got.shape == exp.shape, f"{series}/{name}: size mismatch"
    d = np.abs(got - exp).max()
    assert d <= atol, f"{series}/{name}: max |diff| {d:.3e} > {atol:.1e}"


# -- basic: explicit scheme, bit-level horizon parity -----------------------

@pytest.fixture(scope="module")
def basic_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("golden_basic")
    # tests/basic/basic_ex1.cpp:38-45 — dx=0.05, dt=0.025, 10^3, 100 steps.
    return run_reference_config(tmp, "basic", L=0.5, d=0.05, dt=0.025,
                                nt=STEPS)


def test_basic_initial_load_bitwise(basic_run):
    # Step-0 density depends only on the RNG + loader + CIC deposit:
    # zero tolerance proves the initial particles are the reference's.
    assert_dump(basic_run, "basic", "electrons/density", 0, STEPS, 0.0)
    assert_dump(basic_run, "basic", "E", 0, STEPS, 0.0)
    assert_dump(basic_run, "basic", "B", 0, STEPS, 0.0)


def test_basic_energy_tables(basic_run):
    # Measured max diffs: 0.0 on most columns, 1.7e-16 dK, 1e-13 closure.
    assert_table(basic_run, "basic", "energy.txt", {"*": 1e-9})
    assert_table(basic_run, "basic", "energy_conservation.txt", {"*": 1e-9})


def test_basic_charge_table(basic_run):
    # Measured max 4.0e-11 (N1dQ); the reference's own values are ~5e-11.
    assert_table(basic_run, "basic", "charge_conservation.txt", {"*": 1e-9})


def test_basic_momentum_table(basic_run):
    # The reference itself skips this comparison under MPI
    # (basic_ex1.cpp:30-31 '@todo'); single-rank values match to 4.9e-13.
    assert_table(basic_run, "basic", "momentum_conservation.txt",
                 {"*": 1e-9})


# -- ecsim: semi-implicit, solver-noise-bounded parity ----------------------

@pytest.fixture(scope="module")
def ecsim_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("golden_ecsim")
    # tests/ecsim/ecsim_ex1.cpp:36-43 — dx=0.5, dt=1.5, 10^3, 100 steps.
    return run_reference_config(tmp, "ecsim", L=5.0, d=0.5, dt=1.5, nt=STEPS)


def test_ecsim_initial_load_bitwise(ecsim_run):
    assert_dump(ecsim_run, "ecsim", "electrons/density", 0, STEPS, 0.0)
    assert_dump(ecsim_run, "ecsim", "E", 0, STEPS, 0.0)
    assert_dump(ecsim_run, "ecsim", "B", 0, STEPS, 0.0)


def test_ecsim_energy_conservation_table(ecsim_run):
    # Trajectory columns: measured 2.6e-5 over 100 steps (PETSc-vs-ours
    # Krylov residual, chaotically amplified).  Identity column: 4.1e-10.
    assert_table(ecsim_run, "ecsim", "energy_conservation.txt",
                 {"dE": 1e-4, "dB": 1e-5, "dK_electrons": 1e-4,
                  "dE+dB+dK": 2e-9})
    # Early horizon, before chaos: measured 2.1e-7 through step 10.
    assert_table(ecsim_run, "ecsim", "energy_conservation.txt",
                 {"*": 1e-6}, nrows=11)


def test_ecsim_energy_conservation_identity(ecsim_run):
    # Our own closure must hold at the solver floor independently of
    # the reference (expected-table values are ~1e-13).
    h, rows = read_table(os.path.join(ecsim_run, "temporal",
                                      "energy_conservation.txt"))
    total = rows[:, h.index("dE+dB+dK")]
    assert np.abs(total).max() < 2e-9


def test_ecsim_energy_table(ecsim_run):
    assert_table(ecsim_run, "ecsim", "energy.txt",
                 {"wE": 1e-4, "wB": 1e-5, "wK_electrons": 1e-4,
                  "sE": 1e-4, "sB": 1e-5, "sK_electrons": 1e-6})


def test_ecsim_ksp_iterations_bounded(ecsim_run):
    """Long-horizon solver health: KSP iteration counts stay within the
    reference's budget (maxit=100, ecsim/simulation.h:15-18) and do not
    drift upward over the 100-step horizon."""
    iters = np.loadtxt(os.path.join(ecsim_run, "temporal", "ksp_iters.txt"))
    assert iters.max() <= 100
    first, last = iters[:10].mean(), iters[-10:].mean()
    assert last <= max(2.0 * first, first + 5), (
        f"KSP iteration growth: first-10 avg {first:.1f}, "
        f"last-10 avg {last:.1f}"
    )


# -- ecsimcorr: + charge correction and energy bookkeeping ------------------

@pytest.fixture(scope="module")
def ecsimcorr_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("golden_ecsimcorr")
    return run_reference_config(tmp, "ecsimcorr", L=5.0, d=0.5, dt=1.5,
                                nt=STEPS)


def test_ecsimcorr_initial_load_bitwise(ecsimcorr_run):
    assert_dump(ecsimcorr_run, "ecsimcorr", "electrons/density", 0, STEPS,
                0.0)


def test_ecsimcorr_energy_conservation_table(ecsimcorr_run):
    # Measured: dE 1.03e-5, dB 7.6e-7, dK 1.01e-5, CWD 3.3e-6;
    # identities PWD/LdK/WD at 1.6e-15, closure 1.6e-12.
    assert_table(ecsimcorr_run, "ecsimcorr", "energy_conservation.txt",
                 {"dE": 1e-4, "dB": 1e-5, "dK_electrons": 1e-4,
                  "CWD_electrons": 5e-5, "PWD_electrons": 1e-12,
                  "LdK_electrons": 1e-12, "dE+dB+dK": 1e-10, "WD": 1e-12})


def test_ecsimcorr_charge_conservation_table(ecsimcorr_run):
    # The corrected current satisfies continuity to roundoff on both
    # sides: measured max diff 7.0e-13.
    assert_table(ecsimcorr_run, "ecsimcorr", "charge_conservation.txt",
                 {"*": 1e-10})


# -- eccapfim: fully implicit, 10-step reference config ----------------------

@pytest.fixture(scope="module")
def eccapfim_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("golden_eccapfim")
    # tests/eccapfim/eccapfim_ex1.cpp:36-50 — dx=0.5, dt=1.5, 10^3,
    # geom_nt=10 (the reference commits only a 10-step horizon here).
    return run_reference_config(tmp, "eccapfim", L=5.0, d=0.5, dt=1.5, nt=10)


def test_eccapfim_energy_conservation_table(eccapfim_run):
    # Measured (2026-08-19): dE 1.7e-8, dB 1.3e-8, dK 2.8e-7 against the
    # reference's committed table — the Anderson-vs-NGMRES and
    # 4-segment-vs-DDA redesigns agree to the solver budget over the
    # full committed horizon.  The dE+dB+dK closure column sits at our
    # solver + Crank-Nicolson floor (measured 2.6e-7; the reference's
    # own values are ~1e-10 — its closure floor is below its 1e-7 SNES
    # budget because the energy identity is exact at the converged
    # solution, while our per-particle CN tolerance of 0.5e-7 leaks
    # into dK).
    assert_table(eccapfim_run, "eccapfim", "energy_conservation.txt",
                 {"dE": 5e-7, "dB": 5e-7, "dK_electrons": 2e-6,
                  "dE+dB+dK": 2e-6})


def test_eccapfim_charge_conservation_table(eccapfim_run):
    # Both sides satisfy continuity at roundoff: measured max diff
    # 6.9e-13 (N1dQ), 2.9e-14 (N2dQ) — same scale as the committed
    # values themselves.
    assert_table(eccapfim_run, "eccapfim", "charge_conservation.txt",
                 {"*": 1e-11})


def test_eccapfim_initial_load_bitwise(eccapfim_run):
    assert_dump(eccapfim_run, "eccapfim", "electrons/density", 0, 10, 0.0)


# -- solver-residual scaling: the chaos-budget experiment, automated --------

_SCALING_CHILD = r'''
import os, sys

sys.path.insert(0, sys.argv[1])
import jax

jax.config.update("jax_enable_x64", True)
cache = os.environ.get("XPIC_SCALING_CACHE")
if cache:
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

from xpic_tpu.commands import particles_load
from xpic_tpu.config import Config
from xpic_tpu.schemes import build_simulation

out, nt, dt, d, L = sys.argv[2], 20, 1.5, 0.5, 5.0
cfg = Config.from_json({
    "Simulation": "ecsim",
    "OutputDirectory": out,
    "Geometry": {
        "x": L, "y": L, "z": L, "t": nt * dt,
        "dx": d, "dy": d, "dz": d, "dt": dt,
        "diagnose_period": nt * dt,
        "da_boundary_x": "DM_BOUNDARY_PERIODIC",
        "da_boundary_y": "DM_BOUNDARY_PERIODIC",
        "da_boundary_z": "DM_BOUNDARY_PERIODIC",
    },
    "Particles": [
        {"sort_name": "electrons", "Np": 100, "n": 1.0, "q": -1.0,
         "m": 1.0, "T": 0.1}
    ],
    "Presets": [
        {"command": "SetParticles", "particles": "electrons",
         "coordinate": {"name": "CoordinateInBox"},
         "momentum": {"name": "MaxwellianMomentum", "tov": True}}
    ],
    "Diagnostics": [],
})
particles_load.use_reference_rng()
os.environ["XPIC_RNG"] = "reference"
sim = build_simulation(cfg)
sim.initialize()
sim.calculate()
sim.finalize()
'''


def test_ecsim_solver_residual_scaling(tmp_path):
    """The chaos-budget experiment behind the golden trajectory
    tolerances, automated (it was previously run by hand and recorded
    in this file's module docstring): tightening OUR KSP tolerance from
    the reference's 1e-7 budget to 1e-10 must

    * shrink our own closure identity |dE+dB+dK| by >= 100x
      (it tracks the solver residual: measured 1.1e-9 -> 6.9e-13), and
    * leave the reference-vs-ours trajectory diffs unchanged
      (measured dE 6.58e-7 -> 6.56e-7 at step 20) — the diff floor is
      the *reference's* own KSP budget (ecsim/simulation.h:15-18),
      proving the golden tolerances are solver noise, not physics.

    XPIC_KSP_TOL is read at module import (the jit-cache rule), so each
    tolerance runs in a subprocess.
    """
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tables = {}
    for name, tol in (("budget", None), ("tight", "1e-10")):
        out = tmp_path / name
        env = {k: v for k, v in os.environ.items()
               if k not in ("PYTHONPATH", "XPIC_KSP_TOL")}
        env["JAX_PLATFORMS"] = "cpu"
        if tol is not None:
            env["XPIC_KSP_TOL"] = tol
        cache = jax.config.jax_compilation_cache_dir
        if cache:
            env["XPIC_SCALING_CACHE"] = cache
        subprocess.run(
            [sys.executable, "-c", _SCALING_CHILD, repo, str(out)],
            check=True, env=env, timeout=1200)
        tables[name] = read_table(
            os.path.join(out, "temporal", "energy_conservation.txt"))

    h, _ = tables["budget"]
    exp_path = os.path.join(REF, "ecsim", "expected", "ecsim_ex1",
                            "temporal", "energy_conservation.txt")
    h_exp, rows_exp = read_table(exp_path)
    assert h == h_exp

    def closure(name):
        _, rows = tables[name]
        return np.abs(rows[1:, h.index("dE+dB+dK")]).max()

    def traj_diff(name):
        _, rows = tables[name]
        n = rows.shape[0]
        cols = [h.index(c) for c in ("dE", "dB", "dK_electrons")]
        return np.abs(rows[:, cols] - rows_exp[:n, cols]).max()

    c_budget, c_tight = closure("budget"), closure("tight")
    assert c_budget > 100.0 * c_tight, (
        f"closure identity did not track the solver residual: "
        f"{c_budget:.3e} -> {c_tight:.3e}")

    d_budget, d_tight = traj_diff("budget"), traj_diff("tight")
    assert d_tight < 3.0 * d_budget + 1e-12 and \
        d_budget < 3.0 * d_tight + 1e-12, (
        f"trajectory diffs moved with OUR tolerance "
        f"({d_budget:.3e} vs {d_tight:.3e}) — the floor should be the "
        f"reference's own KSP budget")
