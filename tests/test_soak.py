"""Long-horizon soak: solver health and conservation must not drift.

The golden-parity horizon is 100 steps (tests/test_golden.py); solver
or migration regressions compound beyond it.  This opt-in soak runs a
1000-step ecsim box and asserts the three continuous-observability
invariants the reference watches through LogView/SyncClock
(src/diagnostics/log_view.h:17-35):

* energy closure |d(WE+WB+K)| stays at the scheme's floor per step —
  no secular growth;
* KSP iteration counts stay flat (no preconditioner/conditioning
  drift);
* the neighbor-migration exact guard keeps taking the fast path (a
  drifting guard means the step degenerates to the global sort).

Run with ``XPIC_SOAK=1 pytest tests/test_soak.py`` (about 2-4 minutes
on the CPU backend).
"""

import os

import numpy as np
import pytest

SOAK = os.environ.get("XPIC_SOAK") == "1"
STEPS = int(os.environ.get("XPIC_SOAK_STEPS", "1000"))


@pytest.mark.skipif(not SOAK, reason="opt-in long soak (XPIC_SOAK=1)")
def test_ecsim_1000_step_soak(tmp_path):
    import jax.numpy as jnp

    from xpic_tpu.commands import particles_load
    from xpic_tpu.config import Config
    from xpic_tpu.ops.neighbor_rebin import neighbor_guard_stats
    from xpic_tpu.schemes import build_simulation

    dt = 1.5
    particles_load.seed(3)
    cfg = Config.from_json({
        "Simulation": "ecsim",
        "OutputDirectory": str(tmp_path / "soak"),
        "Geometry": {
            "x": 4.0, "y": 4.0, "z": 4.0, "t": STEPS * dt,
            "dx": 0.5, "dy": 0.5, "dz": 0.5, "dt": dt,
            "diagnose_period": 50,
            "da_boundary_x": "DM_BOUNDARY_PERIODIC",
            "da_boundary_y": "DM_BOUNDARY_PERIODIC",
            "da_boundary_z": "DM_BOUNDARY_PERIODIC",
        },
        "Particles": [
            {"sort_name": "electrons", "Np": 10, "n": 1.0, "q": -1.0,
             "m": 1.0, "T": 0.1}
        ],
        "Presets": [
            {"command": "SetParticles", "particles": "electrons",
             "coordinate": {"name": "CoordinateInBox"},
             "momentum": {"name": "MaxwellianMomentum", "tov": True}},
        ],
        "Diagnostics": [],
    })
    sim = build_simulation(cfg)
    sim.initialize()
    sp = sim.species[0]

    guard_ok = guard_total = 0
    for t in range(1, STEPS + 1):
        sim.timestep_implementation(t)
        for diag in sim.diagnostics:
            diag.diagnose(t)
        if t % 20 == 0:
            ok, _moved, _n = neighbor_guard_stats(sp.state, sim.geom)
            guard_total += 1
            guard_ok += int(bool(ok))
    sim.finalize()

    # 1. energy closure: per-step |dE+dB+dK| at the f64 scheme floor,
    #    in the tail as much as at the start (no secular drift).
    table = np.loadtxt(
        tmp_path / "soak" / "temporal" / "energy_conservation.txt",
        skiprows=1)
    closure = np.abs(table[:, -1])
    assert closure[1:].max() < 1e-8, closure.max()
    tail = closure[len(closure) // 2:]
    assert tail.max() < 10 * max(closure[1:10].max(), 1e-12)

    # 2. KSP flatness: the warm iteration count must not creep up.
    ksp = np.asarray(sim.ksp_history)
    assert ksp.max() <= ksp[:50].max() + 2, (
        f"KSP drift: first-50 max {ksp[:50].max()}, overall {ksp.max()}")

    # 3. migration guard health: the exact guard keeps the fast path.
    assert guard_ok >= 0.99 * guard_total, (guard_ok, guard_total)

    # bookkeeping sanity: no particle loss on a periodic box
    assert sp.count() == sim.geom.n_cells * 10
