"""Isolate the eccapfim crosser fast path: time one _form_species
evaluation (the residual's particle part) at the bench shape for
kc in {0 (general), 8, 16, 32} — fallback-free by construction."""
import os, sys, time, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from xpic_tpu.commands import particles_load
from xpic_tpu.config import Config
from xpic_tpu.schemes import build_simulation
from xpic_tpu.schemes.eccapfim import _form_species

n, ppc, d, dt = 32, 50, 0.5, 1.5
particles_load.seed(0)
cfg = Config.from_json({
    "Simulation": "eccapfim",
    "OutputDirectory": tempfile.mkdtemp(prefix="xpic_fimfast_"),
    "Geometry": {"x": n*d, "y": n*d, "z": n*d, "t": 9*dt,
                 "dx": d, "dy": d, "dz": d, "dt": dt,
                 "diagnose_period": 9*dt,
                 "da_boundary_x": "DM_BOUNDARY_PERIODIC",
                 "da_boundary_y": "DM_BOUNDARY_PERIODIC",
                 "da_boundary_z": "DM_BOUNDARY_PERIODIC"},
    "Particles": [{"sort_name": "electrons", "Np": ppc, "n": 1.0,
                   "q": -1.0, "m": 1.0, "T": 0.1}],
    "Presets": [{"command": "SetParticles", "particles": "electrons",
                 "coordinate": {"name": "CoordinateInBox"},
                 "momentum": {"name": "MaxwellianMomentum", "tov": True}}],
    "Diagnostics": [],
})
sim = build_simulation(cfg)
sim.initialize()
sp = sim.species[0]
st = sp.state
qm, a0 = sp.params.qm, sp.params.q * sp.params.n_Np
rng = np.random.default_rng(0)
E = jnp.asarray(rng.normal(0, 1e-3, sim.E.shape), sim.E.dtype)
B = jnp.asarray(rng.normal(0, 1e-3, sim.E.shape), sim.E.dtype)
print("K =", st.p.shape[1])
for kc in (0, 8, 16, 32):
    out = _form_species(E, B, st, sim.geom, qm, a0, kc)
    jax.block_until_ready(out)
    t0 = time.perf_counter(); R = 3
    for _ in range(R):
        out = _form_species(E, B, st, sim.geom, qm, a0, kc)
        jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / R * 1e3
    print(f"kc={kc:3d}  {ms:8.1f} ms  fallback={int(out[6])}")
