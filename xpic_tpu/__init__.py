"""xpic_tpu — a TPU-native 3-D electromagnetic particle-in-cell framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference C++/PETSc/MPI code `vakurshakov/xpic`:

* four time-integration schemes — ``basic`` (explicit FDTD + Boris +
  Esirkepov), ``ecsim`` (energy-conserving semi-implicit), ``ecsimcorr``
  (ECSIM + charge-conserving correction), ``eccapfim`` (fully implicit,
  energy- and charge-conserving) — selectable from the same JSON config
  schema as the reference (reference: src/interfaces/simulation.cpp:160-182);
* Yee-staggered fields as sharded dense arrays, curl/div/grad as stencil
  operators (reference: src/utils/operators.cpp) instead of assembled
  sparse matrices;
* particles as fixed-capacity structure-of-arrays pytrees, cell-sorted
  every step (replacing the reference's ``vector<list<Point>>`` storage,
  src/interfaces/particles.h:32);
* the ECSIM "Lapenta" mass matrix as dense per-cell 36x36 blocks with a
  batched-matmul SpMV that runs on the MXU (replacing the PETSc COO
  assembly of src/impls/ecsim/simulation.cpp:336-492);
* from-scratch Krylov (CG/GMRES) and nonlinear (Picard/Anderson) solvers
  with ``psum``-style reductions that shard over a device mesh.

Precision policy: parity/conservation runs use float64
(``jax_enable_x64``); the speed path is float32.  Set ``XPIC_X64=0`` to
keep JAX in 32-bit mode before importing this package.
"""

import os

import jax

if os.environ.get("XPIC_X64", "1") != "0":
    jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
