"""From-scratch Krylov and nonlinear solvers for sharded fields.

Replaces the PETSc KSP/SNES surface the reference exercises
(src/impls/ecsim/simulation.cpp:255-278, eccapfim/simulation.cpp:358-392):
CG and restarted GMRES over arbitrary pytrees with matvec callbacks, and
an Anderson-accelerated nonlinear solver.  All reductions are
``jnp.vdot``-style sums, which GSPMD lowers to psum over the device mesh.
"""

from .krylov import KrylovResult, cg, gmres
from .anderson import anderson_solve
