"""Reproducer harness for the XLA:CPU persistent-compile-cache crash.

Across rounds 3-5 the full test suite sporadically segfaulted on the
CPU backend, always with the top frame inside jaxlib's
``_compile_and_write_cache`` (jax/_src/compiler.py:746), with both the
zstd and zlib cache compressors, at a *different* test each time.  The
suite's containment (tests/conftest.py): persistent cache OFF by
default, ``zstandard`` import blocked, pytest-xdist workers to confine
a crash to one file.

This script is the isolation attempt: it hammers exactly the suspect
path — many distinct small compilations racing with cache writes from
several threads (the xdist workers of one suite share a cache dir when
XPIC_TEST_CACHE_DIR is set).  Exit code 0 = no crash this run; a
segfault here (rc -11) confirms the jaxlib-layer diagnosis with a
30-line witness, independent of the test suite.

Observed environment: jax/jaxlib 0.9.0, python 3.12, XLA:CPU.
Usage: JAX_PLATFORMS=cpu python benchmarks/repro_cache_segfault.py [n]
"""

import os
import sys
import tempfile
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if (".axon_site" in os.environ.get("PYTHONPATH", "")
        and os.environ.get("XPIC_REPRO_REEXECED") != "1"):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["XPIC_REPRO_REEXECED"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

cache_dir = os.environ.get("XPIC_REPRO_CACHE",
                           tempfile.mkdtemp(prefix="xpic_cache_repro_"))
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 400
THREADS = int(os.environ.get("XPIC_REPRO_THREADS", "4"))
print(f"jax {jax.__version__}, cache={cache_dir}, "
      f"{N} compiles x {THREADS} threads", flush=True)


def worker(tid: int) -> None:
    rng = np.random.default_rng(tid)
    for i in range(N):
        # distinct shapes -> distinct cache entries -> one write each
        n = 8 + (tid * N + i) % 96
        x = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)

        @jax.jit
        def f(x, _k=i, _t=tid):
            return jnp.tanh(x @ x.T) + _k * 1e-6 + _t

        float(f(x).sum())
    print(f"thread {tid} done", flush=True)


threads = [threading.Thread(target=worker, args=(t,))
           for t in range(THREADS)]
for t in threads:
    t.start()
for t in threads:
    t.join()
print("no crash this run", flush=True)
