"""Multi-process decomposition invariance (the ``mpiexec -np 2`` bar).

The reference proves its distributed path by re-running the same golden
binaries under ``mpiexec -np 2`` and requiring identical tables
(tests/ecsim/CMakeLists.txt:16-18).  Here two OS processes (each with 2
virtual CPU devices) join one JAX runtime through
``runtime/distributed.maybe_initialize_distributed`` — the
PetscInitialize analog (src/main.cpp:12) — and run the config-driven
ecsim simulation over the resulting 4-device global mesh.  Their tables
must match a single-process run of the same config exactly.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "multiproc_worker.py")

_SINGLE_DRIVER = """
import os, sys
sys.path.insert(0, os.environ['XPIC_ROOT'])
sys.path.insert(0, os.path.join(os.environ['XPIC_ROOT'], 'tests'))
import multiproc_worker as w
# Single-process control run: skip the distributed join, same config.
import xpic_tpu.runtime.distributed as dist
dist.maybe_initialize_distributed = lambda: True
w.main()
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env(**extra):
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "XLA_FLAGS", "JAX_PLATFORMS",
                        "XPIC_COORDINATOR", "XPIC_NUM_PROCESSES",
                        "XPIC_PROCESS_ID")}
    env.update(extra)
    return env


def _read_table(path):
    with open(path) as fh:
        header = fh.readline().split()
        rows = np.loadtxt(fh)
    if rows.ndim == 1:
        rows = rows[None, :]
    return header, rows


@pytest.mark.parametrize("scheme", ["ecsim", "ecsimcorr", "basic",
                                    "eccapfim"])
def test_two_process_run_matches_single_process(tmp_path, scheme):
    """All four schemes under the 2-process bar (the reference re-runs
    every golden under ``mpiexec -np 2``, tests/*/CMakeLists.txt):
    ecsimcorr adds the lambda-renormalization psums (corr_w/pred_w
    reductions spanning processes, ecsimcorr/particles.cpp:85,148);
    eccapfim the Anderson outer solve's cross-process residual psums
    (on a 6^3 box x 2 steps to bound cost)."""
    port = _free_port()
    nproc = 2
    cache = str(tmp_path / "jax_cache")
    procs = []
    for pid in range(nproc):
        env = _clean_env(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            XPIC_COORDINATOR=f"127.0.0.1:{port}",
            XPIC_NUM_PROCESSES=str(nproc),
            XPIC_PROCESS_ID=str(pid),
            XPIC_TEST_OUT=str(tmp_path / f"proc{pid}"),
            XPIC_TEST_SCHEME=scheme,
            XPIC_TEST_CACHE=cache,
        )
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env, cwd=ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = [p.communicate(timeout=2300)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {pid} failed (rc={p.returncode}):\n{out[-4000:]}"
        )

    # Single-process control run of the identical config on a 4-device
    # virtual mesh.
    env = _clean_env(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        XPIC_NUM_PROCESSES="1",
        XPIC_TEST_OUT=str(tmp_path / "single"),
        XPIC_TEST_SCHEME=scheme,
        XPIC_TEST_CACHE=cache,
        XPIC_ROOT=ROOT,
    )
    single = subprocess.run(
        [sys.executable, "-c", _SINGLE_DRIVER], env=env, cwd=ROOT,
        capture_output=True, text=True, timeout=2300,
    )
    assert single.returncode == 0, (
        single.stdout[-2000:] + single.stderr[-2000:]
    )

    for table in ("energy_conservation.txt", "charge_conservation.txt"):
        hs, rs = _read_table(tmp_path / "single" / "temporal" / table)
        for pid in range(nproc):
            hp, rp = _read_table(
                tmp_path / f"proc{pid}" / "temporal" / table
            )
            assert hs == hp
            np.testing.assert_allclose(
                rp, rs, rtol=0, atol=1e-11,
                err_msg=f"proc{pid}:{table} vs single-process",
            )
