"""Multi-process (multi-"host") smoke test: 2 OS processes, each with 2
virtual CPU devices, brought up via spcies_tpu.parallel.initialize
(jax.distributed + Gloo collectives), solving one globally-sharded batch
through the shard_map path on a 2x2 (host, chip) mesh.

This exercises the multi-host runtime contract (BASELINE.md ">= 2 hosts"
row) end-to-end: distributed init, global device list, host x chip mesh,
per-process input feeding (from_process_local), per-shard termination,
and DCN-style global metric reduction — everything except physical DCN.
"""

import os
import socket
import subprocess
import sys as _sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import spcies_tpu as sp

assert sp.parallel.initialize(coordinator_address=f"localhost:{port}",
                              num_processes=nproc, process_id=pid)
assert sp.parallel.is_distributed()
assert jax.process_count() == nproc
assert len(jax.devices()) == 2 * nproc and len(jax.local_devices()) == 2

mesh = sp.parallel.host_chip_mesh()
assert mesh.devices.shape == (nproc, 2), mesh.devices.shape

sys_, param, st = sp.systems.tester_fixture()
solver = sp.make_solver(sys_, param, formulation="laxMPC", method="ADMM",
                        rho=15.0, tol=1e-6, k_max=3000)

# each process feeds its own local scenarios (multi-host input
# distribution); global batch = 8 lanes, 4 per process
rng = np.random.default_rng(100 + pid)
B_local = 4
x0_l = np.asarray(st["x"])[None, :] * rng.uniform(-2, 2, (B_local, 1))
xr_l = np.tile(st["xr"], (B_local, 1))
ur_l = np.tile(st["ur"], (B_local, 1))
x0 = sp.parallel.from_process_local(mesh, x0_l)
xr = sp.parallel.from_process_local(mesh, xr_l)
ur = sp.parallel.from_process_local(mesh, ur_l)

solve = sp.parallel.shard_map_solver(solver, mesh)
res = solve(x0, xr, ur)
m = sp.parallel.global_fleet_metrics(res, mesh)
assert m["n_hosts"] == nproc and m["n_devices"] == 2 * nproc
assert m["n_converged"] == m["n_lanes"] == B_local * nproc, m
# every process must see identical global metrics (the DCN-reduced view)
print(f"METRICS {pid} {m['n_converged']} {m['k_mean']:.6f} {m['k_max']}",
      flush=True)

# differential check against a local single-process solve of THIS
# process's lanes: per-lane k and u must match the global sharded solve
res_local = solver(x0_l, xr_l, ur_l)
k_global = np.asarray(
    jax.experimental.multihost_utils.process_allgather(res.k, tiled=True))
u_global = np.asarray(
    jax.experimental.multihost_utils.process_allgather(res.u, tiled=True))
sl = slice(pid * B_local, (pid + 1) * B_local)
np.testing.assert_array_equal(k_global[sl], np.asarray(res_local.k))
np.testing.assert_allclose(u_global[sl], np.asarray(res_local.u), atol=0.0)
print(f"OK {pid}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(300)
def test_two_process_distributed_solve(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = root
    procs = [subprocess.Popen(
        [_sys.executable, str(worker), str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            pytest.fail(f"worker timed out; out={out}\nerr={err}")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed: {out}\n{err}"
        assert "OK" in out
    # both processes reported identical global metrics
    metrics = sorted(line for rc, out, _ in outs
                     for line in out.splitlines() if line.startswith("METRICS"))
    assert len(metrics) == 2
    assert metrics[0].split()[2:] == metrics[1].split()[2:], metrics
