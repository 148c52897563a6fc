"""t02 — plain-C solvers (analogue of examples/t02_plain_C_solvers.m +
cl_in_C/main_cl_in_C.c): generate a self-contained embedded C solver,
compile it, and run a closed loop through the ctypes bridge."""

import numpy as np
import spcies_tpu as sp
from spcies_tpu.codegen import generate_c_solver, CompiledCSolver


def main():
    sys, param, st = sp.systems.tester_fixture()
    param = dict(param)
    param["T"] = np.diag(np.sum(param["T"], axis=1))

    path = generate_c_solver(sys, param, formulation="laxMPC",
                             rho=15.0, tol=1e-5, k_max=2000)
    print("generated:", path)

    c = CompiledCSolver("laxmpc_admm", n=6, m=2, nz=80)
    A, B = np.asarray(sys["A"]), np.asarray(sys["B"])
    x = np.asarray(st["x"]) * 3.0
    for t in range(15):
        u, k, e, sol = c(x, st["xr"], st["ur"])
        x = A @ x + B @ u
    print("closed loop via C: |x - xr| =",
          round(float(np.linalg.norm(x - st["xr"])), 6),
          " last solve:", k, "iters,", round(sol["run_time_ms"], 3), "ms")


if __name__ == "__main__":
    main()
