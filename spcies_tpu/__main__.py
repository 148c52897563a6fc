"""Command-line entry point — the analogue of the reference's spcies.m
dispatcher (subcommands version/generate/test/clear/root/help,
spcies.m:39-174).

    python -m spcies_tpu version
    python -m spcies_tpu gen --formulation laxMPC --demo   # osc-masses demo
    python -m spcies_tpu test [pytest args...]
    python -m spcies_tpu clear [directory]
    python -m spcies_tpu root
    python -m spcies_tpu help [topic]
"""

from __future__ import annotations

import os
import sys


def _cmd_version(args):
    import spcies_tpu
    print(spcies_tpu.__version__)
    return 0


def _cmd_root(args):
    import spcies_tpu
    print(os.path.dirname(os.path.abspath(spcies_tpu.__file__)))
    return 0


def _cmd_test(args):
    import pytest
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return pytest.main([os.path.join(root, "tests"), "-q", *args])


def _cmd_clear(args):
    from spcies_tpu.codegen import clear_generated
    clear_generated(*args[:1])
    print("cleared generated solver artifacts")
    return 0


def _cmd_help(args):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    docs = os.path.join(root, "docs")
    topic = args[0] if args else "topics"
    path = os.path.join(docs, f"{topic}.md")
    if not os.path.exists(path):
        print(f"no such help topic {topic!r}; available:")
        for f in sorted(os.listdir(docs)):
            if f.endswith(".md"):
                print("  " + f[:-3])
        return 1
    print(open(path).read())
    return 0


def _cmd_gen(args):
    """Generate a plain-C solver (the embedded deployment backend). With
    --demo, uses the oscillating-masses tutorial fixture."""
    import argparse
    import numpy as np
    import spcies_tpu as sp
    from spcies_tpu.codegen import generate_c_solver

    ap = argparse.ArgumentParser(prog="spcies_tpu gen")
    ap.add_argument("--formulation", default="laxMPC")
    ap.add_argument("--demo", action="store_true",
                    help="use the oscillating-masses tutorial fixture")
    ap.add_argument("--directory", default="generated_solvers")
    ap.add_argument("--rho", type=float, default=1e-2)
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--k-max", type=int, default=1000)
    ns = ap.parse_args(args)
    if not ns.demo:
        print("only --demo generation is supported from the CLI; use "
              "spcies_tpu.codegen.generate_c_solver from Python for "
              "custom systems")
        return 1
    sys_, param, _ = sp.systems.tester_fixture()
    param = dict(param)
    if ns.formulation == "equMPC":
        param.pop("T", None)
    else:
        param["T"] = np.diag(np.sum(param["T"], axis=1))
    path = generate_c_solver(sys_, param, formulation=ns.formulation,
                             directory=ns.directory, rho=ns.rho,
                             tol=ns.tol, k_max=ns.k_max)
    print(f"generated {path} (+ header and shared library)")
    return 0


COMMANDS = {
    "version": _cmd_version, "v": _cmd_version,
    "root": _cmd_root,
    "test": _cmd_test,
    "clear": _cmd_clear,
    "help": _cmd_help, "h": _cmd_help,
    "generate": _cmd_gen, "gen": _cmd_gen,
}


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] not in COMMANDS:
        print(__doc__)
        return 0 if not argv else 1
    return COMMANDS[argv[0]](argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
