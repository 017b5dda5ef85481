"""Umbrella CLI: the TPU-native equivalent of the reference's
per-benchmark binaries + run_wrapper.sh harness.

    python -m genarchbench_tpu.cli list
    python -m genarchbench_tpu.cli run <kernel> [kernel args...]
    python -m genarchbench_tpu.cli regress <kernel> --cmd "<args>" \
        --golden ref.txt [--devices 1,2,8] [--check exact|sorted|...]

`run` dispatches to the kernel's own reference-compatible CLI (see the
registry, core/registry.py).  `regress` re-runs the kernel under
different virtual device counts (the TPU analogue of the reference's
1/2/4-OMP-thread sweep, SURVEY.md §4.5: run_wrapper.sh submits each
command x parallelism combination) and applies the kernel's golden
check rule, printing the same PASS/FAIL report shape run_wrapper
prints.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from typing import List, Optional

from genarchbench_tpu.core.check import (check_exact, check_scalar,
                                         check_sorted,
                                         check_tolerant_columns)
from genarchbench_tpu.core.registry import get_kernel, list_kernels


def cmd_list() -> int:
    for spec in list_kernels():
        print(f"{spec.name:12s} {spec.check_rule:14s} {spec.description}")
    return 0


def cmd_run(name: str, args: List[str]) -> int:
    from genarchbench_tpu.core.registry import load_runner
    return load_runner(name)(args) or 0


def _run_subprocess(name: str, args: List[str], n_devices: int,
                    platform: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if n_devices > 1 or platform == "cpu":
        env["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{n_devices}").strip()
        env["GENARCH_PLATFORM"] = "cpu"
    code = (
        "import sys, os\n"
        "import jax\n"
        "if os.environ.get('GENARCH_PLATFORM'):\n"
        "    jax.config.update('jax_platforms',"
        " os.environ['GENARCH_PLATFORM'])\n"
        "sys.path.insert(0, os.environ.get('GENARCH_REPO', '.'))\n"
        "from genarchbench_tpu.core.registry import load_runner\n"
        f"sys.exit(load_runner({name!r})(sys.argv[1:]) or 0)\n")
    env.setdefault("GENARCH_REPO", os.getcwd())
    return subprocess.run([sys.executable, "-c", code, *args],
                          capture_output=True, text=True, env=env,
                          timeout=int(os.environ.get(
                              "GENARCH_REGRESS_TIMEOUT", "1800")))


def cmd_regress(name: str, cmd_args: List[str], golden: Optional[str],
                devices: List[int], platform: str,
                check_rule: Optional[str]) -> int:
    spec = get_kernel(name)
    rule = check_rule or spec.check_rule
    golden_lines = None
    if golden:
        with open(golden) as f:
            golden_lines = f.read().splitlines()

    nfailed = 0
    njobs = 0
    outputs = {}
    for nd in devices:
        njobs += 1
        t0 = time.perf_counter()
        r = _run_subprocess(name, cmd_args, nd, platform)
        wall = time.perf_counter() - t0
        status = "OK" if r.returncode == 0 else f"EXIT {r.returncode}"
        timing = next((ln for ln in r.stderr.splitlines() + r.stdout.splitlines()
                       if ln.startswith(spec.timing_line)), "")
        out_lines = r.stdout.splitlines()
        outputs[nd] = out_lines
        verdict = ""
        if r.returncode == 0 and golden_lines is not None:
            res = _apply_rule(rule, out_lines, golden_lines)
            verdict = "CHECK PASS" if res else f"CHECK FAIL ({res.detail})"
            if not res:
                nfailed += 1
        elif r.returncode != 0:
            nfailed += 1
            verdict = r.stderr.splitlines()[-1][:120] if r.stderr else ""
        print(f"[{name} devices={nd}] {status} wall={wall:.2f}s "
              f"{timing} {verdict}")

    # determinism across device counts (the reference's thread sweep
    # doubles as this check)
    if len(devices) > 1 and all(nd in outputs for nd in devices):
        base = outputs[devices[0]]
        for nd in devices[1:]:
            res = _apply_rule(rule if rule != "scalar" else "sorted",
                              outputs[nd], base)
            if not res:
                nfailed += 1
                print(f"[{name}] NON-DETERMINISTIC across device counts "
                      f"({devices[0]} vs {nd}): {res.detail}")

    print(f"Failed jobs: {nfailed}/{njobs}")
    return 1 if nfailed else 0


def _apply_rule(rule: str, out_lines, ref_lines):
    if rule == "exact":
        return check_exact(out_lines, ref_lines)
    if rule == "sorted":
        return check_sorted(out_lines, ref_lines)
    if rule == "tolerant_abea":
        return check_tolerant_columns(out_lines, ref_lines)
    if rule == "scalar":
        import re
        pat = re.compile(r"Total k-mers (\d+)")
        a = next((pat.search(x) for x in out_lines if pat.search(x)), None)
        b = next((pat.search(x) for x in ref_lines if pat.search(x)), None)
        return check_scalar(a and int(a.group(1)), b and int(b.group(1)))
    raise ValueError(f"unknown rule {rule}")


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd = argv.pop(0)
    if cmd == "list":
        return cmd_list()
    if cmd == "run":
        if not argv:
            print("usage: run <kernel> [args...]", file=sys.stderr)
            return 1
        return cmd_run(argv[0], argv[1:])
    if cmd == "regress":
        import argparse
        p = argparse.ArgumentParser(prog="genarch regress")
        p.add_argument("kernel")
        p.add_argument("--cmd", required=True,
                       help="kernel CLI arguments (one quoted string)")
        p.add_argument("--golden", default=None)
        p.add_argument("--devices", default="1,2,8")
        p.add_argument("--platform", default="cpu",
                       choices=["cpu", "tpu"])
        p.add_argument("--check", default=None)
        a = p.parse_args(argv)
        import shlex
        return cmd_regress(a.kernel, shlex.split(a.cmd), a.golden,
                           [int(x) for x in a.devices.split(",")],
                           a.platform, a.check)
    print(f"unknown command {cmd!r}; try list|run|regress",
          file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
