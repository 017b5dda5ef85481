"""Test configuration: run everything on a virtual 8-device CPU mesh.

TPU hardware (1 chip) is only used by bench.py; unit/regression tests use
XLA's host-platform device virtualization so multi-chip sharding paths are
exercised without real hardware (SURVEY.md §4.5).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize force-registers the TPU backend and overrides
# JAX_PLATFORMS from the environment, so pin CPU via jax.config instead.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
REFBUILD = REPO / ".refbuild"
REF = pathlib.Path("/root/reference/benchmarks")

sys.path.insert(0, str(REPO))

_ORACLE_SENTINELS = ("abea_harness", "r94_model.txt", "fmi_ref", "poa_ref",
                     "kmer_mini_ref", "pileup_ref", "dbg_ref")


def pytest_configure(config):
    """Auto-build the reference oracles on a fresh checkout so the
    parity tests RUN instead of silently skipping; fail loudly if the
    build breaks (set GENARCH_NO_ORACLE_BUILD=1 to opt out)."""
    missing = [s for s in _ORACLE_SENTINELS if not (REFBUILD / s).exists()]
    if (missing and REF.exists()
            and not os.environ.get("GENARCH_NO_ORACLE_BUILD")):
        sys.stderr.write(
            f"[conftest] building reference oracles ({', '.join(missing)}) "
            "— a few minutes on first run ...\n")
        r = subprocess.run(
            ["bash", str(REPO / "tests" / "oracles" / "build_oracles.sh")],
            capture_output=True, text=True, timeout=1800)
        if r.returncode != 0:
            raise pytest.UsageError(
                "reference oracle build FAILED — parity tests would "
                "silently skip.  Fix the build or set "
                "GENARCH_NO_ORACLE_BUILD=1 to accept the skips.\n"
                + r.stderr[-2000:])


_BUILD_CMDS = {
    "chain_ref": "g++ -O2 -fopenmp -I {ref}/chain/src -o {out} {ref}/chain/src/main.cpp {ref}/chain/src/host_data_io.cpp {ref}/chain/src/host_kernel.cpp",
    "fastchain_ref": "g++ -O2 -fopenmp -I {ref}/fast-chain/src -o {out} {ref}/fast-chain/src/main.cpp {ref}/fast-chain/src/host_data_io.cpp {ref}/fast-chain/src/host_kernel.cpp",
    "bsw_ref": "g++ -O2 -fopenmp -msse4.1 -DENABLE_PREFETCH -DBWA_OTHER_ELE=0 -DSORT_PAIRS=1 -I {ref}/bsw/src -o {out} {ref}/bsw/src/main_banded.cpp {ref}/bsw/src/bandedSWA.cpp",
    "bpm_ref": "gcc -O2 -fopenmp -I {ref}/bpm -o {out} $(find {ref}/bpm -name '*.c' | grep -v generate_datasets) -lm",
    "wfa_ref": "gcc -O2 -fopenmp -I {ref}/wfa -o {out} $(find {ref}/wfa -name '*.c' | grep -v generate_dataset) -lm",
}


def ref_binary(name: str) -> pathlib.Path:
    """Build (once) and return a reference binary used as golden-output oracle."""
    REFBUILD.mkdir(exist_ok=True)
    path = REFBUILD / name
    if not path.exists():
        cmd = _BUILD_CMDS[name].format(ref=REF, out=path)
        r = subprocess.run(["bash", "-c", cmd], capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"cannot build {name}: {r.stderr[-500:]}")
    return path


@pytest.fixture(scope="session")
def chain_ref():
    return ref_binary("chain_ref")


@pytest.fixture(scope="session")
def fastchain_ref():
    return ref_binary("fastchain_ref")


@pytest.fixture(scope="session")
def bsw_ref():
    return ref_binary("bsw_ref")


@pytest.fixture(scope="session")
def bpm_ref():
    return ref_binary("bpm_ref")


@pytest.fixture(scope="session")
def wfa_ref():
    return ref_binary("wfa_ref")
