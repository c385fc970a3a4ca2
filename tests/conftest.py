import os

# Tests run on CPU with a virtual 8-device mesh so sharding logic is
# exercised without TPU hardware. Must be set before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib
import subprocess

import pytest

# The axon TPU plugin force-overrides jax_platforms at import time, so the
# env var alone is not enough — pin the CPU backend explicitly.
try:
    import jax
    jax.config.update("jax_platforms", "cpu")
except ImportError:
    pass

REFERENCE_TOOLS = pathlib.Path(
    "/root/reference/witch_msa/tools/magus/tools")
EXAMPLES = pathlib.Path("/root/reference/examples/data")


def _tool(name: str):
    for sub in ("hmmer", "fasttree", "mcl"):
        p = REFERENCE_TOOLS / sub / name
        if p.exists():
            return str(p)
    return None


@pytest.fixture(scope="session")
def hmmbuild_bin():
    p = _tool("hmmbuild")
    if p is None:
        pytest.skip("reference hmmbuild binary not available")
    return p


@pytest.fixture(scope="session")
def hmmsearch_bin():
    p = _tool("hmmsearch")
    if p is None:
        pytest.skip("reference hmmsearch binary not available")
    return p


@pytest.fixture(scope="session")
def hmmalign_bin():
    p = _tool("hmmalign")
    if p is None:
        pytest.skip("reference hmmalign binary not available")
    return p


@pytest.fixture(scope="session")
def example_data():
    if not EXAMPLES.exists():
        pytest.skip("reference example data not available")
    return EXAMPLES


def run(cmd, **kw):
    return subprocess.run(cmd, check=True, capture_output=True, **kw)
