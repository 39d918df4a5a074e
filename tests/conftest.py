import os
import sys

# Hermetic CPU-only JAX for tests: an 8-device virtual mesh exercises the
# multi-chip sharding paths without TPU hardware (SURVEY.md section 4).
# Note: the environment's TPU plugin may force jax_platforms via config at
# interpreter start (sitecustomize), so overriding the env var alone is not
# enough -- fix the config after import too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
try:
    import jax

    if jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")
except ImportError:
    pass

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

TESTDATA = os.path.join(REPO_ROOT, "testdata")


def _ref_tools_fixture():
    import pytest

    if not ensure_ref_oracle():
        pytest.skip("reference oracle unavailable")
    return (
        os.path.join(REPO_ROOT, "refbuild", "build", "ref_enc"),
        os.path.join(REPO_ROOT, "refbuild", "build", "ref_dec"),
    )


try:
    import pytest as _pytest

    ref_tools = _pytest.fixture(name="ref_tools")(_ref_tools_fixture)
except ImportError:
    pass


def ensure_ref_oracle() -> bool:
    """Build the reference oracle binaries if missing; True when usable."""
    import subprocess

    dec = os.path.join(REPO_ROOT, "refbuild", "build", "ref_dec")
    enc = os.path.join(REPO_ROOT, "refbuild", "build", "ref_enc")
    if os.path.exists(dec) and os.path.exists(enc):
        return True
    try:
        subprocess.run(
            ["make", "-C", os.path.join(REPO_ROOT, "refbuild")],
            check=True, capture_output=True, timeout=300,
        )
    except Exception:
        return False
    return os.path.exists(dec) and os.path.exists(enc)
