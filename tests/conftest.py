# Force tests onto a virtual 8-device CPU mesh: deterministic f32 numerics,
# no TPU needed, and multi-chip sharding is exercised for real via
# jax.sharding.Mesh.
#
# The environment's sitecustomize hook registers (and initializes) the axon
# TPU backend at interpreter start, so setting JAX_PLATFORMS here is not
# enough — already-initialized backends must be cleared too.
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    import jax.extend

    jax.extend.backend.clear_backends()
except Exception:  # pragma: no cover - older jax fallback
    pass

assert jax.devices()[0].platform == "cpu"


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running soak/e2e tests (still run by "
                   "default; deselect with -m 'not slow')")
