"""Root conftest: force tests onto a virtual 8-device CPU mesh.

The real TPU chip is reserved for bench.py; unit tests must be
deterministic and runnable anywhere.  Env vars must be set before the
first `import jax` anywhere in the test session, which this root
conftest guarantees.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from hmtpu.utils.cachedir import set_default_env  # noqa: E402

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# per-machine cache: stale AOT entries from a host with different CPU
# features mis-execute (buffer-count errors, SIGILL segfaults)
set_default_env()


def pytest_configure(config):
    # the axon TPU plugin ignores the JAX_PLATFORMS env var in this
    # image; the config flag is honoured
    import jax

    jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
