import os
import sys

# TPU sharding tests run on a virtual 8-device CPU mesh; the real-chip bench
# path is exercised separately by bench.py.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Some environments import jax during pytest plugin discovery (before this
# conftest), freezing config defaults from the original env — override
# explicitly so the axon/TPU plugin never wins in tests.
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_platform_name", "cpu")
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
