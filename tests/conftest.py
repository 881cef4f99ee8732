import os
import sys

# TPU sharding tests run on a virtual 8-device CPU mesh; the real-chip bench
# path is exercised separately by bench.py.
os.environ["JAX_PLATFORMS"] = "cpu"
# the axon plugin ignores JAX_PLATFORMS; the legacy var does force CPU
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
