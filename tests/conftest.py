"""Test configuration: force an 8-device virtual CPU mesh.

Runs before any test module imports jax. The axon TPU plugin in this image
ignores the JAX_PLATFORMS env var, so we also set it via jax.config.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: repeat suite runs skip recompilation.
# Machine-keyed: XLA:CPU AOT entries are host-ISA specific and loading
# another machine's entries risks SIGILL (srfdet3d_tpu/utils/cpu_cache.py).
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
import sys  # noqa: E402
sys.path.insert(0, _repo)
from srfdet3d_tpu.utils.cpu_cache import cpu_cache_suffix  # noqa: E402
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_repo, f".jax_cache_cpu_{cpu_cache_suffix()}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
