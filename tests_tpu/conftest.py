"""On-device (TPU) parity suite — opt-in, NOT part of the default run.

The default suite (tests/) forces CPU and exercises the Pallas kernels in
interpret mode, which computes in f32 and therefore cannot catch
real-Mosaic numerics (f32 matmuls run as single bf16 passes on the MXU;
window DMAs need alignment hints; scoped-VMEM limits bind).  This suite
runs the same parity checks ON DEVICE:

    python -m pytest tests_tpu/ -q

Skips (rather than hangs) when the axon tunnel relay is down — jax device
init blocks forever on a dead relay, so we probe the relay port first.
Programs are kept tiny: the remote compiler costs ~20-60 s per kernel
compile (persistent cache makes repeats fast).
"""

import os
import socket


def tpu_available() -> bool:
    """True when a TPU backend is plausibly reachable (without initializing
    jax, which hangs on a dead relay)."""
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return False
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        # not the tunneled-axon environment; let jax decide (local TPU)
        return True
    s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    s.settimeout(2.0)
    try:
        s.connect(("127.0.0.1", 8082))
        return True
    except OSError:
        return False
    finally:
        s.close()


# persistent compile cache (same dir as bench.py — TPU executables)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
