"""Guard the driver-visible entry points in __graft_entry__.py.

Round 1's only external multi-chip gate failed because ``dryrun_multichip``
tried to force the virtual CPU mesh *after* the environment's sitecustomize
had initialized a backend (MULTICHIP_r01: rc=1, mesh saw 1 device). The fix
re-execs in a scrubbed-env subprocess; this test runs that exact path so a
regression is caught in-suite, not by the driver.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_dryrun_multichip_subprocess():
    import __graft_entry__

    # Simulate the driver's environment: axon trigger set, no device-count
    # flag. The subprocess must still see 8 virtual CPU devices.
    old = {
        k: os.environ.get(k)
        for k in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS", "XLA_FLAGS")
    }
    os.environ["PALLAS_AXON_POOL_IPS"] = "127.0.0.1"
    os.environ["JAX_PLATFORMS"] = "axon"
    try:
        __graft_entry__.dryrun_multichip(8)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
