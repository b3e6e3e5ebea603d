"""Local mimic of the driver's multichip dryrun: 8 virtual CPU devices.

Usage: python tools/run_dryrun_local.py [n_devices]
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n}"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __graft_entry__

__graft_entry__.dryrun_multichip(n)
