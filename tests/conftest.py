import os
import sys

# CPU with 8 virtual devices: the multi-device test bed (the analogue of the
# reference's "mpirun -np 6 on one box", SURVEY.md section 4).
#
# The container's sitecustomize registers the axon TPU backend at interpreter
# startup whenever PALLAS_AXON_POOL_IPS is set, which locks the platform
# before any conftest code runs.  The only reliable way to a genuine
# multi-device CPU test bed is to re-exec pytest once with that variable
# removed.
if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get("_MIMSEM_REEXEC"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["_MIMSEM_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_enable_x64", True)
