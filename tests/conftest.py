import os

# CPU with 8 virtual devices: the multi-device test bed (the analogue of the
# reference's "mpirun -np 6 on one box", SURVEY.md section 4).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_enable_x64", True)
