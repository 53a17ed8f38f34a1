import os

# Tests run on a virtual 8-device CPU mesh (the driver separately validates
# multi-chip compilation; real TPU runs happen in bench.py).
#
# NOTE: this environment pre-sets JAX_PLATFORMS=axon (a remote TPU tunnel)
# via sitecustomize, so we must force the cpu platform through jax.config
# *after* import — env overrides alone are ignored.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
