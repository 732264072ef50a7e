import os

# Tests run on a virtual 8-device CPU mesh so sharding/distribution tests work
# without TPU hardware (and unit tests stay fast/deterministic).
#
# NB: this environment preloads jax via sitecustomize, so JAX_PLATFORMS set
# here via os.environ is too late — use jax.config, which works any time
# before backend initialization.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
