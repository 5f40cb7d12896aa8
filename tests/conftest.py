"""Test configuration: force CPU with 8 virtual devices so sharding/collective tests run
without a TPU pod (the standard JAX trick; SURVEY.md §4).

NOTE: this environment's sitecustomize imports jax at interpreter startup and latches the
platform to the remote 'axon' TPU tunnel (every transfer then takes ~70s). Setting
JAX_PLATFORMS via os.environ here is too late — jax is already imported — so we override
through jax.config, which takes effect before backend initialization.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
