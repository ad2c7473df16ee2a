"""Test env: force the CPU backend with 8 virtual devices so sharding paths
compile/execute without TPU hardware (the driver separately dry-runs the
multi-chip path).

The image's sitecustomize registers the remote-TPU ("axon") PJRT plugin at
interpreter startup and pins jax_platforms, so env vars alone don't stick;
the config updates below (before any backend is initialized) reliably
select an 8-device CPU world.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
