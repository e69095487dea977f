import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding code is
# exercised without TPU hardware (SURVEY.md §4).
os.environ['JAX_PLATFORMS'] = 'cpu'

# The container's sitecustomize imports jax before conftest runs, so the
# env var alone is latched too early — update the live config as well.
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8'
    ).strip()
