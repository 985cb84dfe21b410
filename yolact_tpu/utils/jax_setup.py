"""Common JAX runtime setup: persistent compilation cache.

This host has very few CPU cores, so XLA compiles dominate wall-clock for
tests and scripts.  Importing this module turns on the persistent
compilation cache so every process reuses compiled executables.
"""

import os

_CACHE_DIR = os.environ.get('YOLACT_TPU_JAX_CACHE',
                            os.path.expanduser('~/.cache/yolact_tpu_xla'))


def setup(cache_dir: str = _CACHE_DIR) -> None:
    import jax
    # Key the cache per platform: entries compiled by the remote-TPU relay
    # target a different CPU ISA and would SIGILL if loaded locally.
    platform = jax.config.jax_platforms or os.environ.get(
        'JAX_PLATFORMS', 'default')
    cache_dir = f'{cache_dir}_{platform.replace(",", "_")}'
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.3)


setup()
