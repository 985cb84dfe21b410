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
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.3)


setup()
