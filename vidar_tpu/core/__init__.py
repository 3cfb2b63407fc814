from .checkpoint import (save_checkpoint, load_checkpoint,
                         import_torch_checkpoint)


def enable_compilation_cache(path: str = None):
    """Persistent XLA compilation cache (first compile of the full model is
    ~minutes; cached reloads are seconds). Called by every CLI."""
    import os
    import jax
    path = path or os.environ.get('VIDAR_TPU_COMPILE_CACHE',
                                  os.path.expanduser('~/.cache/jax_cc'))
    jax.config.update('jax_compilation_cache_dir', path)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    from .platform import select_backend
    select_backend()
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
