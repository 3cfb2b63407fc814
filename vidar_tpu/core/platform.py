"""Robust JAX backend selection.

The machine images this framework runs on differ in how the TPU is
exposed: some register a PJRT plugin (e.g. ``axon``) via a sitecustomize
hook that force-sets ``JAX_PLATFORMS``/``jax_platforms`` to a plugin name;
others expose the chip through the stock ``tpu`` backend.  When the
configured name does not match a registered backend, every
``jax.devices()`` call raises — so entry points (bench, CLIs, driver
hooks) route through :func:`select_backend`, which falls back to JAX
auto-discovery (tpu if present, else cpu).
"""

from __future__ import annotations


def _auto(jax):
    """Auto-discover (tpu if live, else cpu), retrying transient failures.

    The TPU on some images sits behind a relay whose grant can fail
    transiently; a single failed init would silently land every benchmark
    on the CPU backend, so retry a couple of times before accepting cpu.
    """
    import time

    from jax.extend.backend import clear_backends

    last = None
    for attempt in range(4):
        clear_backends()
        jax.config.update('jax_platforms', '')
        try:
            jax.devices()
            if jax.default_backend() != 'cpu' or attempt == 3:
                return jax.default_backend()
        except RuntimeError as e:   # pragma: no cover - transient plugin
            last = e
        time.sleep(3.0 * (attempt + 1))
        _retry_plugin_registration()
    if last is not None:
        raise last
    return jax.default_backend()


def _retry_plugin_registration():   # pragma: no cover - env-specific
    """Re-attempt PJRT plugin registration if the boot-time attempt lost a
    transient race for the device grant (relay-fronted single-chip TPUs)."""
    import os
    import uuid

    if not os.environ.get('PALLAS_AXON_POOL_IPS'):
        return
    try:
        from axon.register import register
        register(
            None,
            f"{os.environ.get('PALLAS_AXON_TPU_GEN', 'v5e')}:1x1x1",
            so_path='/opt/axon/libaxon_pjrt.so',
            session_id=str(uuid.uuid4()),
            remote_compile=os.environ.get(
                'PALLAS_AXON_REMOTE_COMPILE') == '1',
        )
    except Exception:
        pass


def select_backend(prefer: str | None = None) -> str:
    """Initialize a working JAX backend and return its name.

    Args:
      prefer: optional explicit platform list (e.g. ``'cpu'``) to force;
        failure to initialize it raises.

    Without ``prefer``: tries a ``JAX_PLATFORMS`` environment variable
    (even when a sitecustomize hook overrode the config value in-process),
    then the currently-configured ``jax_platforms``; if initialization
    fails (a hook naming an unregistered plugin), clears the backend
    cache and retries with auto-discovery.
    """
    import os

    import jax

    if prefer is not None:
        jax.config.update('jax_platforms', prefer)
        jax.devices()
        return jax.default_backend()

    env = os.environ.get('JAX_PLATFORMS')
    if env and env != jax.config.jax_platforms:
        try:
            jax.config.update('jax_platforms', env)
        except RuntimeError:
            return _auto(jax)
    try:
        jax.devices()
        return jax.default_backend()
    except RuntimeError:
        return _auto(jax)
