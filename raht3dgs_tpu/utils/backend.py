"""Backend identity helpers.

The remote-TPU tunnel in this environment is served by the "axon" PJRT
plugin. Depending on the plugin build, ``jax.default_backend()`` reports
either ``"axon"`` (older builds) or plain ``"tpu"`` (newer builds, which
only reveal the plugin in ``platform_version`` — e.g. ``"axon 0.1.0; ..."``).
Code that adapts to the tunnel's remote-host link characteristics (narrow
fetches, fetch-based completion barriers) must detect both spellings, so
the check lives here in one place.
"""

from __future__ import annotations

import jax

_TUNNEL_CACHE: dict = {}


def is_remote_tunnel_backend() -> bool:
    """True iff the default JAX backend is the axon remote-TPU tunnel.

    Checks the backend name and, for plugin builds that report a plain
    "tpu" platform, the ``platform_version`` string. Cached per backend
    name (the default backend never changes after initialization)."""
    name = jax.default_backend()
    if name in _TUNNEL_CACHE:
        return _TUNNEL_CACHE[name]
    if name == "axon":
        hit = True
    elif name == "tpu":
        try:
            from jax._src import xla_bridge

            version = getattr(
                xla_bridge.get_backend(), "platform_version", ""
            )
        except Exception:
            version = ""
        hit = "axon" in version
    else:
        hit = False
    _TUNNEL_CACHE[name] = hit
    return hit
