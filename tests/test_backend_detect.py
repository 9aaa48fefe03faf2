"""The remote-tunnel detector must recognize both axon plugin spellings:
an "axon" backend name (older builds) and a "tpu" name whose
platform_version carries the plugin banner (newer builds)."""

import numpy as np  # noqa: F401  (uniform test-env import)


def _fresh(monkeypatch, name, version):
    import jax
    from jax._src import xla_bridge

    from raht3dgs_tpu.utils import backend as mod

    monkeypatch.setattr(mod, "_TUNNEL_CACHE", {})
    monkeypatch.setattr(jax, "default_backend", lambda: name)

    class _B:
        platform_version = version

    monkeypatch.setattr(xla_bridge, "get_backend", lambda: _B())
    return mod.is_remote_tunnel_backend()


def test_tunnel_detector_spellings(monkeypatch):
    assert _fresh(monkeypatch, "axon", "") is True
    assert _fresh(monkeypatch, "tpu", "axon 0.1.0; compat c49") is True
    assert _fresh(monkeypatch, "tpu", "TFRT TPU v5") is False
    assert _fresh(monkeypatch, "cpu", "axon 0.1.0") is False


def test_tunnel_detector_on_cpu_suite():
    from raht3dgs_tpu.utils.backend import is_remote_tunnel_backend

    assert is_remote_tunnel_backend() is False  # conftest forces cpu
