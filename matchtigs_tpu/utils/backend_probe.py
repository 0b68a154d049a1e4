"""Safe accelerator-availability probing.

In this deployment the TPU is reached through a loopback relay tunnel
(the ``axon`` PJRT backend dials 127.0.0.1:8082).  When the relay
process is dead, *lazy JAX backend initialization blocks indefinitely*
— so any code that asks ``jax.default_backend()`` / ``jax.devices()``
to decide "is there an accelerator?" hangs the whole pipeline instead
of falling back to the host engine.

These helpers answer the question without triggering backend init when
it is knowably doomed: if the configured platform is a relay-tunneled
backend and the relay port does not accept connections, the answer is
"no accelerator" immediately.

The reference has no analog (it is CPU-only); this is the failure-
detection / soft-degradation subsystem of SURVEY.md §5 applied to the
device link.
"""

from __future__ import annotations

import logging
import os
import socket

logger = logging.getLogger(__name__)

# Loopback relay ports used by the axon backend; 8082 is the primary
# claim/compile channel — if it refuses, the backend cannot come up.
_RELAY_PORT = 8082

_cached_reachable: bool | None = None


def relay_reachable(timeout: float = 2.0) -> bool:
    """True when the axon relay accepts TCP connections (cached)."""
    global _cached_reachable
    if _cached_reachable is None:
        try:
            socket.create_connection(
                ("127.0.0.1", _RELAY_PORT), timeout=timeout
            ).close()
            _cached_reachable = True
        except OSError:
            _cached_reachable = False
    return _cached_reachable


def backend_init_safe() -> bool:
    """True when initializing the JAX backend cannot hang.

    CPU (and any non-relayed platform) always initializes; the axon
    platform initializes only if the relay is up.
    """
    import sys

    if "jax" in sys.modules:
        import jax

        # Already-initialized backends are safe to query again.
        if jax._src.xla_bridge._backends:  # type: ignore[attr-defined]
            return True
    plats = os.environ.get("JAX_PLATFORMS", "")
    if "axon" not in plats:
        return True
    if not relay_reachable():
        logger.warning(
            "axon TPU relay (127.0.0.1:%d) is unreachable; treating the "
            "run as CPU-only to avoid hanging in backend initialization",
            _RELAY_PORT,
        )
        return False
    return True


def accelerator_count() -> int:
    """Number of usable accelerator/CPU devices; 0 = stick to host code.

    Returns ``len(jax.devices())`` when backend init is safe (this may
    be virtual CPU devices under ``xla_force_host_platform_device_count``
    — callers that care distinguish via :func:`default_backend`), and 0
    when the accelerator link is known-dead.
    """
    if not backend_init_safe():
        return 0
    import jax

    try:
        return len(jax.devices())
    except Exception as e:  # backend registered but failed to init
        logger.warning("JAX backend initialization failed: %s", e)
        return 0


def default_backend() -> str:
    """``jax.default_backend()`` or ``"none"`` when init would hang/fail."""
    if not backend_init_safe():
        return "none"
    import jax

    try:
        return jax.default_backend()
    except Exception as e:
        logger.warning("JAX backend initialization failed: %s", e)
        return "none"
