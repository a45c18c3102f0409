"""Fast-fail health probe for the tunneled TPU backend.

When the axon relay is down, ``jax.devices()`` HANGS in a connect-retry loop
instead of erroring (DEVNOTES.md "Axon relay outages") — any benchmark or
driver that touches the device then blocks forever.  Entry points that need
the real chip call :func:`require_tpu_relay` BEFORE the first device touch to
turn that hang into an immediate, diagnosable failure.
"""

from __future__ import annotations

import os
import sys
import urllib.error
import urllib.request

RELAY_HEALTH_URL = "http://127.0.0.1:8103/health"


def tpu_relay_up(timeout: float = 10.0) -> bool:
    """True if the axon relay answers its health endpoint (any HTTP status:
    only a connect failure/timeout means the tunnel is down)."""
    try:
        urllib.request.urlopen(RELAY_HEALTH_URL, timeout=timeout)
        return True
    except urllib.error.HTTPError:
        return True  # connected; relay is up even if unhappy
    except Exception:
        return False


def require_tpu_relay() -> None:
    """Exit(2) with a clear message if the run would use the tunneled TPU
    backend but the relay is unreachable.  No-op for CPU runs (JAX_PLATFORMS
    forced to cpu or no axon pool configured)."""
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return  # axon backend never registers without pool IPs
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        # NOTE the axon sitecustomize overrides JAX_PLATFORMS only when pool
        # IPs are set, which the branch above already returned on; an
        # explicit cpu request here is honored.
        return
    if not tpu_relay_up():
        print(
            "ERROR: TPU relay at 127.0.0.1:8103 is unreachable "
            "(jax.devices() would hang, not error — see DEVNOTES.md). "
            "Retry when the tunnel is back, or run CPU-side with "
            "PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu.",
            file=sys.stderr,
        )
        raise SystemExit(2)


def wait_for_tpu_relay(max_wait: float = 300.0, poll: float = 15.0) -> bool:
    """Poll the relay until it answers or ``max_wait`` elapses (it flaps for
    a minute or two between jobs); returns readiness."""
    import time

    deadline = time.time() + max_wait
    while time.time() < deadline:
        if tpu_relay_up():
            return True
        time.sleep(poll)
    return tpu_relay_up()
