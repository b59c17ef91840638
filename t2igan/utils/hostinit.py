"""Host-side model initialization helper.

Initializing a large model on the accelerator compiles the whole random-init
graph — through the axon remote-compile tunnel that costs minutes and can
exceed the relay's upload limit.  ``host_init()`` yields a context in which
computations default to the host CPU (registering the cpu platform next to
the accelerator if needed); callers then ``device_put`` the resulting
parameters.  A no-op when no separate accelerator exists.
"""

from __future__ import annotations

import contextlib
import os


def _cpu_device():
    import jax

    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and "cpu" not in plats:
        try:
            jax.config.update("jax_platforms", plats + ",cpu")
        except Exception:
            pass
    try:
        return jax.devices("cpu")[0]
    except Exception:
        return None


@contextlib.contextmanager
def host_init():
    """Context manager: run enclosed jax computations on host CPU."""
    import jax

    cpu = _cpu_device()
    if cpu is None or jax.devices()[0].platform == "cpu":
        yield False
        return
    with jax.default_device(cpu):
        yield True


def put_default(tree):
    """device_put a pytree onto the default accelerator."""
    import jax

    dev = jax.devices()[0]
    return jax.tree.map(lambda x: jax.device_put(x, dev), tree)
