"""Subprocess probe for a wedged accelerator tunnel.

This image's remote-chip tunnel can wedge such that JAX device
enumeration HANGS in-process — it never raises.  The only reliable
detection is to enumerate devices in a SUBPROCESS under a hard timeout.
Shared by `bench.py` and `__graft_entry__.entry()` (the two surfaces the
grading driver runs directly) so their tunnel handling cannot diverge.
"""
import subprocess
import sys
import time

_PROBE_CODE = ("import jax, jax.numpy as jnp; jax.devices(); "
               "print(float(jnp.sum(jnp.ones((8, 8)))))")


def probe_default_backend(attempts=3, timeout_s=150, sleep_s=30):
    """Probe whether the default JAX backend answers.

    Returns ``(ok, reason)``: ``ok`` is True iff a subprocess enumerated
    devices and ran a tiny program within ``timeout_s``.  On failure,
    ``reason`` distinguishes the wedge from a live-but-erroring backend:
    ``"timeout"`` for a hang (the tunnel-wedge signature), otherwise the
    tail of the last child's stderr (e.g. a device-busy error), so
    callers can log something actionable before falling back.
    """
    reason = "ok"
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", _PROBE_CODE],
                               capture_output=True, timeout=timeout_s)
            if r.returncode == 0:
                return True, "ok"
            reason = (r.stderr or b"").decode("utf-8", "replace")[-400:]
        except subprocess.TimeoutExpired:
            reason = "timeout"
        if i + 1 < attempts:
            time.sleep(sleep_s)
    return False, reason
