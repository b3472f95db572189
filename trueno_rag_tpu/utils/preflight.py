"""Wedged-TPU preflight: probe the tunneled device in a KILLABLE child.

A dead session holding the single-chip grant makes the first in-process
``jax.devices()`` block forever inside the claim loop — a hang, not an
exception — so anything that must always produce output (bench.py's one
JSON line, the driver's multichip dry-run) probes in a subprocess with a
hard timeout first and reconfigures to CPU on failure.

The probe is needed exactly when the axon backend would register: the
sitecustomize keys on ``PALLAS_AXON_POOL_IPS`` and then FORCES
``jax_platforms="axon,cpu"`` regardless of ``JAX_PLATFORMS`` (CLAUDE.md)
— so the env var that actually controls whether ``jax.devices()`` can
hang is the pool address, not ``JAX_PLATFORMS``.
"""

from __future__ import annotations

import os
import subprocess
import sys


def tpu_preflight(timeout_s: float = 180.0) -> bool:
    """True when touching jax in THIS process is safe on the configured
    backend: either no axon pool is configured (nothing can hang), or a
    killable child proved the device answers. Generous timeout: a
    healthy first contact over the tunnel is ~20-40 s."""
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True  # no axon registration → jax.devices() cannot hang
    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices(); print('ok')"],
            timeout=timeout_s, capture_output=True, text=True,
        )
        return proc.returncode == 0 and "ok" in proc.stdout
    except (subprocess.TimeoutExpired, OSError):
        return False


def force_cpu() -> None:
    """Clear any initialized backends and pin jax to CPU — the recovery
    step after a failed preflight (must run BEFORE other jax use)."""
    import jax
    from jax.extend.backend import clear_backends

    clear_backends()
    jax.config.update("jax_platforms", "cpu")
