"""Runtime sanitizer: functional range-invariant checks (checkify).

The TPU-native analogue of the reference's device-side sanitizers
(compute-sanitizer/racecheck on CUDA have no TPU counterpart; in the
XLA model the failure class that actually occurs is a *value* leaving
its proven range — a residue escaping [0, q) or a lazy value escaping
[0, 2q) after a missed csub).  This module plants `checkify` assertions
at the u32 pipeline seams:

    from phantom_tpu.utils import debug
    debug.enable()
    out = debug.checked_call(pp.mult_relin_rescale32, pipe, d1, d2)

`enable()` is consulted at *trace* time, so the default (disabled) mode
adds literally zero ops to compiled graphs.  `checked_call` runs the
function under `checkify.checkify` and throws on the first violated
invariant with its location label.  Re-jit after toggling (cached
executables keep whatever mode they were traced in).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

_ENABLED = False


def enable(flag: bool = True) -> None:
    """Turn trace-time range checks on/off (module-global)."""
    global _ENABLED
    _ENABLED = flag


def enabled() -> bool:
    return _ENABLED


def check_range(x: jnp.ndarray, bound, label: str) -> None:
    """Assert max(x) < bound when sanitizing is enabled (no-op otherwise).

    `bound` broadcasts against x (e.g. a (L, 1) modulus column)."""
    if not _ENABLED:
        return
    from jax.experimental import checkify
    checkify.check(jnp.all(x < bound), f"phantom sanitizer: {label}: "
                   "value out of range")


def checked_call(fn, *args, **kwargs):
    """Run fn under checkify and throw the first violated invariant.

    jit-compatible: wrap the checkified callable, not the jitted one."""
    from jax.experimental import checkify
    err, out = checkify.checkify(fn)(*args, **kwargs)
    err.throw()
    return out


def checked(fn):
    """Decorator form of checked_call."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        return checked_call(fn, *args, **kwargs)
    return wrapper
