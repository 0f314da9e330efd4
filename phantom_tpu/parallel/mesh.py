"""Device-mesh construction and sharded execution of evaluator pipelines.

The unit of data parallelism is a *batch* of ciphertexts (leading axis);
the unit of model-style parallelism is the RNS limb axis: every elementwise
RNS op and the whole NTT engine are independent per limb, so a
limb-sharded ciphertext runs those stages with zero communication, while
base conversion / keyswitch inner products induce all-gathers/psums that
GSPMD derives from the annotations.

Layout convention: ciphertext batch tensors are (B, size, L, N) with
  B -> mesh axis "dp", L -> mesh axis "limb", N unsharded (NTT stages are
  coefficient-local per limb; coefficient sharding + all-to-all stage
  exchange is the planned Pallas ring kernel, SURVEY.md §5.7).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              limb: Optional[int] = None) -> Mesh:
    """Build a ("dp", "limb") mesh over the first n_devices devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if dp is None or limb is None:
        # favor limb parallelism (keyswitch-heavy workloads), dp for the rest
        limb = limb or _largest_pow2_leq(n_devices, 4)
        dp = n_devices // limb
    assert dp * limb == n_devices, (dp, limb, n_devices)
    arr = np.array(devs).reshape(dp, limb)
    return Mesh(arr, ("dp", "limb"))


def make_coeff_mesh(n_devices: Optional[int] = None,
                    dp: int = 1) -> Mesh:
    """Build a ("dp", "coeff") mesh: batch x sharded-coefficient axis.

    The coefficient-sharded pipeline (pipeline_sharded.py) keeps every
    stage local over "coeff" except the NTT phase-boundary all-to-alls."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    coeff = n_devices // dp
    assert dp * coeff == n_devices, (dp, coeff, n_devices)
    arr = np.array(devs[:n_devices]).reshape(dp, coeff)
    return Mesh(arr, ("dp", "coeff"))


def _largest_pow2_leq(n: int, cap: int) -> int:
    p = 1
    while p * 2 <= min(n, cap):
        p *= 2
    return p


def ct_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a ciphertext batch (B, size, L, N)."""
    return NamedSharding(mesh, P("dp", None, "limb", None))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_ciphertext_data(data: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    return jax.device_put(data, ct_sharding(mesh))


def sharded_mul_relin_rescale_step(ctx, ct_proto1, ct_proto2, rlk, mesh: Mesh):
    """Build a jitted, mesh-sharded batched multiply+relin+rescale step.

    Returns step(d1, d2) over (B, 2, L, N) batches; inputs/outputs carry
    ("dp", None, "limb", None) shardings.  This is the flagship multi-chip
    pipeline: NTTs and dyadic products stay limb-local, the keyswitch
    inner product and base conversions resolve to ICI collectives.
    """
    from ..schemes import evaluate

    def one(c, r, d1, d2):
        a = ct_proto1.replace(data=d1)
        b = ct_proto2.replace(data=d2)
        out = evaluate.rescale_to_next(
            c, evaluate.multiply_and_relin(c, a, b, r))
        return out.data

    batched = jax.vmap(one, in_axes=(None, None, 0, 0))
    sh = ct_sharding(mesh)
    # Audited: rescale drops one limb, so the output limb count (k-1) does
    # not divide the mesh axis and jit out_shardings require divisibility —
    # the step therefore ends with a bounded limb gather of the (k-1, N)
    # result per batch element.  This is an inherent cost of the limb
    # layout; the coefficient-sharded pipeline (pipeline_sharded.py /
    # sharded32.py) avoids it entirely and is the preferred multichip path.
    out_sh = NamedSharding(mesh, P("dp"))
    rep = replicate(mesh)
    jitted = jax.jit(batched, in_shardings=(rep, rep, sh, sh),
                     out_shardings=out_sh)
    return lambda d1, d2: jitted(ctx, rlk, d1, d2)
