"""Coefficient-sharded NTT (all-to-all at the phase boundary) matches the
local engine on the 8-device virtual mesh, and the lowered computation
contains a collective permute/all-to-all."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from phantom_tpu.host import numth
from phantom_tpu.host.modulus import Modulus
from phantom_tpu.host.ntt_tables import make_rns_ntt_tables
from phantom_tpu.ops import ntt as ntt64
from phantom_tpu.parallel import ntt_sharded as ns


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_sharded_ntt_matches():
    n = 1024
    qs = numth.get_primes(2 * n, 50, 2)
    t64 = ntt64.tables_from_host(
        make_rns_ntt_tables(n, [Modulus(q) for q in qs]))
    tp = ns.prepare_sharded_tables(t64)
    rng = np.random.default_rng(0)
    x = np.stack([rng.integers(0, q, n, dtype=np.uint64) for q in qs])

    ref = np.asarray(ntt64.ntt_forward(jnp.asarray(x), t64))

    mesh = Mesh(np.array(jax.devices()[:8]), ("limb",))
    fn = jax.jit(lambda v: ns.ntt_forward_sharded(v, tp, mesh),
                 in_shardings=NamedSharding(mesh, P()),
                 out_shardings=NamedSharding(mesh, P()))
    got = np.asarray(fn(jnp.asarray(x)))
    np.testing.assert_array_equal(got, ref)

    # the compiled module must contain an inter-device exchange
    hlo = fn.lower(jnp.asarray(x)).compile().as_text()
    assert ("all-to-all" in hlo or "collective-permute" in hlo
            or "all_to_all" in hlo), "no collective found in lowered module"


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_sharded_roundtrip():
    n = 512
    qs = numth.get_primes(2 * n, 45, 2)
    t64 = ntt64.tables_from_host(
        make_rns_ntt_tables(n, [Modulus(q) for q in qs]))
    tp = ns.prepare_sharded_tables(t64)
    rng = np.random.default_rng(1)
    x = np.stack([rng.integers(0, q, n, dtype=np.uint64) for q in qs])
    mesh = Mesh(np.array(jax.devices()[:8]), ("limb",))
    fn = jax.jit(lambda v: ns.ntt_inverse_sharded(
        ns.ntt_forward_sharded(v, tp, mesh), tp, mesh))
    got = np.asarray(fn(jnp.asarray(x)))
    np.testing.assert_array_equal(got, x)
