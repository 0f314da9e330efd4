"""Binary serialization for plaintexts, ciphertexts, and keys.

Equivalent of the reference's stream save/load (include/ciphertext.h:173-307,
plaintext.h:69-98, secretkey.h:85-389): little-endian header fields followed
by the raw uint64 payload, plus *seed-compressed* symmetric ciphertexts that
store c0 and the PRNG key and regenerate c1 = uniform(seed) on load
(reference: save_symmetric/load_symmetric, ciphertext.h:216-307 — there the
seed is a Salsa20 seed; here it is the jax threefry key, documented PRNG
swap, ops/sampling.py).
"""

from __future__ import annotations

import io
import struct
from typing import BinaryIO, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..schemes.ciphertext import Ciphertext, Plaintext

_MAGIC_CT = b"PTCT"
_MAGIC_PT = b"PTPT"
_MAGIC_KEY = b"PTKY"
_MAGIC_CTS = b"PTCS"  # seed-compressed symmetric ciphertext
_VERSION = 1


def _w(f: BinaryIO, fmt: str, *vals):
    f.write(struct.pack("<" + fmt, *vals))


def _r(f: BinaryIO, fmt: str):
    size = struct.calcsize("<" + fmt)
    return struct.unpack("<" + fmt, f.read(size))


def _write_array(f: BinaryIO, arr: jnp.ndarray):
    a = np.asarray(arr)
    _w(f, "B", a.ndim)
    for d in a.shape:
        _w(f, "q", d)
    f.write(a.astype("<u8").tobytes())


def _read_array(f: BinaryIO) -> np.ndarray:
    (ndim,) = _r(f, "B")
    shape = tuple(_r(f, "q")[0] for _ in range(ndim))
    count = int(np.prod(shape)) if shape else 1
    a = np.frombuffer(f.read(count * 8), dtype="<u8").reshape(shape)
    return a.copy()


# -- ciphertext -------------------------------------------------------------

def save_ciphertext(ct: Ciphertext, f: BinaryIO):
    f.write(_MAGIC_CT)
    _w(f, "B", _VERSION)
    _w(f, "qBdqq", ct.chain_index, int(ct.is_ntt_form), ct.scale,
       ct.correction_factor, ct.noise_scale_deg)
    _write_array(f, ct.data)


def load_ciphertext(f: BinaryIO) -> Ciphertext:
    assert f.read(4) == _MAGIC_CT, "bad ciphertext magic"
    (_ver,) = _r(f, "B")
    chain_index, ntt_form, scale, corr, nsd = _r(f, "qBdqq")
    data = _read_array(f)
    return Ciphertext(data=jnp.asarray(data), chain_index=int(chain_index),
                      is_ntt_form=bool(ntt_form), scale=float(scale),
                      correction_factor=int(corr), noise_scale_deg=int(nsd))


# -- seed-compressed symmetric ciphertext -----------------------------------

def encrypt_symmetric_compressed(ctx, sk, plain: Plaintext, rng):
    """Symmetric encryption returning (ciphertext, c1_seed): c1 is fully
    determined by the seed, so only c0 + 8 bytes travel on the wire
    (reference: encrypt_zero_symmetric's seed path, secretkey.cu:232)."""
    from ..schemes import keys as K
    k_a, k_e = jax.random.split(rng)
    ct = K.encrypt_symmetric(ctx, sk, plain, rng)
    return ct, np.asarray(jax.random.key_data(k_a))


def save_ciphertext_symmetric(ct: Ciphertext, seed: np.ndarray, f: BinaryIO):
    """Store c0 + seed only (reference: save_symmetric,
    ciphertext.h:216-307)."""
    f.write(_MAGIC_CTS)
    _w(f, "B", _VERSION)
    _w(f, "qBdqq", ct.chain_index, int(ct.is_ntt_form), ct.scale,
       ct.correction_factor, ct.noise_scale_deg)
    s = np.asarray(seed, dtype=np.uint32)
    _w(f, "B", s.size)
    f.write(s.astype("<u4").tobytes())
    _write_array(f, ct.data[0])


def load_ciphertext_symmetric(f: BinaryIO, ctx) -> Ciphertext:
    """Regenerate c1 = NTT-form uniform(seed) over Ql on load."""
    from ..ops import ntt as nttmod
    from ..ops import sampling as smp
    assert f.read(4) == _MAGIC_CTS, "bad compressed-ct magic"
    (_ver,) = _r(f, "B")
    chain_index, ntt_form, scale, corr, nsd = _r(f, "qBdqq")
    (seed_len,) = _r(f, "B")
    seed = np.frombuffer(f.read(4 * seed_len), dtype="<u4")
    c0 = _read_array(f)
    cd = ctx.get_context_data(int(chain_index))
    k_a = jax.random.wrap_key_data(jnp.asarray(seed))
    a = smp.sample_uniform_rns(k_a, ctx.params.n, cd.mv)  # NTT form
    if not ntt_form:
        a = nttmod.ntt_inverse(a, ctx.tables_q(cd.size_ql))
    data = jnp.stack([jnp.asarray(c0), a])
    return Ciphertext(data=data, chain_index=int(chain_index),
                      is_ntt_form=bool(ntt_form), scale=float(scale),
                      correction_factor=int(corr), noise_scale_deg=int(nsd))


# -- plaintext --------------------------------------------------------------

def save_plaintext(pt: Plaintext, f: BinaryIO):
    f.write(_MAGIC_PT)
    _w(f, "B", _VERSION)
    _w(f, "qBd", pt.chain_index, int(pt.is_ntt_form), pt.scale)
    _write_array(f, pt.data)


def load_plaintext(f: BinaryIO) -> Plaintext:
    assert f.read(4) == _MAGIC_PT, "bad plaintext magic"
    (_ver,) = _r(f, "B")
    chain_index, ntt_form, scale = _r(f, "qBd")
    data = _read_array(f)
    return Plaintext(data=jnp.asarray(data), chain_index=int(chain_index),
                     is_ntt_form=bool(ntt_form), scale=float(scale))


# -- keys -------------------------------------------------------------------

def save_key(key_obj, f: BinaryIO):
    """Secret/public/relin/galois keys: tagged array payloads
    (reference: secretkey.h:85-389)."""
    from ..schemes.keys import GaloisKeys, PublicKey, RelinKey, SecretKey
    f.write(_MAGIC_KEY)
    _w(f, "B", _VERSION)
    kind = {SecretKey: 0, PublicKey: 1, RelinKey: 2, GaloisKeys: 3}[
        type(key_obj)]
    _w(f, "B", kind)
    if kind == 3:
        _w(f, "q", len(key_obj.elts))
        for e in key_obj.elts:
            _w(f, "q", e)
    _write_array(f, key_obj.data)


def load_key(f: BinaryIO):
    from ..schemes.keys import GaloisKeys, PublicKey, RelinKey, SecretKey
    assert f.read(4) == _MAGIC_KEY, "bad key magic"
    (_ver,) = _r(f, "B")
    (kind,) = _r(f, "B")
    if kind == 3:
        (num,) = _r(f, "q")
        elts = tuple(_r(f, "q")[0] for _ in range(num))
        return GaloisKeys(data=jnp.asarray(_read_array(f)), elts=elts)
    data = jnp.asarray(_read_array(f))
    return [SecretKey, PublicKey, RelinKey][kind](data=data)


# -- bytes convenience ------------------------------------------------------

def to_bytes(obj, *args) -> bytes:
    buf = io.BytesIO()
    if isinstance(obj, Ciphertext):
        save_ciphertext(obj, buf)
    elif isinstance(obj, Plaintext):
        save_plaintext(obj, buf)
    else:
        save_key(obj, buf)
    return buf.getvalue()


def from_bytes(data: bytes, ctx=None):
    buf = io.BytesIO(data)
    magic = data[:4]
    if magic == _MAGIC_CT:
        return load_ciphertext(buf)
    if magic == _MAGIC_CTS:
        return load_ciphertext_symmetric(buf, ctx)
    if magic == _MAGIC_PT:
        return load_plaintext(buf)
    return load_key(buf)
