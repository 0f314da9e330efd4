"""HomomorphicEncryption.org standard security tables.

Maximum total coefficient-modulus bit counts per ring dimension and security
level, for ternary-secret distributions (the only secret distribution the
reference supports).  Equivalent of include/host/hestdparms.h:14-153.
These are the published HE-standard constants.
"""

from __future__ import annotations

# n -> max log2(Q) for classical security, ternary secrets.
_TABLE_128 = {1024: 27, 2048: 54, 4096: 109, 8192: 218, 16384: 438, 32768: 881}
_TABLE_192 = {1024: 19, 2048: 37, 4096: 75, 8192: 152, 16384: 305, 32768: 611}
_TABLE_256 = {1024: 14, 2048: 29, 4096: 58, 8192: 118, 16384: 237, 32768: 476}

_TABLES = {0: None, 128: _TABLE_128, 192: _TABLE_192, 256: _TABLE_256}

HE_STD_PARMS_ERROR_STD_DEV = 3.2  # reference: hestdparms.h noise sigma


def max_coeff_modulus_bits(poly_modulus_degree: int, sec_level: int = 128) -> int:
    """Largest allowed log2(prod q_i) for the given N and security level.

    sec_level = 0 disables enforcement (returns a huge bound), matching the
    reference's sec_level_type::none behavior.
    """
    if sec_level == 0:
        return 1 << 20
    table = _TABLES.get(sec_level)
    if table is None:
        raise ValueError(f"unsupported security level {sec_level}")
    if poly_modulus_degree in table:
        return table[poly_modulus_degree]
    if poly_modulus_degree > 32768:
        # Extrapolate linearly in N like common practice for N=65536/131072.
        return table[32768] * (poly_modulus_degree // 32768)
    return 0
