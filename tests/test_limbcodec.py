"""Native bulk limb<->byte codec vs the numpy reference path.

The native single-pass converters (vmn_tpu/native/bytetree.cpp
limbs_to_be / be_to_limbs) take over above _NATIVE_MIN_ROWS; these
tests pin bit-exact agreement with the numpy strided route on every
width class the groups use (even/odd byte lengths, narrow rings, EC
coordinate widths) plus the overflow error contract.

Reference equivalent of the codec surface: LargeInteger.toByteArray
fixed-size encodings (SURVEY.md §2.4 eio layer).
"""

import numpy as np
import pytest

from vmn_tpu.arith import limbs as lb
from vmn_tpu.native.build import be_to_limbs, get_lib, limbs_to_be


def _numpy_l2b(arr, nbytes):
    """The numpy route, forced (copy of the sub-threshold path)."""
    arr = np.asarray(arr)
    L = arr.shape[-1]
    be = np.ascontiguousarray(arr[..., ::-1]).astype(">u2")
    raw = be.view(np.uint8).reshape(*arr.shape[:-1], 2 * L)
    if nbytes >= 2 * L:
        pad = np.zeros((*arr.shape[:-1], nbytes - 2 * L), np.uint8)
        return np.concatenate([pad, raw], axis=-1)
    head = raw[..., : 2 * L - nbytes]
    if head.any():
        raise ValueError("does not fit")
    return np.ascontiguousarray(raw[..., 2 * L - nbytes:])


@pytest.mark.parametrize(
    "n,L,nbytes",
    [
        (2048, 128, 257),  # modp2048 transcript width (odd: sign byte)
        (2048, 128, 256),  # exact 2L
        (1500, 16, 33),    # P-256 coordinate-ish, odd
        (1200, 13, 27),    # straddling top limb
        (1024, 13, 25),    # trimming below 2L, odd
        (2000, 8, 40),     # wide zero-padded
        (1030, 1, 2),      # single limb
    ],
)
def test_native_matches_numpy(n, L, nbytes):
    if get_lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(n * 31 + L)
    a = rng.integers(0, 1 << 16, size=(n, L), dtype=np.uint16)
    if nbytes < 2 * L:
        fit = nbytes // 2
        a[:, fit:] = 0
        if nbytes % 2:
            a[:, fit] = rng.integers(0, 256, size=n, dtype=np.uint16)
    want = _numpy_l2b(a, nbytes)
    got = limbs_to_be(a, nbytes)
    assert got.shape == want.shape and (got == want).all()
    # and through the public dispatcher (>= _NATIVE_MIN_ROWS rows)
    assert (lb.limbs_to_bytes_be(a, nbytes) == want).all()
    back = be_to_limbs(want, L)
    assert (back == a).all()
    assert (lb.bytes_be_to_limbs(want, L) == a).all()


def test_overflow_contract():
    if get_lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(7)
    a = rng.integers(0, 1 << 16, size=(2048, 4), dtype=np.uint16)
    a[:, 3] = 0
    a[5, 3] = 1  # one row does not fit 6 bytes
    with pytest.raises(ValueError):
        lb.limbs_to_bytes_be(a, 6)
    d = np.zeros((2048, 10), np.uint8)
    d[7, 0] = 1  # leading byte nonzero, L=4 limbs = 8 bytes
    with pytest.raises(ValueError):
        lb.bytes_be_to_limbs(d, 4)


def test_odd_top_byte_overflow():
    if get_lib() is None:
        pytest.skip("no native toolchain")
    a = np.zeros((1100, 4), np.uint16)
    a[3, 3] = 0x1FF  # needs 2 bytes but only 1 remains at nbytes=7
    with pytest.raises(ValueError):
        lb.limbs_to_bytes_be(a, 7)
