"""Out-of-core array backend (arrays=file) tests.

Reference: file-mapped LargeIntegerArray toggled by the `arrays`
private-info field (ProtocolElGamal.java:332-345); ours spills to
np.memmap and streams slices to the device.
"""

import numpy as np
import pytest

from vmn_tpu.arith import storage
from vmn_tpu.crypto.randomsource import SeededSource


@pytest.fixture(autouse=True)
def _restore_backend():
    yield
    storage.set_backend("ram")


def test_spill_roundtrip(tmp_path):
    storage.set_backend("file", tmp_path)
    old_min = storage.MIN_SPILL_BYTES
    storage.MIN_SPILL_BYTES = 0
    try:
        a = np.arange(64, dtype=np.uint32).reshape(8, 8)
        mm = storage.maybe_spill(a)
        assert isinstance(mm, np.memmap)
        assert np.array_equal(np.asarray(mm), a)
        assert list(tmp_path.glob("spill*.npy"))
    finally:
        storage.MIN_SPILL_BYTES = old_min


def test_small_arrays_stay_in_ram(tmp_path):
    storage.set_backend("file", tmp_path)
    a = np.zeros(4, dtype=np.uint32)
    assert not isinstance(storage.maybe_spill(a), np.memmap)


def test_ram_mode_is_identity():
    storage.set_backend("ram")
    a = np.zeros((1024, 1024), dtype=np.uint32)
    assert storage.maybe_spill(a) is a


def test_group_ops_on_spilled_arrays(tmp_path, small_group):
    """exp/mul/permute work identically on memmap-backed arrays."""
    storage.set_backend("file", tmp_path)
    old_min = storage.MIN_SPILL_BYTES
    storage.MIN_SPILL_BYTES = 0
    try:
        grp = small_group
        rs = SeededSource(b"storage-test")
        e = grp.ring.random((8,), rs, 64)
        a = grp.g.exp(e)
        sp = a.spill()
        assert isinstance(sp.limbs, np.memmap) or isinstance(
            np.asarray(sp.limbs), np.ndarray
        )
        e2 = grp.ring.random((8,), rs, 64)
        assert a.exp(e2).equals(sp.exp(e2))
        assert a.mul(a).equals(sp.mul(sp))
    finally:
        storage.MIN_SPILL_BYTES = old_min
