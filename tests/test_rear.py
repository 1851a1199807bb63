"""Re-arrangement algebra tests for `vre` (reference:
elgamal/TestProtocolElGamalRear.java — split/concatenate/project across
widths must compose back to the identity) plus `vog` object generation.

These operate on raw byte trees, so they need no group arithmetic and
run fast.
"""

from vmn_tpu.cli import vog, vre
from vmn_tpu.eio.bytetree import ByteTree, leaf, node


def _ciphs(n, width):
    """A synthetic width-w ciphertext array byte tree ((u..),(v..))."""

    def arr(tag):
        comps = [
            node(*[leaf(bytes([tag, c, i])) for i in range(n)])
            for c in range(width)
        ]
        return node(*comps) if width > 1 else comps[0]

    return node(arr(1), arr(2))


def test_widths_split_then_cat_roundtrip(tmp_path):
    src = tmp_path / "in.bt"
    _ciphs(5, 3).write_file(src)

    parts = [tmp_path / f"p{i}.bt" for i in range(3)]
    assert vre.main(["-ciphs", "-widths", "1,1,1", str(src)]
                    + [str(p) for p in parts]) == 0
    out = tmp_path / "joined.bt"
    assert vre.main(["-ciphs", "-deep"] + [str(p) for p in parts]
                    + [str(out)]) == 0
    assert ByteTree.read_file(out).to_bytes() == _ciphs(5, 3).to_bytes()


def test_shallow_equals_widths_ones(tmp_path):
    src = tmp_path / "in.bt"
    _ciphs(4, 2).write_file(src)
    a = [tmp_path / "a0.bt", tmp_path / "a1.bt"]
    b = [tmp_path / "b0.bt", tmp_path / "b1.bt"]
    assert vre.main(["-ciphs", "-shallow", str(src)]
                    + [str(p) for p in a]) == 0
    assert vre.main(["-ciphs", "-widths", "1,1", str(src)]
                    + [str(p) for p in b]) == 0
    for x, y in zip(a, b):
        assert ByteTree.read_file(x).to_bytes() == \
            ByteTree.read_file(y).to_bytes()


def test_sub_then_cat_roundtrip(tmp_path):
    src = tmp_path / "in.bt"
    _ciphs(6, 1).write_file(src)
    lo, hi = tmp_path / "lo.bt", tmp_path / "hi.bt"
    assert vre.main(["-ciphs", "-sub", "0", "3", str(src), str(lo)]) == 0
    assert vre.main(["-ciphs", "-sub", "3", "6", str(src), str(hi)]) == 0
    out = tmp_path / "cat.bt"
    assert vre.main(["-ciphs", "-cat", str(lo), str(hi), str(out)]) == 0
    assert ByteTree.read_file(out).to_bytes() == _ciphs(6, 1).to_bytes()


def test_project_component(tmp_path):
    src = tmp_path / "in.bt"
    _ciphs(3, 2).write_file(src)
    out = tmp_path / "proj.bt"
    assert vre.main(["-ciphs", "-project", "1", str(src), str(out)]) == 0
    got = ByteTree.read_file(out)
    want = _ciphs(3, 2)
    assert got.to_bytes() == node(
        want[0].children[1], want[1].children[1]
    ).to_bytes()


def test_vog_roundtrips(capsys):
    """vog output must unmarshal back to an equivalent object."""
    from vmn_tpu.eio.marshal import unmarshal_hex

    assert vog.main(["-gen", "PRGHeuristic"]) == 0
    line = capsys.readouterr().out.strip()
    prg = unmarshal_hex(line)
    assert prg.min_seed_bytes == 32

    assert vog.main(["-gen", "HashfunctionHeuristic", "SHA-512"]) == 0
    line = capsys.readouterr().out.strip()
    hf = unmarshal_hex(line)
    assert hf.hash(b"x") == __import__("hashlib").sha512(b"x").digest()

    assert vog.main(["-gen", "RandomDevice"]) == 0
    line = capsys.readouterr().out.strip()
    rd = unmarshal_hex(line)
    assert len(rd.read_bytes(8)) == 8

    assert vog.main(["-list"]) == 0
    names = capsys.readouterr().out.split()
    assert "ModPGroup" in names and "ECqPGroup" in names


def test_format_language_select_and_product(tmp_path):
    """The (i,j) position mini-language (reference: RearParser,
    ProtocolElGamalRearTool.java:608-694): select components across
    sources, concatenate with 'x', multiple outputs with ':'."""
    a = tmp_path / "a.bt"
    b = tmp_path / "b.bt"
    _ciphs(4, 3).write_file(a)
    _ciphs(4, 2).write_file(b)

    out1 = tmp_path / "o1.bt"
    out2 = tmp_path / "o2.bt"
    assert vre.main([
        "-ciphs", "-format", "(0,1)x(1,0):(0,0-2)",
        str(a), str(b), str(out1), str(out2),
    ]) == 0

    from vmn_tpu.protocol.rear import apply_format, components_of

    t1 = ByteTree.read_file(out1)
    comps = components_of(t1, True)
    assert len(comps) == 2  # (0,1) and (1,0)
    want_a = components_of(_ciphs(4, 3), True)
    want_b = components_of(_ciphs(4, 2), True)
    assert comps[0].to_bytes() == want_a[1].to_bytes()
    assert comps[1].to_bytes() == want_b[0].to_bytes()

    t2 = ByteTree.read_file(out2)
    comps2 = components_of(t2, True)
    assert [c.to_bytes() for c in comps2] == [
        want_a[0].to_bytes(), want_a[1].to_bytes()
    ]


def test_interval_language(tmp_path):
    src = tmp_path / "in.bt"
    _ciphs(6, 1).write_file(src)
    o1 = tmp_path / "i1.bt"
    o2 = tmp_path / "i2.bt"
    assert vre.main([
        "-ciphs", "-inter", "0-2:2-6", str(src), str(o1), str(o2)
    ]) == 0
    cat = tmp_path / "cat.bt"
    assert vre.main(["-ciphs", "-cat", str(o1), str(o2), str(cat)]) == 0
    assert ByteTree.read_file(cat).to_bytes() == _ciphs(6, 1).to_bytes()


class DummyPluginInterface:
    """Plug-in interface fixture for reflective loading."""

    def write_ciphertexts(self, ciphs, path):
        raise NotImplementedError

    def read_ciphertexts(self, group, path):
        raise NotImplementedError


def test_plugin_interface_loading():
    """Unknown interface names load user classes by dotted path
    (reference: ProtocolElGamalInterfaceFactory.java:90-110)."""
    import pytest

    from vmn_tpu.protocol.interfaces import InterfaceError, get_interface

    obj = get_interface("tests.test_rear.DummyPluginInterface")
    # importlib may load the module under a distinct name from pytest's
    # own import; compare by class identity attributes.
    assert type(obj).__name__ == "DummyPluginInterface"
    assert hasattr(obj, "read_ciphertexts")
    with pytest.raises(InterfaceError):
        get_interface("no.such.module.Klass")
    with pytest.raises(InterfaceError):
        get_interface("bogusname")


def test_primality_and_fresh_group():
    """Miller-Rabin + safe-prime generation (gmpmee equivalence,
    SURVEY §2.3) and vog -bitlen fresh-group output."""
    from vmn_tpu.crypto.primes import (
        is_safe_prime,
        miller_rabin,
        random_group,
        random_safe_prime,
    )
    from vmn_tpu.crypto.randomsource import SeededSource

    rs = SeededSource(b"primes")
    assert miller_rabin(2**127 - 1, rs)  # Mersenne prime
    assert not miller_rabin(2**128 - 1, rs)
    assert not miller_rabin(3825123056546413051, rs)  # strong pseudoprime
    assert is_safe_prime(23, rs)
    assert not is_safe_prime(29, rs)

    p = random_safe_prime(96, rs)
    assert p.bit_length() == 96
    assert is_safe_prime(p, rs)

    grp = random_group(96, rs)
    assert grp.p.bit_length() == 96
    assert pow(grp.g_int, grp.q, grp.p) == 1
