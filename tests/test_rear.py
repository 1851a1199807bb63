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
