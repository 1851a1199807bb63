"""Golden-transcript regression: byte-exact proof compatibility.

The committed fixture (tests/golden/) is a complete deterministic k=1
mixing transcript plus the full `vmnv -t` test-vector set (reference:
MixNetElGamalVerifyFiatShamirSession test vectors :162-1634, the
cross-implementation verifier-compatibility mechanism of SURVEY §4.4).
Any drift in byte trees, the globalPrefix recipe, RO seed derivations,
batching vectors or proof equations shows up as a byte diff here.

Regenerate intentionally with: python -m tools.make_golden
"""

import json
from pathlib import Path

import pytest

from tools.make_golden import TV_NAMES, generate

GOLDEN = Path(__file__).parent / "golden"


def test_golden_transcript_verifies():
    from vmn_tpu.arith.pgroup import ModPGroup
    from vmn_tpu.protocol.context import ProtocolParams
    from vmn_tpu.protocol.mixnet.verifier import FiatShamirVerifier

    params = ProtocolParams(
        sid="Golden", k=1, threshold=1,
        pgroup=ModPGroup.named("test256"),
    )
    res = FiatShamirVerifier(
        params, GOLDEN / "nizkp_test256_k1"
    ).verify(expected_type="mixing")
    assert res.ok


def test_golden_regeneration_is_byte_identical(tmp_path):
    """The deterministic mix reproduces the committed transcript
    byte-for-byte, and the verifier emits the committed test vectors."""
    nizkp, tv = generate(tmp_path)

    golden_files = sorted(
        p.relative_to(GOLDEN / "nizkp_test256_k1")
        for p in (GOLDEN / "nizkp_test256_k1").rglob("*")
        if p.is_file()
    )
    new_files = sorted(
        p.relative_to(nizkp) for p in nizkp.rglob("*") if p.is_file()
    )
    assert golden_files == new_files
    for rel in golden_files:
        want = (GOLDEN / "nizkp_test256_k1" / rel).read_bytes()
        got = (nizkp / rel).read_bytes()
        assert got == want, f"transcript drift in {rel}"

    want_tv = json.loads((GOLDEN / "test_vectors.json").read_text())
    assert tv == want_tv


# precomputation-mode vector names only appear in precomp transcripts
PRECOMP_ONLY = {"par.N_0", "PoSC.s", "PoSC.v", "CCPoS.s", "CCPoS.v"}
# ...and conversely the plain-PoS names never appear in precomp ones
POS_ONLY = {n for n in TV_NAMES if n.startswith("PoS.")}


def test_full_test_vector_name_set():
    """Every reference test-vector name is emitted across the plain and
    precomputation fixtures (reference: checkPrintTestVector sites,
    ...FiatShamirSession.java)."""
    tv = json.loads((GOLDEN / "test_vectors.json").read_text())
    missing = [n for n in TV_NAMES
               if n not in tv and n not in PRECOMP_ONLY]
    assert not missing, f"missing test vectors: {missing}"
    tvp = json.loads((GOLDEN / "test_vectors_precomp.json").read_text())
    missing = [n for n in TV_NAMES
               if n not in tvp and n not in POS_ONLY]
    assert not missing, f"missing precomp test vectors: {missing}"


def test_golden_precomp_regeneration_is_byte_identical(tmp_path):
    """Precomputation-mode fixture (PoSC + CCPoS chains, reference:
    MixNetElGamalVerifyFiatShamirSession.verifyPoSC:652 /
    verifyCCPoS:757) reproduces byte-for-byte and verifies."""
    from vmn_tpu.arith.pgroup import ModPGroup
    from vmn_tpu.protocol.context import ProtocolParams
    from vmn_tpu.protocol.mixnet.verifier import FiatShamirVerifier

    nizkp, tv = generate(tmp_path, "test256", maxciph=8)
    base = GOLDEN / "nizkp_test256_k1_precomp"
    golden_files = sorted(
        p.relative_to(base) for p in base.rglob("*") if p.is_file()
    )
    new_files = sorted(
        p.relative_to(nizkp) for p in nizkp.rglob("*") if p.is_file()
    )
    assert golden_files == new_files
    for rel in golden_files:
        assert (nizkp / rel).read_bytes() == (base / rel).read_bytes(), (
            f"transcript drift in {rel}"
        )
    want_tv = json.loads(
        (GOLDEN / "test_vectors_precomp.json").read_text()
    )
    assert tv == want_tv
    params = ProtocolParams(
        sid="Golden", k=1, threshold=1,
        pgroup=ModPGroup.named("test256"),
    )
    assert FiatShamirVerifier(params, base).verify(
        expected_type="mixing"
    ).ok


def test_golden_k3_width2_regeneration_is_byte_identical(tmp_path):
    """k=3/t=2 width-2 fixture reproduces byte-for-byte and verifies."""
    from vmn_tpu.arith.pgroup import ModPGroup
    from vmn_tpu.protocol.context import ProtocolParams
    from vmn_tpu.protocol.mixnet.verifier import FiatShamirVerifier

    nizkp, tv = generate(tmp_path, "test256", k=3, threshold=2, width=2)
    base = GOLDEN / "nizkp_test256_k3_w2"
    golden_files = sorted(
        p.relative_to(base) for p in base.rglob("*") if p.is_file()
    )
    new_files = sorted(
        p.relative_to(nizkp) for p in nizkp.rglob("*") if p.is_file()
    )
    assert golden_files == new_files
    for rel in golden_files:
        assert (nizkp / rel).read_bytes() == (base / rel).read_bytes(), (
            f"transcript drift in {rel}"
        )
    want_tv = json.loads((GOLDEN / "test_vectors_k3w2.json").read_text())
    assert tv == want_tv
    params = ProtocolParams(
        sid="Golden", k=3, threshold=2,
        pgroup=ModPGroup.named("test256"),
    )
    res = FiatShamirVerifier(params, base).verify(expected_type="mixing")
    assert res.ok and res.width == 2


def test_golden_p256_regeneration_is_byte_identical(tmp_path):
    """Reference-anchored fixture: a deterministic k=1 mix over the
    reference's default benchmark group P-256 (reference:
    demo/mixnet/benchmarks/bench_config:33-45) reproduces the committed
    transcript byte-for-byte, test vectors included."""
    nizkp, tv = generate(tmp_path, "P-256")

    base = GOLDEN / "nizkp_p256_k1"
    golden_files = sorted(
        p.relative_to(base) for p in base.rglob("*") if p.is_file()
    )
    new_files = sorted(
        p.relative_to(nizkp) for p in nizkp.rglob("*") if p.is_file()
    )
    assert golden_files == new_files
    for rel in golden_files:
        want = (base / rel).read_bytes()
        got = (nizkp / rel).read_bytes()
        assert got == want, f"transcript drift in {rel}"

    want_tv = json.loads((GOLDEN / "test_vectors_p256.json").read_text())
    assert tv == want_tv


def test_worked_derivation_independent_recompute(tmp_path, monkeypatch):
    """tools/worked_derivation.py recomputes the golden PoS chain
    (rho, generators, seed, batching vector, challenge, all five
    verification equations) with hashlib + pure-Python pow only, and
    asserts every equality against the committed test vectors."""
    import tools.worked_derivation as wd

    monkeypatch.setattr(wd, "OUT", tmp_path / "WORKED_POS.md")
    wd.main()
    assert (tmp_path / "WORKED_POS.md").read_text().count("✓") >= 10


def test_worked_ccpos_independent_recompute(tmp_path, monkeypatch):
    """tools/worked_ccpos.py recomputes the precomp fixture's PoSC +
    KeepList + CCPoS chains (rho, generators, seeds, batching vectors,
    challenges, all six verification equations) with hashlib +
    pure-Python pow only, asserting every equality."""
    import tools.worked_ccpos as wc

    monkeypatch.setattr(wc, "OUT", tmp_path / "WORKED_CCPOS.md")
    wc.main()
    assert (tmp_path / "WORKED_CCPOS.md").read_text().count("✓") >= 10
