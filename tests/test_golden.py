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


def test_full_test_vector_name_set():
    """Every reference test-vector name is emitted (reference:
    checkPrintTestVector sites, ...FiatShamirSession.java)."""
    tv = json.loads((GOLDEN / "test_vectors.json").read_text())
    missing = [n for n in TV_NAMES if n not in tv]
    assert not missing, f"missing test vectors: {missing}"


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
