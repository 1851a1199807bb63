"""Generate the committed golden transcript fixture.

Runs a fully deterministic k=1 mix (test256 group, seeded randomness)
and freezes the resulting nizkp directory plus the full verifier
test-vector set (reference: `vmnv -t` names,
MixNetElGamalVerifyFiatShamirSession.java:162-1634) under
tests/golden/.  The regression test (tests/test_golden.py) re-derives
both and compares byte-for-byte, pinning every derivation (byte trees,
globalPrefix, RO seeds, batching vectors) against drift.

Usage: python -m tools.make_golden  (run on CPU; deterministic)
"""

import json
import os
import shutil
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

GOLDEN = Path(__file__).resolve().parent.parent / "tests" / "golden"

TV_NAMES = [
    "par.sid", "par.version", "par.k", "par.lambda", "par.n_e",
    "par.n_r", "par.n_v", "par.s_PRG", "par.s_Gq", "par.s_H",
    "par.omega", "der.rho", "bas.pk", "bas.C_omega", "bas.M_omega",
    "bas.R_omega", "bas.h", "bas.L_0", "bas.L_l", "bas.y_l", "u",
    "PoS.s", "PoS.v", "PoS.A", "PoS.F", "PoS.B", "PoS.Ap", "PoS.Bp",
    "PoS.Cp", "PoS.Dp", "PoS.Fp", "PoS.C", "PoS.D", "PoS.k_A",
    "PoS.k_B", "PoS.k_C", "PoS.k_D", "PoS.k_E", "PoS.k_F", "Dec.s",
    "Dec.v",
]


def generate(outdir: Path, group_name: str = "test256"):
    from vmn_tpu.crypto.randomsource import SeededSource
    from vmn_tpu.protocol import elgamal
    from vmn_tpu.protocol.com.board import LocalBoardHub
    from vmn_tpu.protocol.context import ProtocolParams
    from vmn_tpu.protocol.mixnet.party import MixNetParty
    from vmn_tpu.protocol.mixnet.verifier import FiatShamirVerifier

    if group_name.startswith("P-"):
        # Reference-anchored fixture over the reference's DEFAULT
        # benchmark group (reference: demo/mixnet/benchmarks/
        # bench_config:33-45 names P-256).
        from vmn_tpu.arith.ec import ECqPGroup

        group = ECqPGroup.named(group_name)
        n = 3
    else:
        from vmn_tpu.arith.pgroup import ModPGroup

        group = ModPGroup.named(group_name)
        n = 5
    params = ProtocolParams(sid="Golden", k=1, threshold=1, pgroup=group)

    hub = LocalBoardHub(1)
    party = MixNetParty(
        params, hub.board(1), SeededSource(b"golden-party"), str(outdir)
    )
    pk = party.keygen()

    msgs = [group.encode_message(f"{i:08d}".encode()) for i in range(n)]
    if hasattr(group, "from_affine"):
        m = group.from_affine(msgs)
    else:
        m = group.from_ints(msgs)
    r = group.ring.random((n,), SeededSource(b"golden-ciphs"), 0)
    ciphs = elgamal.encrypt(pk, m, r)

    session = party.session("golden", 1)
    out = session.mix(ciphs)
    got = out.to_affine() if hasattr(out, "to_affine") else out.to_ints()
    assert sorted(got) == sorted(msgs)

    nizkp = outdir / "nizkp.golden"
    v = FiatShamirVerifier(params, nizkp, test_vectors=TV_NAMES)
    res = v.verify(expected_type="mixing")
    assert res.ok
    return nizkp, v.tv


FIXTURES = {
    "test256": ("nizkp_test256_k1", "test_vectors.json"),
    "P-256": ("nizkp_p256_k1", "test_vectors_p256.json"),
}


def main():
    import tempfile

    for group_name, (dirname, tvname) in FIXTURES.items():
        with tempfile.TemporaryDirectory() as tmp:
            nizkp, tv = generate(Path(tmp), group_name)
            dest = GOLDEN / dirname
            if dest.exists():
                shutil.rmtree(dest)
            dest.parent.mkdir(parents=True, exist_ok=True)
            shutil.copytree(nizkp, dest)
            (GOLDEN / tvname).write_text(
                json.dumps(tv, indent=1, sort_keys=True) + "\n"
            )
        print(f"wrote {dest} and {tvname} ({len(tv)} vectors)")


if __name__ == "__main__":
    sys.exit(main())
