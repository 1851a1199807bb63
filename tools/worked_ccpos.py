"""Produce docs/WORKED_CCPOS.md: a fully worked PRECOMPUTATION-MODE
verification (PoSC + KeepList shrink + CCPoS) of the committed golden
precomp transcript, recomputed INDEPENDENTLY of the device stack — all
hashing with `hashlib`, all group arithmetic with Python `pow`
(reference: PoSCBasicTW.java verification equations;
CCPoSBasicW.verify:520-585; MixNetElGamalVerifyFiatShamirSession
verifyPoSC:652 / verifyCCPoS:757).

The repo is imported ONLY to assemble byte-tree serializations for the
seed-data dumps; every hash and every group equation is computed from
scratch.

Usage: python -m tools.worked_ccpos   (writes docs/WORKED_CCPOS.md)
"""

import hashlib
import json
import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")

ROOT = Path(__file__).resolve().parent.parent
GOLDEN = ROOT / "tests" / "golden" / "nizkp_test256_k1_precomp"
OUT = ROOT / "docs" / "WORKED_CCPOS.md"

sys.path.insert(0, str(ROOT))

from tools.worked_derivation import (  # noqa: E402
    hexwrap,
    ints_of,
    parse_bt,
    prg_stream,
    ro,
)


def main():
    from vmn_tpu import VCR_COMPAT_VERSION
    from vmn_tpu.arith.pgroup import ModPGroup
    from vmn_tpu.eio.bytetree import ByteTree, int_leaf, leaf, node

    tv = json.loads(
        (GOLDEN.parent / "test_vectors_precomp.json").read_text()
    )
    group = ModPGroup.named("test256")
    p, q, g_int = group.p, group.q, group.g_int
    N = 5
    N0 = 8  # maxciph
    lines = []
    w = lines.append

    def check(name, got, want):
        assert got == want, f"{name}: {got!r} != {want!r}"
        w(f"matches test vector `{name}`. ✓\n")

    w("# Worked precomputation-mode verification (PoSC + CCPoS), "
      "independently recomputed\n")
    w("Every value below is recomputed from the committed transcript "
      "`tests/golden/nizkp_test256_k1_precomp` using ONLY `hashlib` "
      "and Python integer `pow` — no JAX, no device code — by "
      "`tools/worked_ccpos.py`, which asserts every equality before "
      "writing this file.  The transcript is an offline/online split "
      "mix: permutation commitments for N_0 = 8 ciphertexts were "
      "precomputed (PoSC), then N = 5 actual ciphertexts were shuffled "
      "under the SHRUNK commitment (KeepList) with a "
      "commitment-consistent proof of shuffle (CCPoS).\n")

    # ------------------------------------------------------------- rho
    w("## 1. Global prefix ρ\n")
    pre = node(
        leaf(VCR_COMPAT_VERSION.encode()),
        leaf(b"Golden.golden"),
        int_leaf(100),
        int_leaf(256),
        int_leaf(256),
        leaf(tv["par.s_PRG"].encode()),
        leaf(tv["par.s_Gq"].encode()),
        leaf(tv["par.s_H"].encode()),
    ).to_bytes()
    rho = hashlib.sha256(pre).digest()
    w(f"    rho = SHA-256(node(version, rosid, n_r, n_v, n_e, s_PRG, "
      f"s_Gq, s_H)) = {rho.hex()}\n")
    check("der.rho", rho.hex(), tv["der.rho"])
    assert tv["par.N_0"] == str(N0)

    # ------------------------------------------- generators (N_0 wide)
    w("## 2. Independent generators h (N_0 = 8 of them — precomp size)\n")
    gen_data = leaf(b"generators").to_bytes()
    hseed = ro(8 * 32, rho + gen_data)
    bits = p.bit_length() + 100
    nbytes = (bits + 7) // 8
    stream = prg_stream(hseed, N0 * nbytes)
    hs = []
    for i in range(N0):
        t = int.from_bytes(stream[i * nbytes : (i + 1) * nbytes], "big")
        extra = 8 * nbytes - bits
        if extra:
            t &= (1 << bits) - 1
        hs.append(pow(t % p, (p - 1) // q, p))
    hs_bt = group.elem_to_bytetree(group.from_ints(hs)).to_bytes().hex()
    check("bas.h", hs_bt, tv["bas.h"])

    # ------------------------------------------------------ transcript
    files = {}
    for name in ["FullPublicKey.bt", "Ciphertexts.bt",
                 "ShuffledCiphertexts.bt"]:
        files[name] = (GOLDEN / name).read_bytes()
    for name in ["PermutationCommitment01.bt", "PoSCCommitment01.bt",
                 "PoSCReply01.bt", "KeepList01.bt",
                 "CCPoSCommitment01.bt", "CCPoSReply01.bt"]:
        files[name] = (GOLDEN / "proofs" / name).read_bytes()
    ut, _ = parse_bt(files["PermutationCommitment01.bt"])
    u = ints_of(ut)
    assert len(u) == N0
    pk_t, _ = parse_bt(files["FullPublicKey.bt"])
    g_pk = int.from_bytes(pk_t[0], "big")
    y_pk = int.from_bytes(pk_t[1], "big")

    # --------------------------------------------------------- 3. PoSC
    w("## 3. PoSC — proof of shuffle of commitments over all N_0 "
      "(reference: PoSCBasicTW)\n")
    g_bt = group.elem_to_bytetree(group.from_ints([g_int]).get(0))
    seed_data = node(
        g_bt,
        ByteTree.from_bytes(bytes.fromhex(tv["bas.h"])),
        ByteTree.from_bytes(files["PermutationCommitment01.bt"]),
    ).to_bytes()
    w("Seed data = `node(g, h, u)`:\n")
    w("```\n" + hexwrap(rho + seed_data) + "\n```\n")
    s = ro(8 * 32, rho + seed_data)
    w(f"    s = RO_256(rho ‖ data) = {s.hex()}\n")
    check("PoSC.s", s.hex(), tv["PoSC.s"])

    stream = prg_stream(s, N0 * 32)
    e = [
        int.from_bytes(stream[i * 32 : (i + 1) * 32], "big") % q
        for i in range(N0)
    ]
    w("Batching vector e_i = (256-bit PRG block) mod q:\n")
    for i, x in enumerate(e):
        w(f"    e_{i} = {x}")
    w("")

    ct, _ = parse_bt(files["PoSCCommitment01.bt"])
    B = ints_of(ct[0])
    Ap = int.from_bytes(ct[1], "big")
    Bp = ints_of(ct[2])
    Cp = int.from_bytes(ct[3], "big")
    Dp = int.from_bytes(ct[4], "big")
    chal_data = node(
        leaf(s), ByteTree.from_bytes(files["PoSCCommitment01.bt"])
    ).to_bytes()
    v = int.from_bytes(ro(256, rho + chal_data), "big")
    w(f"    v = RO_256(rho ‖ node(leaf(s), commitment)) = {v}\n")
    check("PoSC.v", str(v), tv["PoSC.v"])

    rt, _ = parse_bt(files["PoSCReply01.bt"])
    k_A = int.from_bytes(rt[0], "big")
    k_B = ints_of(rt[1])
    k_C = int.from_bytes(rt[2], "big")
    k_D = int.from_bytes(rt[3], "big")
    k_E = ints_of(rt[4])

    def prodexp(bases, exps):
        acc = 1
        for b, x in zip(bases, exps):
            acc = acc * pow(b, x, p) % p
        return acc

    A = prodexp(u, e)
    C = prodexp(u, [1] * N0) * pow(prodexp(hs, [1] * N0), p - 2, p) % p
    eprod = 1
    for x in e:
        eprod = eprod * x % q
    D = B[N0 - 1] * pow(pow(hs[0], eprod, p), p - 2, p) % p

    okA = (pow(A, v, p) * Ap % p
           == pow(g_int, k_A, p) * prodexp(hs, k_E) % p)
    okB = True
    for i in range(N0):
        prev = hs[0] if i == 0 else B[i - 1]
        okB &= (pow(B[i], v, p) * Bp[i] % p
                == pow(g_int, k_B[i], p) * pow(prev, k_E[i], p) % p)
    okC = pow(C, v, p) * Cp % p == pow(g_int, k_C, p)
    okD = pow(D, v, p) * Dp % p == pow(g_int, k_D, p)
    for name, ok in [
        ("A^v·A' == g^{k_A}·prod h_i^{k_E_i}", okA),
        ("B_i^v·B'_i == g^{k_B_i}·B_{i-1}^{k_E_i}  (B_{-1}=h_0)", okB),
        ("C^v·C' == g^{k_C}", okC),
        ("D^v·D' == g^{k_D}", okD),
    ]:
        assert ok, f"PoSC equation failed: {name}"
        w(f"    {name}   ... holds ✓")
    w("\nThe permutation commitment u opens to a permutation of the "
      "N_0 generators. ✓\n")

    # --------------------------------------------- 4. KeepList shrink
    w("## 4. KeepList shrink N_0 = 8 -> N = 5 "
      "(reference: PermutationCommitment.shrink)\n")
    kl, _ = parse_bt(files["KeepList01.bt"])
    keep = list(kl)
    assert len(keep) == N0 and sum(keep) == N
    w(f"    keep = {keep}")
    u_s = [x for x, kp in zip(u, keep) if kp]
    hs_s = hs[:N]
    w("    u' = u[keep],  h' = h[0:N]\n")

    # --------------------------------------------------------- 5. CCPoS
    w("## 5. CCPoS — commitment-consistent proof of shuffle "
      "(reference: CCPoSBasicW.verify:520-585)\n")
    wt, _ = parse_bt(files["Ciphertexts.bt"])
    wpt, _ = parse_bt(files["ShuffledCiphertexts.bt"])
    w_u, w_v = ints_of(wt[0]), ints_of(wt[1])
    wp_u, wp_v = ints_of(wpt[0]), ints_of(wpt[1])

    u_s_bt = group.elem_to_bytetree(group.from_ints(u_s))
    hs_s_bt = group.elem_to_bytetree(group.from_ints(hs_s))
    seed_data = node(
        g_bt,
        hs_s_bt,
        u_s_bt,
        ByteTree.from_bytes(files["FullPublicKey.bt"]),
        ByteTree.from_bytes(files["Ciphertexts.bt"]),
        ByteTree.from_bytes(files["ShuffledCiphertexts.bt"]),
    ).to_bytes()
    w("Seed data = `node(g, h', u', pk, w, w')`:\n")
    w("```\n" + hexwrap(rho + seed_data) + "\n```\n")
    s2 = ro(8 * 32, rho + seed_data)
    w(f"    s = RO_256(rho ‖ data) = {s2.hex()}\n")
    check("CCPoS.s", s2.hex(), tv["CCPoS.s"])

    stream = prg_stream(s2, N * 32)
    e2 = [
        int.from_bytes(stream[i * 32 : (i + 1) * 32], "big") % q
        for i in range(N)
    ]

    cct, _ = parse_bt(files["CCPoSCommitment01.bt"])
    cAp = int.from_bytes(cct[0], "big")
    cBp_u = int.from_bytes(cct[1][0], "big")
    cBp_v = int.from_bytes(cct[1][1], "big")
    chal_data = node(
        leaf(s2), ByteTree.from_bytes(files["CCPoSCommitment01.bt"])
    ).to_bytes()
    v2 = int.from_bytes(ro(256, rho + chal_data), "big")
    w(f"    v = RO_256(rho ‖ node(leaf(s), commitment)) = {v2}\n")
    check("CCPoS.v", str(v2), tv["CCPoS.v"])

    crt, _ = parse_bt(files["CCPoSReply01.bt"])
    ck_A = int.from_bytes(crt[0], "big")
    ck_B = int.from_bytes(crt[1], "big")
    ck_E = ints_of(crt[2])

    cA = prodexp(u_s, e2)
    cB_u = prodexp(w_u, e2)
    cB_v = prodexp(w_v, e2)
    okA = (pow(cA, v2, p) * cAp % p
           == pow(g_int, ck_A, p) * prodexp(hs_s, ck_E) % p)
    okB = (
        pow(cB_u, v2, p) * cBp_u % p
        == pow(pow(g_pk, ck_B, p), p - 2, p) * prodexp(wp_u, ck_E) % p
    ) and (
        pow(cB_v, v2, p) * cBp_v % p
        == pow(pow(y_pk, ck_B, p), p - 2, p) * prodexp(wp_v, ck_E) % p
    )
    for name, ok in [
        ("A^v·A' == g^{k_A}·prod h'_i^{k_E_i}   (A = prod u'^e)", okA),
        ("B^v·B' == pk^{-k_B}·prod w'_i^{k_E_i} (B = prod w^e, "
         "componentwise)", okB),
    ]:
        assert ok, f"CCPoS equation failed: {name}"
        w(f"    {name}   ... holds ✓")
    w("\nThe published output list is the committed permutation of the "
      "re-encrypted input list; both equations verified with "
      "pure-Python modular arithmetic. ✓\n")

    OUT.write_text("\n".join(lines))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    sys.exit(main())
