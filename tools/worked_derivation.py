"""Produce docs/WORKED_POS.md: a fully worked PoS verification of the
committed golden transcript, recomputed INDEPENDENTLY of the device
stack — all hashing with `hashlib`, all group arithmetic with Python
`pow` — with every random-oracle input hex-dumped, so a reviewer can
diff the derivation chain line by line against the published
Verificatum verifier specification without running Java
(reference emission sites: MixNetElGamalVerifyFiatShamirSession.java:
158-190 globalPrefix, :843-941 PoS; RO/PRG constructions per the
spec as implemented in ChallengerRO.java:96-116,
IndependentGeneratorsRO.java:110-130, PoSBasicTW.java:533-538,
:1000-1066).

The repo is imported ONLY to assemble byte-tree serializations for the
seed-data dumps (their byte-compatibility is pinned separately by the
golden fixture); every hash and every group equation below is computed
from scratch.

Usage: python -m tools.worked_derivation   (writes docs/WORKED_POS.md)
"""

import hashlib
import json
import os
import struct
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")

ROOT = Path(__file__).resolve().parent.parent
GOLDEN = ROOT / "tests" / "golden" / "nizkp_test256_k1"
OUT = ROOT / "docs" / "WORKED_POS.md"

# ----------------------------------------------------- minimal bytetree


def parse_bt(raw: bytes, off=0):
    """Standalone byte-tree parser: leaf=0x01|len|bytes, node=0x00|n|kids."""
    tag = raw[off]
    n = struct.unpack(">I", raw[off + 1 : off + 5])[0]
    off += 5
    if tag == 1:
        return raw[off : off + n], off + n
    kids = []
    for _ in range(n):
        kid, off = parse_bt(raw, off)
        kids.append(kid)
    return kids, off


def ints_of(tree):
    """Array node of fixed-size leaves -> list of ints."""
    return [int.from_bytes(leafbytes, "big") for leafbytes in tree]


# ------------------------------------------------- hashlib-only RO/PRG


def prg_stream(seed: bytes, n: int) -> bytes:
    """PRGHeuristic: H(seed||be32(0)) || H(seed||be32(1)) || ..."""
    out = b""
    c = 0
    while len(out) < n:
        out += hashlib.sha256(seed + struct.pack(">i", c)).digest()
        c += 1
    return out[:n]


def ro(nbits: int, data: bytes) -> bytes:
    """RO_{SHA-256, nbits}(data) per the verifier spec."""
    s = hashlib.sha256(struct.pack(">i", nbits) + data).digest()
    nbytes = (nbits + 7) // 8
    out = bytearray(prg_stream(s, nbytes))
    extra = 8 * nbytes - nbits
    if extra:
        out[0] &= 0xFF >> extra
    return bytes(out)


def hexwrap(b: bytes, width=64):
    h = b.hex()
    return "\n".join(h[i : i + width] for i in range(0, len(h), width))


def main():
    sys.path.insert(0, str(ROOT))
    from vmn_tpu import VCR_COMPAT_VERSION
    from vmn_tpu.arith.pgroup import ModPGroup
    from vmn_tpu.eio.bytetree import int_leaf, leaf, node

    tv = json.loads(
        (GOLDEN.parent / "test_vectors.json").read_text()
    )
    group = ModPGroup.named("test256")
    p, q, g_int = group.p, group.q, group.g_int
    N = 5
    lines = []
    w = lines.append

    def check(name, got, want):
        assert got == want, f"{name}: {got!r} != {want!r}"
        w(f"matches test vector `{name}`. ✓\n")

    w("# Worked PoS verification (golden transcript, independently "
      "recomputed)\n")
    w("Every value below is recomputed from the committed transcript "
      "`tests/golden/nizkp_test256_k1` using ONLY `hashlib` and Python "
      "integer `pow` — no JAX, no device code — by "
      "`tools/worked_derivation.py`, which asserts every equality "
      "before writing this file.  Hash inputs are dumped in full so "
      "the chain can be diffed against the Verificatum verifier "
      "specification.\n")
    w("## Group (named `test256`)\n")
    w(f"    p = 0x{p:x}\n    q = (p-1)/2 = 0x{q:x}\n    g = {g_int}\n")
    w("Parameters: `rbitlen (n_r) = 100`, `vbitlenro (n_v) = 256`, "
      "`ebitlenro (n_e) = 256`, PRG/RO hash = SHA-256, "
      f"version = `{VCR_COMPAT_VERSION}`, rosid = `Golden.golden`.\n")

    # ---------------------------------------------------------- 1. rho
    w("## 1. Global prefix ρ (reference: ProtocolElGamal.java:659-683)\n")
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
    w("Pre-image byte tree `node(version, rosid, n_r, n_v, n_e, s_PRG,"
      " s_Gq, s_H)`:\n")
    w("```\n" + hexwrap(pre) + "\n```\n")
    w(f"    rho = SHA-256(pre-image) = {rho.hex()}\n")
    check("der.rho", rho.hex(), tv["der.rho"])

    # ---------------------------------------------- 2. generators h
    w("## 2. Independent generators h (reference: "
      "IndependentGeneratorsRO.java:110-130)\n")
    gen_data = leaf(b"generators").to_bytes()
    w("RO input = `rho ‖ bytetree(leaf(\"generators\"))`:\n")
    w("```\n" + hexwrap(rho + gen_data) + "\n```\n")
    hseed = ro(8 * 32, rho + gen_data)
    w(f"    h_seed = RO_256(input) = {hseed.hex()}\n")
    bits = p.bit_length() + 100
    nbytes = (bits + 7) // 8
    stream = prg_stream(hseed, N * nbytes)
    hs = []
    for i in range(N):
        t = int.from_bytes(stream[i * nbytes : (i + 1) * nbytes], "big")
        extra = 8 * nbytes - bits
        if extra:
            t &= (1 << bits) - 1
        hs.append(pow(t % p, (p - 1) // q, p))
    w("Each h_i = (PRG-derived 356-bit integer mod p)^((p-1)/q) mod p:\n")
    for i, h in enumerate(hs):
        w(f"    h_{i} = 0x{h:x}")
    w("")
    hs_bt = group.elem_to_bytetree(
        group.from_ints(hs)
    ).to_bytes().hex()
    check("bas.h", hs_bt, tv["bas.h"])

    # ------------------------------------------------- 3. transcript
    w("## 3. Transcript inputs\n")
    files = {}
    for name in ["FullPublicKey.bt", "Ciphertexts.bt",
                 "ShuffledCiphertexts.bt"]:
        files[name] = (GOLDEN / name).read_bytes()
    for name in ["PermutationCommitment01.bt", "PoSCommitment01.bt",
                 "PoSReply01.bt"]:
        files[name] = (GOLDEN / "proofs" / name).read_bytes()
    pk_t, _ = parse_bt(files["FullPublicKey.bt"])
    g_pk = int.from_bytes(pk_t[0], "big")
    y_pk = int.from_bytes(pk_t[1], "big")
    w(f"    FullPublicKey (g, y): g = 0x{g_pk:x}\n"
      f"                          y = 0x{y_pk:x}")
    wt, _ = parse_bt(files["Ciphertexts.bt"])
    wpt, _ = parse_bt(files["ShuffledCiphertexts.bt"])
    w_u, w_v = ints_of(wt[0]), ints_of(wt[1])
    wp_u, wp_v = ints_of(wpt[0]), ints_of(wpt[1])
    ut, _ = parse_bt(files["PermutationCommitment01.bt"])
    u = ints_of(ut)
    w("    u_i (PermutationCommitment01.bt):")
    for i, x in enumerate(u):
        w(f"      u_{i} = 0x{x:x}")
    w("")

    # ------------------------------------------------ 4. PoS seed s
    w("## 4. Batching seed s (reference: PoSTW.java:118-130; "
      "ChallengerRO.java:96-116)\n")
    from vmn_tpu.eio.bytetree import ByteTree

    g_bt = group.elem_to_bytetree(group.from_ints([g_int]).get(0))
    h_bt = ByteTree.from_bytes(bytes.fromhex(tv["bas.h"]))
    # The wide public key at width 1 serializes exactly like
    # FullPublicKey.bt: node(g, y).
    seed_data = node(
        g_bt,
        h_bt,
        ByteTree.from_bytes(files["PermutationCommitment01.bt"]),
        ByteTree.from_bytes(files["FullPublicKey.bt"]),
        ByteTree.from_bytes(files["Ciphertexts.bt"]),
        ByteTree.from_bytes(files["ShuffledCiphertexts.bt"]),
    ).to_bytes()
    w("RO input = `rho ‖ bytetree(node(g, h, u, pk, w, w'))` "
      "(full hex):\n")
    w("```\n" + hexwrap(rho + seed_data) + "\n```\n")
    s = ro(8 * 32, rho + seed_data)
    w(f"    s = RO_256(input) = {s.hex()}\n")
    check("PoS.s", s.hex(), tv["PoS.s"])

    # --------------------------------------------- 5. batching vector
    w("## 5. Batching vector e (reference: PoSBasicTW.java:533-538)\n")
    stream = prg_stream(s, N * 32)
    e = []
    for i in range(N):
        e.append(int.from_bytes(stream[i * 32 : (i + 1) * 32],
                                "big") % q)
    w("e_i = (256-bit PRG block) mod q  (n_e = 256 >= bits(q) = 255):\n")
    for i, x in enumerate(e):
        w(f"    e_{i} = {x}")
    w("")

    # -------------------------------------------------- 6. challenge v
    ct, _ = parse_bt(files["PoSCommitment01.bt"])
    B = ints_of(ct[0])
    Ap = int.from_bytes(ct[1], "big")
    Bp = ints_of(ct[2])
    Cp = int.from_bytes(ct[3], "big")
    Dp = int.from_bytes(ct[4], "big")
    Fp_u = int.from_bytes(ct[5][0], "big")
    Fp_v = int.from_bytes(ct[5][1], "big")
    w("## 6. Challenge v (reference: PoSTW.java:146-147)\n")
    chal_data = node(
        leaf(s), ByteTree.from_bytes(files["PoSCommitment01.bt"])
    ).to_bytes()
    w("RO input = `rho ‖ bytetree(node(leaf(s), commitment))`:\n")
    w("```\n" + hexwrap(rho + chal_data) + "\n```\n")
    v = int.from_bytes(ro(256, rho + chal_data), "big")
    w(f"    v = RO_256(input) as integer = {v}\n")
    check("PoS.v", str(v), tv["PoS.v"])

    # ------------------------------------------------- 7. equations
    w("## 7. Verification equations "
      "(reference: PoSBasicTW.java:1000-1066)\n")
    rt, _ = parse_bt(files["PoSReply01.bt"])
    k_A = int.from_bytes(rt[0], "big")
    k_B = ints_of(rt[1])
    k_C = int.from_bytes(rt[2], "big")
    k_D = int.from_bytes(rt[3], "big")
    k_E = ints_of(rt[4])
    k_F = int.from_bytes(rt[5], "big")
    w(f"    k_A = {k_A}\n    k_C = {k_C}\n    k_D = {k_D}\n"
      f"    k_F = {k_F}\n    k_B = {k_B}\n    k_E = {k_E}\n")

    def prodexp(bases, exps):
        acc = 1
        for b, x in zip(bases, exps):
            acc = acc * pow(b, x, p) % p
        return acc

    A = prodexp(u, e)
    F_u = prodexp(w_u, e)
    F_v = prodexp(w_v, e)
    C = prodexp(u, [1] * N) * pow(prodexp(hs, [1] * N), p - 2, p) % p
    eprod = 1
    for x in e:
        eprod = eprod * x % q
    D = B[N - 1] * pow(pow(hs[0], eprod, p), p - 2, p) % p
    w(f"    A = prod u_i^e_i         = 0x{A:x}")
    w(f"    F = prod w_i^e_i         = (0x{F_u:x},\n"
      f"                                0x{F_v:x})")
    w(f"    C = prod u_i / prod h_i  = 0x{C:x}")
    w(f"    D = B_(N-1) / h_0^(prod e mod q) = 0x{D:x}\n")
    check("PoS.A",
          group.elem_to_bytetree(group.from_ints([A]).get(0))
          .to_bytes().hex(), tv["PoS.A"])

    eqs = []
    okA = (pow(A, v, p) * Ap % p
           == pow(g_int, k_A, p) * prodexp(hs, k_E) % p)
    eqs.append(("A^v·A' == g^{k_A}·prod h_i^{k_E_i}", okA))
    okB = True
    for i in range(N):
        prev = hs[0] if i == 0 else B[i - 1]
        okB &= (pow(B[i], v, p) * Bp[i] % p
                == pow(g_int, k_B[i], p) * pow(prev, k_E[i], p) % p)
    eqs.append(("B_i^v·B'_i == g^{k_B_i}·B_{i-1}^{k_E_i}  (B_{-1}=h_0)",
                okB))
    okC = pow(C, v, p) * Cp % p == pow(g_int, k_C, p)
    eqs.append(("C^v·C' == g^{k_C}", okC))
    okD = pow(D, v, p) * Dp % p == pow(g_int, k_D, p)
    eqs.append(("D^v·D' == g^{k_D}", okD))
    inv_kF = p - 2  # x^-1 = x^(p-2)
    okF = (
        pow(F_u, v, p) * Fp_u % p
        == pow(pow(g_pk, k_F, p), inv_kF, p) * prodexp(wp_u, k_E) % p
    ) and (
        pow(F_v, v, p) * Fp_v % p
        == pow(pow(y_pk, k_F, p), inv_kF, p) * prodexp(wp_v, k_E) % p
    )
    eqs.append(("F^v·F' == pk^{-k_F}·prod w'_i^{k_E_i}  "
                "(componentwise over (u,v))", okF))
    for name, ok in eqs:
        assert ok, f"equation failed: {name}"
        w(f"    {name}   ... holds ✓")
    w("\nAll five equations verified with pure-Python modular "
      "arithmetic; the transcript is a valid proof of a shuffle.\n")

    OUT.write_text("\n".join(lines))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    sys.exit(main())
