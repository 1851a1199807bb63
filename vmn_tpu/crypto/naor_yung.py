"""Naor–Yung CCA2 public-key encryption of byte strings.

Rebuild of the reference's CryptoKeyGenNaorYung cryptosystem used by
PlainKeys to protect secret shares in transit (reference: SURVEY.md
§2.4 crypto — Naor–Yung keys configured by the `keygen` info field;
PlainKeys.java:54).

Construction (double-generator El Gamal + Fiat–Shamir equality proof,
the standard Naor–Yung instantiation):

    keygen: z random;  pk = (g1, g2, y = g1^z)   (g2 derived by RO)
    enc(m): s random; (u1, u2, e) = (g1^s, g2^s, y^s·m)
            + FS proof (c, r): knows s with u1 = g1^s and u2 = g2^s
    dec:    check proof; m = e · u1^{-z}

Messages are arbitrary byte strings, chunked through the group's
message encoding.  Host-side integers — this protects k·k small
control-plane messages, not the data path.
"""

from __future__ import annotations

from typing import List, Tuple

from vmn_tpu.arith.pgroup import ModPGroup
from vmn_tpu.crypto.hash import Hashfunction, SHA256
from vmn_tpu.crypto.prg import PRGHeuristic
from vmn_tpu.eio.bytetree import ByteTree, ByteTreeError, leaf, node

_DOMAIN = b"vmn_tpu.naor-yung.v1"


class NaorYungError(Exception):
    pass


def _second_generator(group: ModPGroup, hf: Hashfunction) -> int:
    """Derive g2 with unknown discrete log via a PRG seeded from the
    group description."""
    prg = PRGHeuristic(hf)
    prg.set_seed(hf.hash(_DOMAIN + group.to_bytetree().to_bytes()))
    nbytes = (group.nbits + 16) // 8
    t = int.from_bytes(prg.read_bytes(nbytes), "big") % group.p
    return pow(t, group.coorder, group.p)


class NaorYungPKey:
    MARSHAL_NAME = "com.verificatum.crypto.CryptoPKeyNaorYung"

    def __init__(self, group: ModPGroup, g2: int, y: int,
                 hf: Hashfunction = SHA256):
        self.group = group
        self.g1 = group.g_int
        self.g2 = g2
        self.y = y
        self.hf = hf

    # ----------------------------------------------------------- encrypt

    def encrypt(self, message: bytes, randomsource) -> bytes:
        grp = self.group
        mlen = grp.nbits // 8 - 4
        chunks = [message[i : i + mlen]
                  for i in range(0, max(len(message), 1), mlen)]
        cts = []
        for chunk in chunks:
            m = grp.encode_message(chunk)
            s = randomsource.random_int_mod(grp.q)
            u1 = pow(self.g1, s, grp.p)
            u2 = pow(self.g2, s, grp.p)
            e = pow(self.y, s, grp.p) * m % grp.p
            # FS equality proof
            k = randomsource.random_int_mod(grp.q)
            t1 = pow(self.g1, k, grp.p)
            t2 = pow(self.g2, k, grp.p)
            c = self._challenge(u1, u2, e, t1, t2)
            r = (k + c * s) % grp.q
            cts.append(node(
                _int_leaf(u1), _int_leaf(u2), _int_leaf(e),
                _int_leaf(c), _int_leaf(r),
            ))
        return node(*cts).to_bytes()

    def _challenge(self, u1, u2, e, t1, t2) -> int:
        data = node(
            _int_leaf(self.g1), _int_leaf(self.g2), _int_leaf(self.y),
            _int_leaf(u1), _int_leaf(u2), _int_leaf(e),
            _int_leaf(t1), _int_leaf(t2),
        ).to_bytes()
        return int.from_bytes(self.hf.hash(_DOMAIN + data), "big")

    # --------------------------------------------------------- marshal

    def to_bytetree(self) -> ByteTree:
        return node(
            self.group.to_bytetree(), _int_leaf(self.g2), _int_leaf(self.y)
        )

    @classmethod
    def from_bytetree(cls, bt: ByteTree) -> "NaorYungPKey":
        group = ModPGroup.from_bytetree(bt[0])
        return cls(group, bt[1].to_int_signed(), bt[2].to_int_signed())

    def to_hex(self) -> str:
        return self.to_bytetree().to_hex()

    @classmethod
    def from_hex(cls, hx: str) -> "NaorYungPKey":
        return cls.from_bytetree(ByteTree.from_hex(hx))


class NaorYungKeyPair:
    def __init__(self, pkey: NaorYungPKey, z: int):
        self.pkey = pkey
        self.z = z

    @staticmethod
    def generate(randomsource, group: ModPGroup = None,
                 hf: Hashfunction = SHA256) -> "NaorYungKeyPair":
        group = group or ModPGroup.named("modp2048")
        g2 = _second_generator(group, hf)
        z = randomsource.random_int_mod(group.q)
        y = pow(group.g_int, z, group.p)
        return NaorYungKeyPair(NaorYungPKey(group, g2, y, hf), z)

    def decrypt(self, blob: bytes) -> bytes:
        pk = self.pkey
        grp = pk.group
        try:
            bt = ByteTree.from_bytes(blob)
        except ByteTreeError as e:
            raise NaorYungError(f"malformed ciphertext: {e}")
        out = []
        for ct in bt.children:
            if ct.is_leaf or len(ct.children) != 5:
                raise NaorYungError("malformed ciphertext chunk")
            u1 = ct[0].to_int_signed()
            u2 = ct[1].to_int_signed()
            e = ct[2].to_int_signed()
            c = ct[3].to_int_signed()
            r = ct[4].to_int_signed()
            # verify equality proof: t_i = g_i^r / u_i^c
            t1 = pow(pk.g1, r, grp.p) * pow(u1, -c % grp.q, grp.p) % grp.p
            t2 = pow(pk.g2, r, grp.p) * pow(u2, -c % grp.q, grp.p) % grp.p
            if c != pk._challenge(u1, u2, e, t1, t2):
                raise NaorYungError("invalid ciphertext proof")
            m = e * pow(u1, -self.z % grp.q, grp.p) % grp.p
            out.append(grp.decode_message(m))
        return b"".join(out)


def _int_leaf(x: int) -> ByteTree:
    from vmn_tpu.eio.bytetree import signed_int_leaf

    return signed_int_leaf(x)
