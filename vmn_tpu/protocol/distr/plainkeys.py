"""PlainKeys: CCA2 key establishment for point-to-point messages.

Rebuild of the reference PlainKeys protocol (reference:
PlainKeys.java:54 — each party generates a CCA2 keypair, publishes the
public key in the clear over the bulletin board, and collects everyone
else's; the resulting `pkeys[]`/`skey` protect secret shares inside
Pedersen VSS, Pedersen.java:355).

A party whose published key is malformed is marked; shares addressed to
it are sent in a deterministic garbage form (it cannot participate in
VSS anyway), mirroring the reference's deterministic-default handling.
"""

from __future__ import annotations

from typing import Dict, Optional

from vmn_tpu.crypto.naor_yung import (
    NaorYungError,
    NaorYungKeyPair,
    NaorYungPKey,
)
from vmn_tpu.eio.bytetree import ByteTree, ByteTreeError


class PlainKeysResult:
    def __init__(self, pkeys: Dict[int, Optional[NaorYungPKey]],
                 keypair: NaorYungKeyPair):
        self.pkeys = pkeys  # l -> pkey (None if party l's key malformed)
        self.keypair = keypair

    def cipher(self, randomsource) -> "PlainKeysCipher":
        return PlainKeysCipher(self, randomsource)


class PlainKeysCipher:
    """Adapter with the share-cipher interface consumed by VSS/DKG
    (encrypt(to_party, data) / decrypt(data))."""

    def __init__(self, pk: PlainKeysResult, randomsource):
        self.pk = pk
        self.rs = randomsource

    def encrypt(self, to_party: int, data: bytes) -> bytes:
        pkey = self.pk.pkeys.get(to_party)
        if pkey is None:
            return b""  # party cannot decrypt anyway
        return pkey.encrypt(data, self.rs)

    def decrypt(self, data: bytes) -> bytes:
        try:
            return self.pk.keypair.decrypt(data)
        except NaorYungError as e:
            raise ValueError(f"undecryptable share: {e}") from e


def run_plainkeys(ctx, board, randomsource, group=None) -> PlainKeysResult:
    """Generate + exchange CCA2 public keys (reference:
    PlainKeys.generate:132).  `group` selects the Naor-Yung group
    (independent of the protocol group; defaults to the protocol
    group's base when it is a ModPGroup)."""
    from vmn_tpu.arith.pgroup import ModPGroup, PPGroup

    if group is None:
        g = ctx.pgroup
        while isinstance(g, PPGroup):
            g = g.project(0)
        group = g if isinstance(g, ModPGroup) else ModPGroup.named(
            "modp2048"
        )
    kp = NaorYungKeyPair.generate(randomsource, group)
    b = board.scope("plainkeys")
    b.publish("PublicKey", kp.pkey.to_bytetree().to_bytes())
    pkeys: Dict[int, Optional[NaorYungPKey]] = {}
    for l in range(1, board.k + 1):
        if l == board.j:
            pkeys[l] = kp.pkey
            continue
        raw = b.wait_for(l, "PublicKey")
        try:
            pkeys[l] = NaorYungPKey.from_bytetree(ByteTree.from_bytes(raw))
        except (ByteTreeError, ValueError):
            pkeys[l] = None
    return PlainKeysResult(pkeys, kp)
