"""Phase-level profile of the k=1 headline mix.

Times setup / warmup / shuffle / decrypt separately so device vs host
cost is visible (VERDICT r1: 'profile the k=1 mix to split device vs
host time').

Usage: python tools/profile_mix.py [N]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384

    from vmn_tpu.arith.pgroup import ModPGroup
    from vmn_tpu.crypto.hash import SHA256
    from vmn_tpu.crypto.prg import PRGHeuristic
    from vmn_tpu.crypto.randomsource import SeededSource
    from vmn_tpu.protocol import elgamal
    from vmn_tpu.protocol.com.board import LocalBoardHub
    from vmn_tpu.protocol.context import ProtocolParams
    from vmn_tpu.protocol.mixnet.party import MixNetParty

    t_all = time.time()
    marks = [("start", time.time())]

    def mark(name):
        marks.append((name, time.time()))
        print(f"[{time.time()-t_all:8.2f}s] {name}", flush=True)

    group = ModPGroup.named("modp2048")
    params = ProtocolParams(sid="Prof", k=1, threshold=1, pgroup=group)
    hub = LocalBoardHub(1)
    rs = SeededSource(b"prof-party")
    with tempfile.TemporaryDirectory() as tmp:
        party = MixNetParty(params, hub.board(1), rs, tmp)
        pk = party.keygen()
        mark("keygen")

        prg = PRGHeuristic(SHA256)
        prg.set_seed(SHA256.hash(b"prof-msgs"))
        m = group.random_array(n, prg, params.rbitlen)
        r = group.ring.random((n,), SeededSource(b"prof-ciphs"), 0)
        ciphs = elgamal.encrypt(pk, m, r)
        np.asarray(ciphs.project(0).limbs)
        mark("encrypt-setup")

        warm = party.session("profwarm", 1)
        s_out = warm.shuffle(ciphs)
        np.asarray(s_out.project(0).limbs)
        mark("warm-shuffle")
        p_out = warm.decrypt(s_out, write_type=False)
        np.asarray(p_out.limbs)
        mark("warm-decrypt")

        sess = party.session("prof", 1)
        s2 = sess.shuffle(ciphs)
        np.asarray(s2.project(0).limbs)
        mark("shuffle")
        p2 = sess.decrypt(s2, write_type=False)
        np.asarray(p2.limbs)
        mark("decrypt")

    prev = marks[0][1]
    print(f"\nn={n}")
    for name, t in marks[1:]:
        print(f"  {name:15s} {t-prev:8.2f}s")
        prev = t
    steady = (marks[-1][1] - marks[-3][1])
    print(f"  steady mix      {steady:8.2f}s  -> {n/steady:.1f} c/s")


if __name__ == "__main__":
    main()
