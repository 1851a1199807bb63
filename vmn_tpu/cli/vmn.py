"""`vmn` — the mix-server tool.

Rebuild of the reference mix-server CLI (reference:
MixNetElGamalTool.java:318-539 usage forms):

    vmn -keygen  privInfo protInfo publicKey
    vmn -setpk   privInfo protInfo publicKey
    vmn -precomp privInfo protInfo
    vmn -mix     privInfo protInfo ciphertexts plaintexts
    vmn -shuffle privInfo protInfo ciphertexts ciphertextsOut
    vmn -decrypt privInfo protInfo ciphertexts plaintexts
    vmn -delete  privInfo protInfo
    vmn -lact / -sact <set>   (list / set active servers)

Single-party (k=1) runs complete in-process; multi-party runs use the
HTTP bulletin board configured in the info files.  Timing and
communication are reported like the reference `postlude`
(reference: MixNetElGamalTool.java:130-207).
"""

from __future__ import annotations

import argparse
import pickle
import sys
import time
from pathlib import Path

from vmn_tpu.protocol.info import PrivateInfo, ProtocolInfo


def _party_index(prot, priv):
    for i, p in enumerate(prot.parties):
        if p.name == priv.name:
            return i + 1
    if prot.nopart == 1:
        return 1
    raise SystemExit(f"party {priv.name!r} not found in protocol info")


def _board(prot, priv, j):
    if prot.nopart == 1:
        from vmn_tpu.protocol.com.board import LocalBoardHub

        return LocalBoardHub(1).board(1)
    from vmn_tpu.protocol.com.http import HTTPBulletinBoard

    return HTTPBulletinBoard(prot, priv, j)


def _mk_party(prot, priv):
    from vmn_tpu.crypto.provable import resolve_random_source
    from vmn_tpu.crypto.randomsource import SeededSource
    from vmn_tpu.protocol.mixnet.party import MixNetParty

    j = _party_index(prot, priv)
    if getattr(priv, "arrays", "ram") == "file":
        # Out-of-core arrays: spill large cached arrays to disk memmaps
        # (reference: file-mapped LargeIntegerArray toggled by the
        # `arrays` private-info field, ProtocolElGamal.java:332-345).
        from vmn_tpu.arith import storage

        storage.set_backend("file", Path(priv.dir) / "arrays")
    if priv.seed:
        rs = SeededSource(Path(priv.seed).read_bytes())
    else:
        rs = resolve_random_source(priv.rand, directory=priv.dir)
    party = MixNetParty(
        prot.to_params(), _board(prot, priv, j), rs, priv.dir
    )
    return party


def _state_file(priv) -> Path:
    return Path(priv.dir) / ".vmn_state"


def _save_keys(party, priv):
    """Persist DKG result (reference: DKG KeyAndPoly file DKG.java:147-175
    — disk state for crash recovery / later sessions)."""
    import numpy as np

    st = {
        "share": np.asarray(party.dkg.secret_share.limbs),
        "poly": np.asarray(party.dkg.poly_in_exp.limbs),
        "k": party.dkg.k,
    }
    _state_file(priv).parent.mkdir(parents=True, exist_ok=True)
    with open(_state_file(priv), "wb") as f:
        pickle.dump(st, f)


def _save_external_pk(party, priv, pk):
    """Persist an externally set public key (reference:
    MixNetElGamal.setPublicKey:227-242 writes the key to disk)."""
    _state_file(priv).parent.mkdir(parents=True, exist_ok=True)
    with open(_state_file(priv), "wb") as f:
        pickle.dump({"extpk": pk.to_bytetree().to_bytes()}, f)


def _load_keys(party, priv):
    import jax.numpy as jnp

    from vmn_tpu.arith.pgroup import FArray, GArray
    from vmn_tpu.eio.bytetree import ByteTree
    from vmn_tpu.protocol.distr.dkg import DKGResult
    from vmn_tpu.protocol.elgamal import ElGamalPublicKey

    path = _state_file(priv)
    if not path.exists():
        raise SystemExit("no key state; run vmn -keygen or -setpk first")
    with open(path, "rb") as f:
        st = pickle.load(f)
    group = party.ctx.key_group()
    if "extpk" in st:
        party.set_public_key(
            ElGamalPublicKey.from_bytetree(
                group, ByteTree.from_bytes(st["extpk"])
            )
        )
        return
    party.dkg = DKGResult(
        group,
        FArray(group.ring, jnp.asarray(st["share"])),
        GArray(group, jnp.asarray(st["poly"])),
        st["k"],
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="vmn", description=__doc__)
    mode = p.add_mutually_exclusive_group(required=True)
    for m in ("keygen", "setpk", "precomp", "mix", "shuffle", "decrypt",
              "delete", "lact"):
        mode.add_argument(f"-{m}", action="store_true")
    mode.add_argument("-sact", metavar="SET",
                      help="comma-separated active party indices")
    p.add_argument("files", nargs="*")
    p.add_argument("-auxsid", default="default")
    p.add_argument("-width", type=int, default=0)
    p.add_argument("-maxciph", type=int, default=0)
    p.add_argument("-ini", default="raw", help="input interface")
    p.add_argument("-outi", default="raw", help="output interface")
    args = p.parse_args(argv)

    if len(args.files) < 2:
        raise SystemExit("privInfo and protInfo files required")
    priv = PrivateInfo.read(args.files[0])
    prot = ProtocolInfo.read(args.files[1])
    width = args.width or prot.width

    from vmn_tpu.protocol.interfaces import get_interface

    iface_in = get_interface(args.ini)
    iface_out = get_interface(args.outi)

    t0 = time.time()
    party = _mk_party(prot, priv)

    if args.lact:
        print(",".join(
            str(l) for l in range(1, party.k + 1) if party.active[l]
        ))
        return 0
    if args.sact:
        active = [False] * (party.k + 1)
        for tok in args.sact.split(","):
            active[int(tok)] = True
        party.set_active(active)
        with open(Path(priv.dir) / ".active", "w") as f:
            f.write(args.sact)
        return 0
    if Path(priv.dir, ".active").exists():
        toks = Path(priv.dir, ".active").read_text().split(",")
        active = [False] * (party.k + 1)
        for tok in toks:
            active[int(tok)] = True
        party.set_active(active)

    if args.delete:
        import shutil

        for sub in Path(priv.dir).glob("nizkp.*"):
            shutil.rmtree(sub)
        _state_file(priv).unlink(missing_ok=True)
        print("deleted session state")
        return 0

    if args.keygen:
        pk = party.keygen()
        _save_keys(party, priv)
        if len(args.files) >= 3:
            iface_out.write_public_key(pk, args.files[2])
        _postlude(party, t0)
        return 0

    if args.setpk:
        if len(args.files) < 3:
            raise SystemExit("public key file required")
        pk = iface_in.read_public_key(party.ctx.key_group(), args.files[2])
        party.set_public_key(pk)
        _save_external_pk(party, priv, pk)
        _postlude(party, t0)
        return 0

    _load_keys(party, priv)
    session = party.session(args.auxsid, width)
    ciph_group = party.ctx.session(args.auxsid).ciph_group(width)

    if args.precomp:
        maxciph = args.maxciph or prot.maxciph
        if maxciph <= 0:
            raise SystemExit("-maxciph (or protInfo maxciph) required")
        session.precomp(maxciph)
        _postlude(party, t0)
        return 0

    if len(args.files) < 4:
        raise SystemExit("input and output files required")
    ciphs = iface_in.read_ciphertexts(ciph_group, args.files[2])

    from vmn_tpu.protocol.mixnet.party import ProtocolError

    try:
        if args.mix:
            out = session.mix(ciphs)
            iface_out.write_plaintexts(out, args.files[3])
        elif args.shuffle:
            out = session.shuffle(ciphs)
            iface_out.write_ciphertexts(out, args.files[3])
        elif args.decrypt:
            out = session.decrypt(ciphs)
            iface_out.write_plaintexts(out, args.files[3])
    except ProtocolError as e:
        raise SystemExit(f"vmn: {e}")
    _postlude(party, t0)
    return 0


def _postlude(party, t0):
    """Timing/communication/proof-size report
    (reference: MixNetElGamalTool.postlude:130-207; proof size =
    recursive nizkp directory size, ProtocolElGamal.getNizkpBytes
    :591-602)."""
    b = party.board
    total = time.time() - t0
    waiting = getattr(b, "waiting_time", 0.0)
    print(f"Execution time:  {total:10.3f} s")
    print(f"Network waiting: {waiting:10.3f} s")
    print(f"Computation:     {total - waiting:10.3f} s")
    print(f"Sent bytes:      {getattr(b, 'sent_bytes', 0):10d}")
    print(f"Received bytes:  {getattr(b, 'received_bytes', 0):10d}")
    if party.directory is not None:
        nizkp_bytes = sum(
            f.stat().st_size
            for d in Path(party.directory).glob("nizkp.*")
            for f in d.rglob("*")
            if f.is_file()
        )
        if nizkp_bytes:
            print(f"Proof size:      {nizkp_bytes:10d} bytes")


if __name__ == "__main__":
    sys.exit(main())
