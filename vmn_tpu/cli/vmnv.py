"""`vmnv` — standalone universal verifier.

Rebuild of the reference verifier CLI (reference:
MixNetElGamalVerifyFiatShamirTool.java:540-641):

    vmnv protInfo nizkpdir [-mix|-shuffle|-decrypt] [-auxsid SID]
         [-nopos] [-nodec] [-t name1,name2,...] [-v]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="vmnv", description=__doc__)
    p.add_argument("protinfo")
    p.add_argument("nizkp")
    mode = p.add_mutually_exclusive_group()
    mode.add_argument("-mix", action="store_true")
    mode.add_argument("-shuffle", action="store_true")
    mode.add_argument("-decrypt", action="store_true")
    p.add_argument("-auxsid", default=None)
    p.add_argument("-nopos", action="store_true",
                   help="skip proofs of shuffles")
    p.add_argument("-nodec", action="store_true",
                   help="skip decryption proof")
    p.add_argument("-noposc", action="store_true",
                   help="skip proofs of shuffles of commitments")
    p.add_argument("-noccpos", action="store_true",
                   help="skip commitment-consistent proofs of shuffles")
    p.add_argument("-sloppy", action="store_true",
                   help="relax strict byte-format checks")
    p.add_argument("-width", type=int, default=None,
                   help="expected width of ciphertexts")
    p.add_argument("-wd", default=None, metavar="DIR",
                   help="working directory for temporary files")
    p.add_argument("-a", default=None, metavar="BACKEND",
                   help="array backend: ram or file")
    p.add_argument("-mc", action="store_true",
                   help="print verifier-spec compatibility usage and exit")
    p.add_argument("-t", default=None,
                   help="comma-separated test-vector names to print")
    p.add_argument("-v", action="store_true", help="verbose")
    args = p.parse_args(argv)

    if args.mc:
        # Compatibility mode: the usage form mandated by the Verificatum
        # verifier specification (reference:
        # MixNetElGamalVerifyFiatShamirTool.java -mc flag).
        print("Usage: vmnv -mix|-shuffle|-decrypt [-auxsid <auxsid>] "
              "[-width <width>] <protInfo> <nizkp>")
        return 0

    if args.wd:
        import os
        import tempfile
        os.makedirs(args.wd, exist_ok=True)
        tempfile.tempdir = args.wd

    from vmn_tpu.protocol.info import ProtocolInfo
    from vmn_tpu.protocol.mixnet.verifier import (
        FiatShamirVerifier,
        VerificationError,
    )

    prot = ProtocolInfo.read(args.protinfo)
    expected = (
        "mixing" if args.mix else
        "shuffling" if args.shuffle else
        "decryption" if args.decrypt else None
    )
    tv = args.t.split(",") if args.t else None
    verifier = FiatShamirVerifier(prot.to_params(), args.nizkp,
                                  test_vectors=tv)
    try:
        res = verifier.verify(
            expected_type=expected,
            expected_auxsid=args.auxsid,
            check_pos=not args.nopos,
            check_dec=not args.nodec,
            check_posc=not args.noposc,
            check_ccpos=not args.noccpos,
            expected_width=args.width,
            sloppy=args.sloppy,
        )
    except VerificationError as e:
        print(f"FAILED: {e}", file=sys.stderr)
        return 1

    for name, value in res.test_vectors.items():
        print(f"{name} = {value}")
    if args.v:
        print(f"type={res.type} auxsid={res.auxsid} width={res.width} "
              f"active_threshold={res.active_threshold}")
    if res.ok:
        print("Proof is valid.")
        return 0
    print("PROOF IS INVALID.", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
