"""`vtm` — umbrella command dispatching the tool family.

Rebuild of the reference CLI surface (reference: VMNTool.java:50-70 and
SURVEY.md §2.2):

    vmni   info-file generator/merger       (vmn_tpu.cli.vmni)
    vmn    mix-server operations            (vmn_tpu.cli.vmn)
    vmnv   standalone proof verifier        (vmn_tpu.cli.vmnv)
    vmnc   format converter                 (vmn_tpu.cli.vmnc)
    vmnd   demo key/ciphertext generator    (vmn_tpu.cli.vmnd)
    vre    key/ciphertext re-arrangement    (vmn_tpu.cli.vre)
    vbt    byte-tree dump                   (vmn_tpu.cli.vbt)
    vdemo  simulated multi-party demo       (vmn_tpu.cli.vdemo)
    vhttp  standalone board HTTP server     (vmn_tpu.cli.vhttp)

Usage: python -m vmn_tpu.cli.main <command> [args...]
Each command is also runnable as python -m vmn_tpu.cli.<command>.
"""

from __future__ import annotations

import sys

_COMMANDS = ("vmni", "vmn", "vmnv", "vmnc", "vmnd", "vre", "vbt",
             "vdemo", "vhttp", "vog")


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    # Multi-host launch: when the VMN_DIST_* triplet is set, join the
    # jax.distributed runtime BEFORE first device use so one party's
    # device work spans all processes (parallel/dist.py).
    from vmn_tpu.parallel import dist

    dist.init_from_env()
    cmd = argv[0]
    if cmd not in _COMMANDS:
        print(f"unknown command: {cmd}; one of {', '.join(_COMMANDS)}",
              file=sys.stderr)
        return 2
    import importlib

    mod = importlib.import_module(f"vmn_tpu.cli.{cmd}")
    return mod.main(argv[1:])


if __name__ == "__main__":
    sys.exit(main())
