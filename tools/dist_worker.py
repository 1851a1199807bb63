"""Multi-process SPMD mix worker — the CPU dryrun proxy for multi-host.

Each process runs the SAME single-party mix with the ciphertext axis
sharded over the GLOBAL device mesh (all processes' devices); XLA
inserts the cross-process collectives.  Every process writes its own
transcript copy; the launcher (tests/test_dist.py) asserts the copies
are byte-identical and verify with the standalone verifier — proving
the device work really ran as one SPMD program over ≥2 processes.

Usage:
    VMN_DIST_COORD=localhost:PORT VMN_DIST_NPROC=2 VMN_DIST_PROCID=i \
    XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    JAX_PLATFORMS=cpu python tools/dist_worker.py <workdir> <N>

Reference analogue: VCR's transparent array-op parallelism distributed
over hosts (demo/mixnet/macros:256-277; SURVEY.md §2.5).
"""

import hashlib
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    workdir = Path(sys.argv[1])
    n = int(sys.argv[2])

    from vmn_tpu.parallel import dist

    assert dist.init_from_env(), "VMN_DIST_* env required"
    import jax

    pid = jax.process_index()

    import numpy as np

    from vmn_tpu.arith.pgroup import ModPGroup
    from vmn_tpu.crypto.hash import SHA256
    from vmn_tpu.crypto.prg import PRGHeuristic
    from vmn_tpu.crypto.randomsource import SeededSource
    from vmn_tpu.parallel.mesh import ciph_mesh
    from vmn_tpu.protocol import elgamal
    from vmn_tpu.protocol.com.board import LocalBoardHub
    from vmn_tpu.protocol.context import ProtocolParams
    from vmn_tpu.protocol.mixnet.party import MixNetParty

    group = ModPGroup.named("test256")
    params = ProtocolParams(sid="Dist", k=1, threshold=1, pgroup=group)
    hub = LocalBoardHub(1)
    rs = SeededSource(b"dist-party")  # identical across processes
    mydir = workdir / f"proc{pid}"
    mydir.mkdir(parents=True, exist_ok=True)
    party = MixNetParty(params, hub.board(1), rs, str(mydir))
    pk = party.keygen()

    prg = PRGHeuristic(SHA256)
    prg.set_seed(SHA256.hash(b"dist-msgs"))
    m = group.random_array(n, prg, params.rbitlen)
    enc_rs = SeededSource(b"dist-encrypt")
    r = group.ring.random((n,), enc_rs, 0)
    ciphs = elgamal.encrypt(pk, m, r)

    # global mesh over ALL processes' devices; shard the batch axis
    mesh = ciph_mesh()
    assert mesh.devices.size >= 2 * jax.local_device_count() or \
        jax.process_count() == 1
    ciphs = dist.shard_array_global(ciphs, mesh)

    session = party.session("dist", 1)
    plain = session.mix(ciphs)
    got = sorted(plain.to_ints())
    want = sorted(m.to_ints())
    ok = got == want

    # transcript digest: stable order over the nizkp directory
    nz = mydir / "nizkp.dist"
    h = hashlib.sha256()
    for f in sorted(nz.rglob("*")):
        if f.is_file():
            h.update(f.name.encode())
            h.update(f.read_bytes())
    print(f"DIST pid={pid} ok={ok} digest={h.hexdigest()}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
