from vmn_tpu.crypto.hash import Hashfunction, SHA256, SHA384, SHA512
from vmn_tpu.crypto.prg import PRG, PRGHeuristic
from vmn_tpu.crypto.ro import RandomOracle
from vmn_tpu.crypto.randomsource import RandomSource, RandomDevice, SeededSource

__all__ = [
    "Hashfunction",
    "SHA256",
    "SHA384",
    "SHA512",
    "PRG",
    "PRGHeuristic",
    "RandomOracle",
    "RandomSource",
    "RandomDevice",
    "SeededSource",
]
