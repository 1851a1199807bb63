"""Verifiable secret sharing (Pedersen/Feldman over the exponent ring).

Rebuild of the reference `protocol.secretsharing` package (reference:
Pedersen.java:77, PedersenBasic.java:68, PedersenSequential.java:47,
ShamirBasic.java:47, PolynomialInExponent.java:54).
"""

from vmn_tpu.protocol.secretsharing.shamir import (  # noqa: F401
    lagrange_at_zero,
    shamir_recover,
)
from vmn_tpu.protocol.secretsharing.pedersen import (  # noqa: F401
    PedersenError,
    PedersenResult,
    SequentialResult,
    run_pedersen,
    run_pedersen_sequential,
    recover_secret,
    trivial_result,
)
