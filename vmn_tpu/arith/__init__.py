from vmn_tpu.arith.limbs import (
    LIMB_BITS,
    LIMB_MASK,
    num_limbs,
    int_to_limbs,
    ints_to_limbs,
    limbs_to_int,
    limbs_to_ints,
    limbs_to_bytes_be,
    bytes_be_to_limbs,
)
from vmn_tpu.arith.mont import MontCtx

__all__ = [
    "LIMB_BITS",
    "LIMB_MASK",
    "num_limbs",
    "int_to_limbs",
    "ints_to_limbs",
    "limbs_to_int",
    "limbs_to_ints",
    "limbs_to_bytes_be",
    "bytes_be_to_limbs",
    "MontCtx",
]
