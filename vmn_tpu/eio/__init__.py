from vmn_tpu.eio.bytetree import (
    ByteTree,
    ByteTreeError,
    leaf,
    node,
    int_leaf,
    string_leaf,
    fixed_int_leaf,
    signed_int_leaf,
)
from vmn_tpu.eio.marshal import marshal, unmarshal, marshal_hex, unmarshal_hex

__all__ = [
    "ByteTree",
    "ByteTreeError",
    "leaf",
    "node",
    "int_leaf",
    "string_leaf",
    "fixed_int_leaf",
    "signed_int_leaf",
    "marshal",
    "unmarshal",
    "marshal_hex",
    "unmarshal_hex",
]
