"""Mix-net application layer (reference: protocol.mixnet)."""
