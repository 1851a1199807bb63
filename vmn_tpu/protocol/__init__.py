"""Protocol layer: El Gamal, zero-knowledge proofs, mix-net sessions.

Mirrors the reference's com.verificatum.protocol.* packages
(reference: SURVEY.md §1 layers 3-5).
"""
