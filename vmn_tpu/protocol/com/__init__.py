"""Distributed communication backend (reference: VCR protocol.com).

The bulletin board is the *only* channel between mutually-distrusting
mix-servers — it must never be replaced by device collectives
(reference: SURVEY.md §2.5 trust-boundary note).  Collectives are used
only inside a single party's pod slice.
"""

from vmn_tpu.protocol.com.board import (  # noqa: F401
    BulletinBoard,
    LocalBoardHub,
)
