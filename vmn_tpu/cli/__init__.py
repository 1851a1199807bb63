"""Operator command-line tools (reference: SURVEY.md §2.2 —
vtm/vmn/vmni/vmnv/vmnc/vmnd/vre/vbt command family)."""
