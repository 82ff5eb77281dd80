"""Placeholder — populated in a later milestone this round."""

QUERIES: dict = {}
ORACLES: dict = {}
