"""Relational query surface exercised by the correctness harness."""

from .relational import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
