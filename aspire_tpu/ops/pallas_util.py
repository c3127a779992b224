"""Shared helpers for the pallas kernels."""
from __future__ import annotations


def round_up(x: int, m: int) -> int:
    """Smallest multiple of m >= x (sublane/lane tile alignment)."""
    return -(-x // m) * m
