"""CRC32 (reflected 0xEDB88320) table + streaming digest.

Capability parity with the reference's SevenZip/CRC.java:8-46.  The table
doubles as the BT4 hash mixer (BinTree.java:381), so it must be the
standard reflected CRC32 table.  Digest computation delegates to
zlib.crc32 (same polynomial) for speed; the table itself is built locally
because the match finder needs the raw entries.
"""

from __future__ import annotations

import zlib

import numpy as np


def _build_table() -> np.ndarray:
    table = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        r = i
        for _ in range(8):
            r = (r >> 1) ^ (0xEDB88320 if (r & 1) else 0)
        table[i] = r
    return table


CRC_TABLE = _build_table()


class CRC:
    """Streaming CRC32 with the reference's Init/Update/GetDigest surface."""

    def __init__(self):
        self._value = 0

    def init(self):
        self._value = 0

    def update(self, data) -> None:
        self._value = zlib.crc32(bytes(data), self._value)

    def update_byte(self, b: int) -> None:
        self._value = zlib.crc32(bytes([b & 0xFF]), self._value)

    def digest(self) -> int:
        return self._value & 0xFFFFFFFF


def crc32(data) -> int:
    return zlib.crc32(bytes(data)) & 0xFFFFFFFF
