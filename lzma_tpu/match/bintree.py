"""BT2/BT4 binary-tree match finders over an in-memory block.

Semantics-exact reimplementation of the reference's hot loop
(BinTree.fillMatches0/Skip, BinTree.java:152-356): per position, insert
into a binary search tree ordered by suffix and return the ascending
(length, distance) match list, truncated by cutValue = 16 + fb/2
(BinTree.java:98).  BT4 fast-paths length-2/3 candidates through 10-bit /
16-bit CRC-mixed sub-hashes (BinTree.java:170-207).  Exactness matters:
the encoder's golden compressed sizes depend on the precise match lists.

Differences from the reference by design (block-parallel architecture):
the block is fully resident, so the streaming InWindow (MoveBlock /
ReadBlock / position renormalization at 2^30, InWindow.java:24-63,
BinTree.java:358-375) collapses to direct buffer indexing.  Blocks are
capped far below 2^30 so no normalization is needed.
"""

from __future__ import annotations

from array import array

from ..utils.crc import CRC_TABLE

_HASH2_SIZE = 1 << 10
_HASH3_SIZE = 1 << 16
_BT2_HASH_SIZE = 1 << 16
_HASH3_OFFSET = _HASH2_SIZE
_EMPTY = 0
_CRC = [int(x) for x in CRC_TABLE]


class BinTreeMatchFinder:
    """Exact BT2/BT4 finder.  `num_hash_bytes` = 2 (BT2) or 4 (BT4)."""

    def __init__(self, buf: bytes, dict_size: int, match_max_len: int, num_hash_bytes: int = 4):
        self.buf = buf
        self.n = len(buf)
        self.pos = 0
        self.match_max_len = match_max_len
        self.cut_value = 16 + (match_max_len >> 1)   # BinTree.java:98
        # when dict >= len the window never wraps, so the cyclic buffer only
        # needs len+1 slots — identical match behavior (same clamp as the
        # native MatchFinder, lzma_core.cpp); hash sizing stays dict-derived
        # so hash values remain bit-identical to the reference's
        self.cyclic_size = min(dict_size, self.n) + 1
        self.cyclic_pos = 0
        self.hash_array = num_hash_bytes > 2          # BinTree.SetType (java:59-70)
        if self.hash_array:
            self.num_direct_bytes = 0
            self.min_match_check = 4
            self.fix_hash_size = _HASH2_SIZE + _HASH3_SIZE
            hs = dict_size - 1                        # BinTree.java:115-128
            hs |= hs >> 1
            hs |= hs >> 2
            hs |= hs >> 4
            hs |= hs >> 8
            hs >>= 1
            hs |= 0xFFFF
            if hs > (1 << 24):
                hs >>= 1
            self.hash_mask = hs
            hash_size = hs + 1 + self.fix_hash_size
        else:
            self.num_direct_bytes = 2
            self.min_match_check = 3
            self.fix_hash_size = 0
            self.hash_mask = 0
            hash_size = _BT2_HASH_SIZE
        self.hash = array('i', bytes(4 * hash_size))
        self.son = array('i', bytes(8 * self.cyclic_size))

    # ------------------------------------------------------------------
    def available(self) -> int:
        return self.n - self.pos

    def get_byte(self, offset: int) -> int:
        return self.buf[self.pos + offset]

    def get_match_len(self, index: int, distance: int, limit: int) -> int:
        """Common-prefix length at pos+index vs distance+1 back (InWindow.java:120-134)."""
        avail = self.n - (self.pos + index)
        if limit > avail:
            limit = avail
        buf = self.buf
        a = self.pos + index
        b = a - distance - 1
        i = 0
        # chunked fast path, then byte-exact tail
        while i + 8 <= limit and buf[a + i : a + i + 8] == buf[b + i : b + i + 8]:
            i += 8
        while i < limit and buf[a + i] == buf[b + i]:
            i += 1
        return i

    def _advance(self):
        self.cyclic_pos += 1
        if self.cyclic_pos >= self.cyclic_size:
            self.cyclic_pos = 0
        self.pos += 1

    # ------------------------------------------------------------------
    def find_matches(self) -> list:
        """Match list for the current position, then advance by one.

        Returns [(length, distance), ...] with strictly increasing length —
        the exact list the reference's fillMatches0 produces
        (BinTree.java:152-273).
        """
        n, pos, buf = self.n, self.pos, self.buf
        if pos + self.match_max_len <= n:
            len_limit = self.match_max_len
        else:
            len_limit = n - pos
            if len_limit < self.min_match_check:
                self._advance()
                return []

        match_min_pos = pos - self.cyclic_size if pos > self.cyclic_size else 0
        matches = []
        max_len = 1  # kStartMaxLen
        son, hsh = self.son, self.hash

        if self.hash_array:
            temp = _CRC[buf[pos]] ^ buf[pos + 1]
            hash2 = temp & (_HASH2_SIZE - 1)
            temp ^= buf[pos + 2] << 8
            hash3 = temp & (_HASH3_SIZE - 1)
            hash_value = (temp ^ (_CRC[buf[pos + 3]] << 5)) & self.hash_mask

            cur_match = hsh[self.fix_hash_size + hash_value]
            cur_match2 = hsh[hash2]
            cur_match3 = hsh[_HASH3_OFFSET + hash3]
            hsh[hash2] = pos
            hsh[_HASH3_OFFSET + hash3] = pos
            if cur_match2 > match_min_pos and buf[cur_match2] == buf[pos]:
                max_len = 2
                matches.append([2, pos - cur_match2 - 1])
            if cur_match3 > match_min_pos and buf[cur_match3] == buf[pos]:
                if cur_match3 == cur_match2:
                    matches.pop()
                max_len = 3
                matches.append([3, pos - cur_match3 - 1])
                cur_match2 = cur_match3
            if matches and cur_match2 == cur_match:
                matches.pop()
                max_len = 1
        else:
            hash_value = buf[pos] ^ (buf[pos + 1] << 8)
            cur_match = hsh[self.fix_hash_size + hash_value]

        hsh[self.fix_hash_size + hash_value] = pos

        ptr0 = (self.cyclic_pos << 1) + 1
        ptr1 = self.cyclic_pos << 1
        len0 = len1 = self.num_direct_bytes

        if self.num_direct_bytes != 0 and cur_match > match_min_pos:
            if buf[cur_match + self.num_direct_bytes] != buf[pos + self.num_direct_bytes]:
                max_len = self.num_direct_bytes
                matches.append([self.num_direct_bytes, pos - cur_match - 1])

        count = self.cut_value
        cyclic_pos_cur = self.cyclic_pos
        cyclic_size = self.cyclic_size
        while True:
            if cur_match <= match_min_pos or count == 0:
                son[ptr0] = _EMPTY
                son[ptr1] = _EMPTY
                break
            count -= 1
            delta = pos - cur_match
            cyclic = (
                (cyclic_pos_cur - delta)
                if delta <= cyclic_pos_cur
                else (cyclic_pos_cur - delta + cyclic_size)
            ) << 1
            length = len0 if len0 < len1 else len1
            if buf[cur_match + length] == buf[pos + length]:
                length += 1
                while length != len_limit and buf[cur_match + length] == buf[pos + length]:
                    length += 1
                if max_len < length:
                    max_len = length
                    matches.append([length, delta - 1])
                    if length == len_limit:
                        son[ptr1] = son[cyclic]
                        son[ptr0] = son[cyclic + 1]
                        break
            if buf[cur_match + length] < buf[pos + length]:
                son[ptr1] = cur_match
                ptr1 = cyclic + 1
                cur_match = son[ptr1]
                len1 = length
            else:
                son[ptr0] = cur_match
                ptr0 = cyclic
                cur_match = son[ptr0]
                len0 = length
        self._advance()
        return matches

    # ------------------------------------------------------------------
    def skip(self, num: int):
        """Insert `num` positions without collecting matches (BinTree.java:275-356)."""
        n, buf = self.n, self.buf
        son, hsh = self.son, self.hash
        for _ in range(num):
            pos = self.pos
            if pos + self.match_max_len <= n:
                len_limit = self.match_max_len
            else:
                len_limit = n - pos
                if len_limit < self.min_match_check:
                    self._advance()
                    continue

            match_min_pos = pos - self.cyclic_size if pos > self.cyclic_size else 0
            if self.hash_array:
                temp = _CRC[buf[pos]] ^ buf[pos + 1]
                hsh[temp & (_HASH2_SIZE - 1)] = pos
                temp ^= buf[pos + 2] << 8
                hsh[_HASH3_OFFSET + (temp & (_HASH3_SIZE - 1))] = pos
                hash_value = (temp ^ (_CRC[buf[pos + 3]] << 5)) & self.hash_mask
            else:
                hash_value = buf[pos] ^ (buf[pos + 1] << 8)

            cur_match = hsh[self.fix_hash_size + hash_value]
            hsh[self.fix_hash_size + hash_value] = pos

            ptr0 = (self.cyclic_pos << 1) + 1
            ptr1 = self.cyclic_pos << 1
            len0 = len1 = self.num_direct_bytes
            count = self.cut_value
            cyclic_pos_cur = self.cyclic_pos
            cyclic_size = self.cyclic_size
            while True:
                if cur_match <= match_min_pos or count == 0:
                    son[ptr0] = _EMPTY
                    son[ptr1] = _EMPTY
                    break
                count -= 1
                delta = pos - cur_match
                cyclic = (
                    (cyclic_pos_cur - delta)
                    if delta <= cyclic_pos_cur
                    else (cyclic_pos_cur - delta + cyclic_size)
                ) << 1
                length = len0 if len0 < len1 else len1
                if buf[cur_match + length] == buf[pos + length]:
                    length += 1
                    while length != len_limit and buf[cur_match + length] == buf[pos + length]:
                        length += 1
                    if length == len_limit:
                        son[ptr1] = son[cyclic]
                        son[ptr0] = son[cyclic + 1]
                        break
                if buf[cur_match + length] < buf[pos + length]:
                    son[ptr1] = cur_match
                    ptr1 = cyclic + 1
                    cur_match = son[ptr1]
                    len1 = length
                else:
                    son[ptr0] = cur_match
                    ptr0 = cyclic
                    cur_match = son[ptr0]
                    len0 = length
            self._advance()
