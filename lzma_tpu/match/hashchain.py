"""HC4 hash-chain match finder — the fast path.

The reference ships only BT2/BT4 (BinTree.java:59-70); HC4 is our
additional fast finder (named in BASELINE.json config 0): same 4-byte
CRC-mixed hash as BT4, but a singly-linked chain per bucket instead of a
binary tree — O(cut) probes with no reordering, ~3-4x faster inserts at
lower match quality.  Same interface as BinTreeMatchFinder so the encoder
is finder-agnostic.
"""

from __future__ import annotations

from array import array

from ..utils.crc import CRC_TABLE

_HASH2_SIZE = 1 << 10
_HASH3_SIZE = 1 << 16
_HASH3_OFFSET = _HASH2_SIZE
_CRC = [int(x) for x in CRC_TABLE]


class HashChainMatchFinder:
    def __init__(self, buf: bytes, dict_size: int, match_max_len: int):
        self.buf = buf
        self.n = len(buf)
        self.pos = 0
        self.match_max_len = match_max_len
        self.cut_value = 8 + (match_max_len >> 2)
        # same never-wraps clamp as the native MatchFinder (lzma_core.cpp):
        # O(len) chain storage instead of O(dict) on small blocks
        self.cyclic_size = min(dict_size, self.n) + 1
        self.cyclic_pos = 0
        hs = dict_size - 1
        hs |= hs >> 1
        hs |= hs >> 2
        hs |= hs >> 4
        hs |= hs >> 8
        hs >>= 1
        hs |= 0xFFFF
        if hs > (1 << 24):
            hs >>= 1
        self.hash_mask = hs
        self.fix_hash_size = _HASH2_SIZE + _HASH3_SIZE
        self.hash = array("i", bytes(4 * (hs + 1 + self.fix_hash_size)))
        self.chain = array("i", bytes(4 * self.cyclic_size))

    def available(self) -> int:
        return self.n - self.pos

    def get_byte(self, offset: int) -> int:
        return self.buf[self.pos + offset]

    def get_match_len(self, index: int, distance: int, limit: int) -> int:
        avail = self.n - (self.pos + index)
        if limit > avail:
            limit = avail
        buf = self.buf
        a = self.pos + index
        b = a - distance - 1
        i = 0
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

    def find_matches(self) -> list:
        n, pos, buf = self.n, self.pos, self.buf
        if pos + self.match_max_len <= n:
            len_limit = self.match_max_len
        else:
            len_limit = n - pos
            if len_limit < 4:
                self._advance()
                return []

        match_min_pos = pos - self.cyclic_size if pos > self.cyclic_size else 0
        hsh = self.hash
        temp = _CRC[buf[pos]] ^ buf[pos + 1]
        hash2 = temp & (_HASH2_SIZE - 1)
        temp ^= buf[pos + 2] << 8
        hash3 = temp & (_HASH3_SIZE - 1)
        hash_value = (temp ^ (_CRC[buf[pos + 3]] << 5)) & self.hash_mask

        # short-candidate fast path, same dedup rules as the BT4 finder
        matches = []
        max_len = 1
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

        hsh[self.fix_hash_size + hash_value] = pos
        self.chain[self.cyclic_pos] = cur_match

        count = self.cut_value
        chain = self.chain
        cyclic_size = self.cyclic_size
        while cur_match > match_min_pos and count > 0:
            count -= 1
            delta = pos - cur_match
            # probe: extend from current max_len (cheap reject on mismatch there)
            if max_len < len_limit and buf[cur_match + max_len] == buf[pos + max_len]:
                length = 0
                while length < len_limit and buf[cur_match + length] == buf[pos + length]:
                    length += 1
                if length > max_len:
                    max_len = length
                    matches.append([length, delta - 1])
                    if length == len_limit:
                        break
            cyc = (
                self.cyclic_pos - delta
                if delta <= self.cyclic_pos
                else self.cyclic_pos - delta + cyclic_size
            )
            cur_match = chain[cyc]
        self._advance()
        return matches

    def skip(self, num: int):
        n, buf = self.n, self.buf
        hsh, chain = self.hash, self.chain
        for _ in range(num):
            pos = self.pos
            if pos + 4 > n:
                self._advance()
                continue
            temp = _CRC[buf[pos]] ^ buf[pos + 1]
            hsh[temp & (_HASH2_SIZE - 1)] = pos
            temp ^= buf[pos + 2] << 8
            hsh[_HASH3_OFFSET + (temp & (_HASH3_SIZE - 1))] = pos
            hash_value = (temp ^ (_CRC[buf[pos + 3]] << 5)) & self.hash_mask
            chain[self.cyclic_pos] = hsh[self.fix_hash_size + hash_value]
            hsh[self.fix_hash_size + hash_value] = pos
            self._advance()


class Fast4MatchFinder(HashChainMatchFinder):
    """FAST4 — the speed-profile chain finder (ours, no reference analogue).

    One multiplicative 4-byte hash, a 4-probe chain, candidates of length
    >= 4 only (the greedy/lazy parse's rep distances cover 2..3).  Must
    stay bit-identical to the native FAST4 (lzma_core.cpp MatchFinder)
    because cross-backend tests pin encoder output.
    """

    CUT = 4

    def __init__(self, buf: bytes, dict_size: int, match_max_len: int):
        super().__init__(buf, dict_size, match_max_len)
        self.cut_value = self.CUT
        self.fix_hash_size = 0
        self.hash = array("i", bytes(4 * (self.hash_mask + 1)))

    def _hash4(self, pos: int) -> int:
        v = int.from_bytes(self.buf[pos : pos + 4], "little")
        return ((v * 2654435761) & 0xFFFFFFFF) >> 8 & self.hash_mask

    def find_matches(self) -> list:
        n, pos, buf = self.n, self.pos, self.buf
        if pos + self.match_max_len <= n:
            len_limit = self.match_max_len
        else:
            len_limit = n - pos
            if len_limit < 4:
                self._advance()
                return []

        match_min_pos = pos - self.cyclic_size if pos > self.cyclic_size else 0
        hsh, chain = self.hash, self.chain
        hv = self._hash4(pos)
        cur_match = hsh[hv]
        hsh[hv] = pos
        chain[self.cyclic_pos] = cur_match

        matches = []
        max_len = 3  # chain candidates are 4-byte hashes; reps cover 2..3
        count = self.cut_value
        cyclic_size = self.cyclic_size
        while cur_match > match_min_pos and count > 0:
            count -= 1
            delta = pos - cur_match
            if max_len < len_limit and buf[cur_match + max_len] == buf[pos + max_len]:
                length = 0
                while length < len_limit and buf[cur_match + length] == buf[pos + length]:
                    length += 1
                if length > max_len:
                    max_len = length
                    matches.append([length, delta - 1])
                    if length == len_limit:
                        break
            cyc = (
                self.cyclic_pos - delta
                if delta <= self.cyclic_pos
                else self.cyclic_pos - delta + cyclic_size
            )
            cur_match = chain[cyc]
        self._advance()
        return matches

    def skip(self, num: int):
        n = self.n
        hsh, chain = self.hash, self.chain
        for _ in range(num):
            pos = self.pos
            if pos + 4 > n:
                self._advance()
                continue
            hv = self._hash4(pos)
            chain[self.cyclic_pos] = hsh[hv]
            hsh[hv] = pos
            self._advance()
