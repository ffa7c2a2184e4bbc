"""LZMA coder properties: the 5-byte header codec + validated parameter set.

Props byte = (pb*5 + lp)*9 + lc followed by 4-byte LE dictionary size
(Encoder.WriteCoderProperties, Encoder.java:1079-1085; parsed by
Decoder.SetDecoderProperties, Decoder.java:303-318).

Validation mirrors the reference's asymmetry: encoding accepts lc 0..8,
lp 0..4, pb 0..4, dict 2^0..2^29, fb 5..273 (Encoder.java:1135-1180);
decoding accepts lc<=8, lp<=4, pb<=4 and any u32 dict size
(Decoder.java:160-182).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from ..core.constants import (
    DICT_LOG_SIZE_MAX_COMPRESS,
    MATCH_MAX_LEN,
    NUM_LIT_CONTEXT_BITS_MAX,
    NUM_LIT_POS_BITS_MAX,
    NUM_POS_STATES_BITS_MAX,
)

PROPS_SIZE = 5

MF_BT2 = "bt2"
MF_BT4 = "bt4"
MF_HC4 = "hc4"   # fast hash-chain finder (ours; named in BASELINE.json configs)
MF_FAST4 = "fast4"  # speed-profile chain finder: 4-byte mul-hash only (ours)

DEFAULT_DICT_LOG = 22        # Encoder.java:26
DEFAULT_FAST_BYTES = 0x20    # Encoder.java:27
CLI_DEFAULT_DICT_LOG = 23    # LzmaAlone.java:24
CLI_DEFAULT_FAST_BYTES = 128  # LzmaAlone.java:31


@dataclass(frozen=True)
class LzmaParams:
    """Full encoder/decoder parameter set."""

    lc: int = 3
    lp: int = 0
    pb: int = 2
    dict_size: int = 1 << DEFAULT_DICT_LOG
    fast_bytes: int = DEFAULT_FAST_BYTES
    match_finder: str = MF_BT4
    write_eos: bool = False

    def validated_for_encode(self) -> "LzmaParams":
        if not (0 <= self.lc <= NUM_LIT_CONTEXT_BITS_MAX):
            raise ValueError(f"lc out of range 0..8: {self.lc}")
        if not (0 <= self.lp <= NUM_LIT_POS_BITS_MAX):
            raise ValueError(f"lp out of range 0..4: {self.lp}")
        if not (0 <= self.pb <= NUM_POS_STATES_BITS_MAX):
            raise ValueError(f"pb out of range 0..4: {self.pb}")
        if not (1 <= self.dict_size <= (1 << DICT_LOG_SIZE_MAX_COMPRESS)):
            raise ValueError(f"dict_size out of range 2^0..2^29: {self.dict_size}")
        if not (5 <= self.fast_bytes <= MATCH_MAX_LEN):
            raise ValueError(f"fast_bytes out of range 5..273: {self.fast_bytes}")
        if self.match_finder not in (MF_BT2, MF_BT4, MF_HC4, MF_FAST4):
            raise ValueError(f"unknown match finder: {self.match_finder}")
        return self

    @property
    def props_byte(self) -> int:
        return (self.pb * 5 + self.lp) * 9 + self.lc

    def encode_props(self) -> bytes:
        """5-byte properties header (Encoder.java:1079-1085)."""
        return bytes([self.props_byte]) + struct.pack("<I", self.dict_size)

    @property
    def dist_table_size(self) -> int:
        """2 * ceil(log2(dict_size)) slots priced (Encoder.java:1141-1144)."""
        log = 0
        while self.dict_size > (1 << log):
            log += 1
        return log * 2


def decode_props(props: bytes) -> LzmaParams:
    """Parse a 5-byte properties header (Decoder.java:303-318)."""
    if len(props) < PROPS_SIZE:
        raise ValueError("properties must be at least 5 bytes")
    val = props[0]
    lc = val % 9
    rem = val // 9
    lp = rem % 5
    pb = rem // 5
    if lc > NUM_LIT_CONTEXT_BITS_MAX or lp > 4 or pb > NUM_POS_STATES_BITS_MAX:
        raise ValueError(f"invalid properties byte {val:#x}")
    dict_size = struct.unpack("<I", props[1:5])[0]
    return LzmaParams(lc=lc, lp=lp, pb=pb, dict_size=dict_size)



#: Safely loose bound on LZMA's maximum expansion (output bytes per
#: compressed byte).  True worst case: with saturated probabilities a
#: range-coder decision costs ~-log2((2048-31)/2048) = 0.0219 bits, and a
#: rep0 len-273 match takes ~14-15 decisions (~0.32 bits) to emit 273
#: bytes -> ~6800x; measured on all-zero input this codec reaches ~4690x
#: (16 MiB -> 3578 B).  8192 covers the theoretical bound with margin —
#: the earlier 4096 REJECTED the encoder's own output on zeros.
MAX_EXPANSION = 8192


def validate_alone_size(out_size: int, payload_len: int) -> None:
    """Anti-DoS guard for the `.lzma` 8-byte size field: decoders that
    allocate the output up front must reject sizes impossible for the
    payload BEFORE allocating (see MAX_EXPANSION).  EOS-terminated
    streams (out_size < 0) are exempt — their decoders size memory as
    they go."""
    if out_size >= 0 and out_size > payload_len * MAX_EXPANSION + (1 << 16):
        from ..core.rangecoder import CorruptStreamError

        raise CorruptStreamError(
            "claimed .lzma size is impossible for this payload")
