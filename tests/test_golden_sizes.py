"""Golden compressed-size/md5 parity vs the reference encoder.

The reference pins its encoder output exactly on the 916,960-byte
firefox.exe fixture for 12 flag configurations (LzmaAloneTest.java:27-38,
BASELINE.md).  Our encoder reproduces those bytes identically.  The full
12-config sweep takes minutes in the scalar Python path, so the default
test run pins the headline defaults config; set LZMA_TPU_FULL_GOLDEN=1
for the complete sweep (also exercised via the native backend once built).
"""

import hashlib
import os

import pytest

from lzma_tpu.codec.encoder import encode_alone
from lzma_tpu.format.properties import LzmaParams

from conftest import fixture_bytes, has_reference

BASE = dict(lc=3, lp=0, pb=2, dict_size=1 << 23, fast_bytes=128, match_finder="bt4")

# (override, size, md5) — LzmaAloneTest.java:27-38
GOLDEN = {
    "defaults": (dict(), 138940, "93c6983fcfa73e55099a11ee13139687"),
    "eos": (dict(write_eos=True), 138946, "4b9287512dcf72b094abafbd5fbfda85"),
    "d0": (dict(dict_size=1), 356822, "385ef9694b5d0640fd372c99cec1d575"),
    "fb5": (dict(fast_bytes=5), 150508, "81b9ab49744b242c4e5a0274ae5a83d3"),
    "fb273": (dict(fast_bytes=273), 138711, "44e59bfa0128c6dcfde164598e180e92"),
    "lc0": (dict(lc=0), 143351, "8ebbd8dc6c1a1dd2c1803659a4a2b978"),
    "lc8": (dict(lc=8), 144829, "f7a9f4ce9c7853c07445b41cca75c58c"),
    "lp1": (dict(lp=1), 137620, "27fba851ee64468dc5391d4a0f430ab7"),
    "lp4": (dict(lp=4), 141530, "377337634457f7017760e45129760c7d"),
    "pb0": (dict(pb=0), 142879, "563da117b34b52358e24d6e5b16d093d"),
    "pb4": (dict(pb=4), 140046, "cbbff9f4722065bec54336a7d3d49832"),
    "bt2": (dict(match_finder="bt2"), 138877, "126f88731f968265bf163b7f7b5521db"),
}

_FULL = os.environ.get("LZMA_TPU_FULL_GOLDEN") == "1"
_CASES = list(GOLDEN) if _FULL else ["defaults"]


@pytest.mark.skipif(not has_reference(), reason="reference fixture not mounted")
@pytest.mark.parametrize("name", _CASES)
def test_golden_parity(name):
    over, size, md5 = GOLDEN[name]
    comp = encode_alone(fixture_bytes(), LzmaParams(**{**BASE, **over}))
    assert len(comp) == size
    assert hashlib.md5(comp).hexdigest() == md5


# Default-CI scalar sweep over a 64 KB fixture prefix (VERDICT r1 item 10):
# the full-fixture sweep above is env-gated for cost, which would let a
# scalar-oracle regression on a non-default config hide behind the native
# backend.  These sizes/md5s are frozen from the scalar oracle at the
# round-1-verified state (whose full-fixture output is pinned to the
# reference's exact bytes above); ~8 s total.
PREFIX_GOLDEN = {
    "d0": (dict(dict_size=1), 25027, "4da9088942d6bf7caa5a83890d448ec1"),
    "fb5": (dict(fast_bytes=5), 19703, "2306ff42bd7d4a31ce0c3a7f11a09b1c"),
    "bt2": (dict(match_finder="bt2"), 18445, "342a1ad4e138a0981062ef241b4e0045"),
    "lc0": (dict(lc=0), 18673, "7873f3ecaa2bb2f3896ee6f151ca45a7"),
    "pb0": (dict(pb=0), 18664, "ddb4a50d33a0c4013e3640889e288cee"),
}


@pytest.mark.skipif(not has_reference(), reason="reference fixture not mounted")
@pytest.mark.parametrize("name", list(PREFIX_GOLDEN))
def test_scalar_prefix_golden(name):
    over, size, md5 = PREFIX_GOLDEN[name]
    data = fixture_bytes()[: 1 << 16]
    comp = encode_alone(data, LzmaParams(**{**BASE, **over}))
    assert len(comp) == size
    assert hashlib.md5(comp).hexdigest() == md5
    # cross-backend: the native coder must produce the identical bytes
    try:
        from lzma_tpu.runtime import native

        if native.available():
            assert native.encode_alone(data, LzmaParams(**{**BASE, **over})) == comp
    except ImportError:
        pass
