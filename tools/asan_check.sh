#!/usr/bin/env bash
# AddressSanitizer sweep of the native runtime: builds an ASAN variant of
# liblzma_tpu_native.so, runs every JAX-free test battery that exercises
# it (golden configs, fuzzers incl. forged/corrupt containers, presets,
# file streaming), then restores the optimized library.
#
# JAX device tests are excluded: XLA's compiler aborts under ASAN's
# interceptors (deep MLIR recursion), unrelated to this library.
set -euo pipefail
cd "$(dirname "$0")/.."

LIB=lzma_tpu/runtime/liblzma_tpu_native.so
ASAN_SO=$(g++ -print-file-name=libasan.so)
TMP=$(mktemp -d)
trap 'cp "$TMP/real.so" "$LIB" 2>/dev/null || true; touch "$LIB"; rm -rf "$TMP"' EXIT

python -m lzma_tpu.runtime.build >/dev/null   # ensure the real lib exists
cp "$LIB" "$TMP/real.so"
g++ -O1 -g -std=c++17 -fPIC -shared -fsanitize=address \
    -fno-omit-frame-pointer -pthread \
    lzma_tpu/runtime/src/lzma_core.cpp -o "$LIB"
touch -r lzma_tpu/runtime/src/lzma_core.cpp "$LIB"  # defeat mtime rebuild

LD_PRELOAD="$ASAN_SO" ASAN_OPTIONS=detect_leaks=0 \
python -m pytest -q -p no:cacheprovider \
    tests/test_native.py tests/test_fuzz.py tests/test_golden_sizes.py \
    tests/test_filestream.py tests/test_fileobj.py tests/test_streaming.py \
    "tests/test_preset.py::test_native_matches_scalar" \
    "tests/test_preset.py::test_container_v2_round_trip_native" \
    "tests/test_preset.py::test_native_eos_preset_decode" \
    tests/test_dicttrain.py \
    --deselect tests/test_dicttrain.py::test_v3_device_and_mesh \
    --deselect tests/test_dicttrain.py::test_v3_hybrid
echo "ASAN sweep clean"

# ASan pass with a tiny normalize threshold so the streaming finder's
# position-rebase path (BinTree.Normalize analogue) runs every ~1 MB
g++ -O1 -g -std=c++17 -fPIC -shared -fsanitize=address \
    -fno-omit-frame-pointer -pthread -DLZT_NORMALIZE_LIMIT='(1<<20)' \
    lzma_tpu/runtime/src/lzma_core.cpp -o "$LIB"
touch -r lzma_tpu/runtime/src/lzma_core.cpp "$LIB"
LD_PRELOAD="$ASAN_SO" ASAN_OPTIONS=detect_leaks=0 \
python -m pytest -q -p no:cacheprovider tests/test_streaming.py
echo "ASAN normalize-path sweep clean"

# UBSan pass (signed-overflow/shift UB; unsigned range-coder wrap is defined)
g++ -O1 -g -std=c++17 -fPIC -shared -fsanitize=undefined \
    -fno-sanitize-recover=undefined -pthread \
    lzma_tpu/runtime/src/lzma_core.cpp -o "$LIB"
touch -r lzma_tpu/runtime/src/lzma_core.cpp "$LIB"
LD_PRELOAD=$(g++ -print-file-name=libubsan.so) \
python -m pytest -q -p no:cacheprovider \
    tests/test_native.py tests/test_fuzz.py tests/test_golden_sizes.py
echo "UBSan sweep clean"

# TSan pass over the threaded block codec (atomics-only work distribution)
g++ -O1 -g -std=c++17 -fPIC -shared -fsanitize=thread -pthread \
    lzma_tpu/runtime/src/lzma_core.cpp -o "$LIB"
touch -r lzma_tpu/runtime/src/lzma_core.cpp "$LIB"
LD_PRELOAD=$(g++ -print-file-name=libtsan.so) TSAN_OPTIONS="exitcode=66" \
python - <<'PYEOF'
from lzma_tpu.bench.datagen import generate_bench_data
from lzma_tpu.format.properties import LzmaParams
from lzma_tpu.runtime import native

data = generate_bench_data(4 << 20)
for mf, opt, ps in [("hc4", False, 0), ("bt4", True, 0), ("bt4", True, 1 << 16)]:
    p = LzmaParams(dict_size=1 << 18, fast_bytes=16, match_finder=mf)
    blob = native.encode_blocks(data, p, block_size=1 << 17, num_threads=4,
                                optimal=opt, preset_len=ps)
    assert native.decode_blocks(blob, num_threads=4) == data
# LZTB v3: every worker reads the shared stored dictionary
p = LzmaParams(dict_size=1 << 18, fast_bytes=16, match_finder="bt4")
blob = native.encode_blocks(data, p, block_size=1 << 17, num_threads=4,
                            dictionary=data[: 1 << 14])
assert native.decode_blocks(blob, num_threads=4) == data
print("threaded round trips clean under TSan")
PYEOF
echo "TSan sweep clean"
