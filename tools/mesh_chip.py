"""Real-chip validation of the per-shard Pallas mesh decode.

Single-device TPU mesh (this rig has one chip): the point is that the
ring kernel lowers and round-trips INSIDE shard_map on hardware, with
the XLA fallback disabled so a silent reroute cannot mask a failure.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
import numpy as np

from lzma_tpu.format.properties import LzmaParams
from lzma_tpu.parallel import mesh as M


def corpus(n, seed=17):
    import random
    rng = random.Random(seed)
    words = [bytes(rng.randrange(256) for _ in range(rng.randrange(5, 25)))
             for _ in range(40)]
    b = bytearray()
    while len(b) < n:
        b += words[rng.randrange(40)]
    return bytes(b[:n])


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    msh = M.make_mesh(jax.devices()[:1])
    data = corpus(256 << 10)
    p = LzmaParams(dict_size=1 << 12, fast_bytes=16)

    def boom(*a, **k):
        raise AssertionError("XLA fallback used")

    M._decode_step = boom
    M._decode_step_preset = boom

    blob = M.encode_blocks_mesh(data, p, block_size=1 << 14, mesh=msh)
    assert M.decode_blocks_mesh(blob, mesh=msh, use_pallas=True) == data
    print("mesh pallas decode: ok (plain)", flush=True)

    blob3 = M.encode_blocks_mesh(data, p, block_size=1 << 14, mesh=msh,
                                 dictionary=data[:1024])
    assert M.decode_blocks_mesh(blob3, mesh=msh, use_pallas=True) == data
    print("mesh pallas decode: ok (v3 stored dictionary broadcast)",
          flush=True)

    # encode side: per-shard Pallas serializer, XLA fallback disabled
    M._encode_step = boom
    M._encode_step_preset = boom
    blob_e = M.encode_blocks_mesh(data, p, block_size=1 << 14, mesh=msh,
                                  use_pallas=True)
    assert M.decode_blocks_mesh(blob_e, mesh=msh, use_pallas=True) == data
    print("mesh pallas encode: ok (plain)", flush=True)
    blob_e3 = M.encode_blocks_mesh(data, p, block_size=1 << 14, mesh=msh,
                                   dictionary=data[:1024], use_pallas=True)
    assert M.decode_blocks_mesh(blob_e3, mesh=msh, use_pallas=True) == data
    print("mesh pallas encode: ok (v3 dictionary broadcast)", flush=True)


if __name__ == "__main__":
    main()
