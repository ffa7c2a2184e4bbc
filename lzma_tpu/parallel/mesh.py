"""Multi-chip block-parallel codec over a jax.sharding.Mesh.

The scaling design from SURVEY.md §5.7/§5.8: input chunked into
independent LZMA block streams, sharded over the mesh's "blocks" axis
(data parallelism — the only axis that makes sense for a codec whose
streams are serial), each device running the lane-parallel kernels
(ops/device_*.py) on its local shard, then an ordered ragged gather:
compressed sizes first (tiny all_gather over ICI), then the padded
payload buffers (one all_gather), with the host doing the final ordered
concat + container framing.  Multi-host works unchanged: jax.distributed
initializes the global mesh and the same all_gathers ride ICI within a
slice and DCN across slices.

Replaces: nothing in the reference — it is single-threaded end to end
(SURVEY.md §2 "Parallelism inventory: none").
"""

from __future__ import annotations

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..format.properties import LzmaParams
from ..parallel import blocks as blk
from ..ops.device_encoder import DEFAULT_NUM_CANDIDATES, encode_lanes
from ..ops.device_decoder import _decode_fsm

logger = logging.getLogger("lzma_tpu.mesh")

BLOCK_AXIS = "blocks"


def make_mesh(devices=None, axis: str = BLOCK_AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def _pad_lanes(num: int, num_devices: int) -> int:
    return ((num + num_devices - 1) // num_devices) * num_devices


@partial(jax.jit, static_argnames=("lc", "lp", "pb", "fb", "mesh_holder",
                                   "gather", "parse"))
def _encode_step(data, lens, dict_size, *, lc, lp, pb, fb, mesh_holder,
                 gather=True, parse="lazy"):
    """One sharded encode step: local lane-parallel encode + ordered gather.

    gather=True replicates the ragged results to every device with an
    all_gather (required on multi-host, where only addressable shards can
    be read back); gather=False leaves them block-sharded — the host
    reads each shard once over PCIe with NO collective at all, removing
    the O(devices x total) replication traffic (VERDICT r1 item 6; the
    single-host default).
    """
    mesh = mesh_holder.mesh

    def local(data_l, lens_l):
        comp, comp_lens = encode_lanes(
            data_l, lens_l, dict_size, lc=lc, lp=lp, pb=pb, fb=fb,
            parse=parse,
        )
        if not gather:
            return comp, comp_lens
        # ordered ragged gather: sizes first, then padded payloads
        all_lens = jax.lax.all_gather(comp_lens, BLOCK_AXIS, tiled=True)
        all_comp = jax.lax.all_gather(comp, BLOCK_AXIS, tiled=True)
        return all_comp, all_lens

    out_specs = ((P(None, None), P(None)) if gather
                 else (P(BLOCK_AXIS, None), P(BLOCK_AXIS)))
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS)),
        out_specs=out_specs,
        check_vma=False,  # loop carries start replicated, become device-varying
    )(data, lens)


@partial(jax.jit, static_argnames=("lc", "lp", "pb", "fb", "mesh_holder",
                                   "gather"))
def _encode_step_preset(data, lens, preset, dict_size, *, lc, lp, pb, fb,
                        mesh_holder, gather=True):
    """Sharded encode with a SHARED preset dictionary (LZTB v2).

    `preset` is replicated (in_specs P(None)): XLA broadcasts the
    dictionary to every device over ICI; each device then primes its
    local lanes' windows with it (SURVEY.md §5.8's broadcast).
    """
    mesh = mesh_holder.mesh

    def local(data_l, lens_l, preset_r):
        comp, comp_lens = encode_lanes(
            data_l, lens_l, dict_size, lc=lc, lp=lp, pb=pb, fb=fb,
            preset=preset_r,
        )
        if not gather:
            return comp, comp_lens
        all_lens = jax.lax.all_gather(comp_lens, BLOCK_AXIS, tiled=True)
        all_comp = jax.lax.all_gather(comp, BLOCK_AXIS, tiled=True)
        return all_comp, all_lens

    out_specs = ((P(None, None), P(None)) if gather
                 else (P(BLOCK_AXIS, None), P(BLOCK_AXIS)))
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS), P(None)),
        out_specs=out_specs,
        check_vma=False,  # loop carries start replicated, become device-varying
    )(data, lens, preset)


@partial(jax.jit, static_argnames=("lc", "lp", "pb", "max_out", "mesh_holder",
                                   "gather"))
def _decode_step(comp, comp_lens, out_sizes, dict_size, *, lc, lp, pb,
                 max_out, mesh_holder, gather=True):
    """One sharded decode step: local FSM decode + ordered gather."""
    mesh = mesh_holder.mesh

    def local(comp_l, lens_l, sizes_l):
        out, ok, _, _pos = _decode_fsm(
            comp_l, lens_l, sizes_l, dict_size, lc, lp, pb, max_out, 0
        )
        if not gather:
            return out, ok
        all_out = jax.lax.all_gather(out, BLOCK_AXIS, tiled=True)
        all_ok = jax.lax.all_gather(ok, BLOCK_AXIS, tiled=True)
        return all_out, all_ok

    out_specs = ((P(None, None), P(None)) if gather
                 else (P(BLOCK_AXIS, None), P(BLOCK_AXIS)))
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS), P(BLOCK_AXIS)),
        out_specs=out_specs,
        check_vma=False,  # loop carries start replicated, become device-varying
    )(comp, comp_lens, out_sizes)


@partial(jax.jit, static_argnames=("lc", "lp", "pb", "max_out", "mesh_holder",
                                   "gather"))
def _decode_step_preset(comp, comp_lens, out_sizes, preset, dict_size, *,
                        lc, lp, pb, max_out, mesh_holder, gather=True):
    """Sharded decode with a SHARED preset dictionary (LZTB v2).

    `preset` rides with in_specs P(None) — replicated, i.e. XLA
    broadcasts the dictionary to every device over ICI before the
    device-local FSMs start: exactly the "broadcast preset dictionaries"
    collective of the scaling design (SURVEY.md §5.8).
    """
    mesh = mesh_holder.mesh

    def local(comp_l, lens_l, sizes_l, preset_r):
        out, ok, _, _pos = _decode_fsm(
            comp_l, lens_l, sizes_l, dict_size, lc, lp, pb, max_out, 0,
            preset=preset_r,
        )
        if not gather:
            return out, ok
        all_out = jax.lax.all_gather(out, BLOCK_AXIS, tiled=True)
        all_ok = jax.lax.all_gather(ok, BLOCK_AXIS, tiled=True)
        return all_out, all_ok

    out_specs = ((P(None, None), P(None)) if gather
                 else (P(BLOCK_AXIS, None), P(BLOCK_AXIS)))
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS), P(BLOCK_AXIS), P(None)),
        out_specs=out_specs,
        check_vma=False,  # loop carries start replicated, become device-varying
    )(comp, comp_lens, out_sizes, preset)


@partial(jax.jit, static_argnames=("lc", "lp", "pb", "fb", "interpret",
                                   "plen", "mesh_holder", "gather"))
def _encode_step_pallas(data, lens, dict_size, *, lc, lp, pb, fb, interpret,
                        mesh_holder, preset=None, plen=0, gather=True):
    """Sharded encode where each device runs the full Pallas pipeline on
    its local shard — tokenize/classify/lower (XLA vector ops) feeding
    the in-VMEM Pallas serializer — with the same ordered gather and
    replicated-operand dictionary broadcast as the XLA step.  Returns
    (comp, comp_lens, ok); lanes the serializer could not finish inside
    its staging envelope re-encode host-side.

    Known caveat (MEASUREMENTS.md): the collectives force a single large
    executable here; on runtimes with constrained program residency
    (like this rig's relay) such a program re-uploads per call — the
    two-dispatch ops.device_encoder.encode_lanes_pallas is the
    single-host form that keeps each program resident across batches.
    """
    from ..core.layout import ProbLayout
    from ..ops.device_encoder import _lower_lanes
    from ..ops.pallas_serializer import serialize_pallas

    mesh = mesh_holder.mesh
    arena = ProbLayout(lc, lp, pb, pos_bits=pb).size

    def local(data_l, lens_l, *preset_r):
        ctx, bits, totals, max_out = _lower_lanes(
            data_l, lens_l, dict_size, lc, lp, pb, fb,
            DEFAULT_NUM_CANDIDATES, preset_r[0] if plen else None)
        out, olens, consumed = serialize_pallas(
            ctx, bits, totals, arena, max_out, interpret=interpret)
        ok = consumed == totals
        if not gather:
            return out, olens, ok
        all_out = jax.lax.all_gather(out, BLOCK_AXIS, tiled=True)
        all_lens = jax.lax.all_gather(olens, BLOCK_AXIS, tiled=True)
        all_ok = jax.lax.all_gather(ok, BLOCK_AXIS, tiled=True)
        return all_out, all_lens, all_ok

    in_specs = [P(BLOCK_AXIS, None), P(BLOCK_AXIS)]
    operands = [data, lens]
    if plen:
        in_specs.append(P(None))   # replicated: the ICI dictionary broadcast
        operands.append(preset)
    out_specs = ((P(None, None), P(None), P(None)) if gather
                 else (P(BLOCK_AXIS, None), P(BLOCK_AXIS), P(BLOCK_AXIS)))
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=out_specs,
        check_vma=False,  # loop carries start replicated, become device-varying
    )(*operands)


@partial(jax.jit, static_argnames=("dict_size", "lc", "lp", "pb", "max_out",
                                   "interpret", "plen", "mesh_holder",
                                   "gather"))
def _decode_step_pallas(comp, comp_lens, out_sizes, dict_size, *, lc, lp, pb,
                        max_out, interpret, mesh_holder, preset=None, plen=0,
                        gather=True):
    """Sharded decode where each device runs the ring-window Pallas kernel
    (ops/pallas_ring.py) on its local shard — the per-chip production
    decoder — with the same ordered gather and (for LZTB v2/v3) the same
    replicated-operand dictionary broadcast as the XLA FSM steps."""
    from ..ops.pallas_ring import decode_pallas_ring

    mesh = mesh_holder.mesh

    def local(comp_l, lens_l, sizes_l, *preset_r):
        out, ok, _ = decode_pallas_ring(
            comp_l.astype(jnp.int32), lens_l, sizes_l, dict_size, lc, lp, pb,
            max_out, interpret=interpret, stage_input=False,
            preset=(preset_r[0].astype(jnp.int32) if plen else None),
        )
        if not gather:
            return out, ok
        all_out = jax.lax.all_gather(out, BLOCK_AXIS, tiled=True)
        all_ok = jax.lax.all_gather(ok, BLOCK_AXIS, tiled=True)
        return all_out, all_ok

    in_specs = [P(BLOCK_AXIS, None), P(BLOCK_AXIS), P(BLOCK_AXIS)]
    operands = [comp, comp_lens, out_sizes]
    if plen:
        in_specs.append(P(None))   # replicated: the ICI dictionary broadcast
        operands.append(preset)
    out_specs = ((P(None, None), P(None)) if gather
                 else (P(BLOCK_AXIS, None), P(BLOCK_AXIS)))
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=out_specs,
        check_vma=False,  # loop carries start replicated, become device-varying
    )(*operands)


@partial(jax.jit, static_argnames=("fb", "cap", "tiers_key", "mesh_holder",
                                   "gather"))
def _hybrid_search_step(data, lens, dict_size, *, fb, cap, tiers_key,
                        mesh_holder, gather=False):
    """Sharded half of the FLAGSHIP encode: every device runs the
    multi-tier candidate search + device-side flatten on its local block
    shard (ops/device_matcher.find_match_lists + pack_match_lists); the
    packed fixed-shape results either stay block-sharded (single-host
    default — the host reads each shard once) or all_gather for
    multi-host coordinators, exactly like the other mesh steps."""
    from ..ops.device_matcher import pack_match_lists
    from ..ops.hybrid import _list_engine

    find_lists = _list_engine(fb)
    mesh = mesh_holder.mesh
    tiers = dict(tiers_key)

    def local(data_l, lens_l):
        def one(d, n):
            cl, cd, counts = find_lists(d, n, dict_size, fb, **tiers)
            return pack_match_lists(cl, cd, counts, cap)

        # Memory-bounded grouping (ADVICE r3 medium): one oversized
        # deep-tier dispatch crashes the TPU worker (observed at
        # 17 x 2^18 lanes), so the local lane batch is chunked to the
        # same ~2 MB-of-lane-data bound as ops/hybrid._match_lists_grouped.
        # lax.map lowers to a sequential loop, so only ONE group's search
        # intermediates are live at a time; idle zero lanes pad the last
        # group to a single stable shape.
        L, width = data_l.shape
        group = max(1, (2 << 20) // max(width, 1))
        if L <= group:
            fl, fd, ce = jax.vmap(one)(data_l, lens_l)
        else:
            ng = -(-L // group)
            pad = ng * group - L
            dp = jnp.concatenate(
                [data_l, jnp.zeros((pad, width), data_l.dtype)], axis=0)
            lp = jnp.concatenate([lens_l, jnp.zeros(pad, lens_l.dtype)])
            fl, fd, ce = jax.lax.map(
                lambda g: jax.vmap(one)(g[0], g[1]),
                (dp.reshape(ng, group, width), lp.reshape(ng, group)))
            fl = fl.reshape(ng * group, -1)[:L]
            fd = fd.reshape(ng * group, -1)[:L]
            ce = ce.reshape(ng * group, -1)[:L]
        if not gather:
            return fl, fd, ce
        return (jax.lax.all_gather(fl, BLOCK_AXIS, tiled=True),
                jax.lax.all_gather(fd, BLOCK_AXIS, tiled=True),
                jax.lax.all_gather(ce, BLOCK_AXIS, tiled=True))

    out_specs = ((P(None, None),) * 3 if gather
                 else (P(BLOCK_AXIS, None),) * 3)
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS)),
        out_specs=out_specs,
        check_vma=False,
    )(data, lens)


def encode_blocks_mesh_hybrid(
    data: bytes,
    params: LzmaParams | None = None,
    block_size: int = 1 << 18,
    mesh: Mesh | None = None,
    fb: int | None = None,
    tiers: dict | None = None,
    num_threads: int = 0,
    gather: bool | None = None,
) -> bytes:
    """The flagship TPU encode over a device mesh: block-data-parallel
    candidate search on every device (hybrid-optimal pipeline,
    ops/hybrid.encode_blocks_hybrid_optimal semantics) + host-parallel
    optimal parse/serialize of the local results.  Ratio is identical to
    the single-device hybrid-optimal encoder (same lists, same parse).
    """
    from ..ops.hybrid import DEFAULT_TIERS, _flatten_packed
    from ..runtime import native

    params = (params or LzmaParams()).validated_for_encode()
    if params.write_eos:
        raise ValueError("block container uses known sizes; EOS not supported")
    mesh = mesh or make_mesh()
    d = mesh.devices.size
    blocks = blk.split_blocks(data, block_size)
    if not blocks:
        return blk.build_container(params, block_size, 0, [])
    fb = int(fb if fb is not None else params.fast_bytes)
    tiers = dict(DEFAULT_TIERS) if tiers is None else dict(tiers)
    tiers.setdefault("k4", DEFAULT_TIERS["k4"])
    tiers.setdefault("k8", DEFAULT_TIERS["k8"])
    n = len(blocks)
    bs = block_size
    lanes = _pad_lanes(n, d)
    arr = np.zeros((lanes, bs), dtype=np.uint8)
    lens = np.zeros(lanes, dtype=np.int32)
    for i, b in enumerate(blocks):
        arr[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        lens[i] = len(b)
    if gather is None:
        gather = jax.process_count() > 1
    fl, fd, ce = _hybrid_search_step(
        jnp.asarray(arr), jnp.asarray(lens),
        jnp.int32(min(params.dict_size, bs)),
        fb=fb, cap=3 * bs, tiers_key=tuple(sorted(tiers.items())),
        mesh_holder=_MeshHolder(mesh), gather=gather)
    flat_l, flat_d, flat_off, pos_base = _flatten_packed(
        np.asarray(fl)[:n], np.asarray(fd)[:n], np.asarray(ce)[:n], lens[:n])
    payload, sizes = native.encode_candidate_blocks(
        arr[:n].reshape(-1), bs, params.lc, params.lp, params.pb,
        min(params.dict_size, 1 << 29), fb, flat_l, flat_d, flat_off,
        pos_base, num_threads=num_threads,
        total_len=(n - 1) * bs + int(lens[n - 1]),
    )
    import struct

    head = blk.pack_header(params, bs, len(data), n, 0, 0, 0)
    return head + struct.pack(f"<{n}I", *sizes) + payload


class _MeshHolder:
    """Hashable wrapper so a Mesh can ride a static jit arg."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def __hash__(self):
        return hash(tuple(d.id for d in self.mesh.devices.flat))

    def __eq__(self, other):
        return isinstance(other, _MeshHolder) and self.mesh == other.mesh


def encode_blocks_mesh(
    data: bytes,
    params: LzmaParams | None = None,
    block_size: int = 1 << 18,
    mesh: Mesh | None = None,
    fb: int | None = None,
    preset_len: int = 0,
    dictionary: bytes = b"",
    use_pallas: bool = False,
    gather: bool | None = None,
    parse: str = "lazy",
) -> bytes:
    """Data-parallel block encode over every device in the mesh.

    use_pallas routes each shard's range coding through the in-VMEM
    Pallas serializer (interpret mode off-TPU); envelope shortfalls
    re-encode host-side and shape/lowering failures fall back to the
    XLA step.
    `preset_len > 0` writes LZTB v2: block 0 encodes plain on one lane,
    then its prefix is broadcast to every device (replicated shard_map
    operand) and all remaining blocks encode against it.  `dictionary`
    writes LZTB v3: the trained dictionary is stored as its own
    compressed stream and broadcast to every device, priming EVERY lane.
    """
    params = (params or LzmaParams()).validated_for_encode()
    mesh = mesh or make_mesh()
    d = mesh.devices.size
    preset_len = blk.validated_preset_len(preset_len, block_size, len(data))
    dictionary = blk.validated_dictionary(dictionary, preset_len)
    if len(data) <= block_size:
        preset_len = 0  # single block: a preset would be pointless
    if not data:
        dictionary = b""
    blocks = blk.split_blocks(data, block_size)
    if not blocks:
        return blk.build_container(params, block_size, 0, [])
    n = len(blocks)
    from ..ops.device_encoder import clamp_fb

    fb = clamp_fb(fb if fb is not None else params.fast_bytes)
    # single-host: skip the payload all_gather entirely (results stay
    # block-sharded; the host reads each shard once).  Multi-host needs
    # the replication so the coordinator can read every block.  The
    # explicit override exists for tests and A/Bs of the gather designs.
    if gather is None:
        gather = jax.process_count() > 1
    common = dict(
        lc=params.lc, lp=params.lp, pb=params.pb, fb=fb,
        mesh_holder=_MeshHolder(mesh), gather=gather,
    )

    first = 0
    streams = []
    dict_stream = b""
    if dictionary:
        from ..ops.device_encoder import encode_batch

        (dict_stream,) = encode_batch([dictionary], params, fb=fb)
    elif preset_len:
        from ..ops.device_encoder import encode_batch

        streams.append(encode_batch(blocks[:1], params, fb=fb)[0])
        first = 1

    pre_bytes = dictionary or (data[:preset_len] if preset_len else b"")
    m = n - first
    lanes = _pad_lanes(m, d)
    max_n = max(block_size, 16)
    arr = np.zeros((lanes, max_n), dtype=np.uint8)
    lens = np.zeros(lanes, dtype=np.int32)
    for i in range(first, n):
        b = blocks[i]
        arr[i - first, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        lens[i - first] = len(b)
    dict_size = jnp.int32(min(params.dict_size, max_n + len(pre_bytes)))
    preset = (np.frombuffer(pre_bytes, dtype=np.uint8) if pre_bytes else None)
    retry = []
    if use_pallas:
        try:
            comp, comp_lens, ok = _encode_step_pallas(
                jnp.asarray(arr), jnp.asarray(lens), dict_size,
                fb=fb, interpret=jax.default_backend() != "tpu",
                preset=(jnp.asarray(preset) if pre_bytes else None),
                plen=len(pre_bytes),
                lc=params.lc, lp=params.lp, pb=params.pb,
                mesh_holder=common["mesh_holder"],
                gather=common["gather"],
            )
            ok = np.asarray(ok)
            # serializer staging-envelope shortfalls re-encode host-side
            retry = [i for i in range(m) if not ok[i]]
        except Exception:
            # VMEM/lowering envelope: XLA step fallback.  Logged, not
            # silent — otherwise a dead Pallas path looks healthy
            # (tools/mesh_chip.py is the hardware-level canary).
            logger.warning("mesh Pallas encode step failed; "
                           "falling back to the XLA step", exc_info=True)
            use_pallas = False
    if not use_pallas:
        if pre_bytes:
            comp, comp_lens = _encode_step_preset(
                jnp.asarray(arr), jnp.asarray(lens), jnp.asarray(preset),
                dict_size, **common,
            )
        else:
            comp, comp_lens = _encode_step(
                jnp.asarray(arr), jnp.asarray(lens), dict_size, parse=parse,
                **common,
            )
    comp = np.asarray(comp)
    comp_lens = np.asarray(comp_lens)
    redo = {}
    if retry:
        from ..ops.device_encoder import encode_batch

        redone = encode_batch([blocks[first + i] for i in retry], params,
                              fb=fb, preset=pre_bytes)
        redo = dict(zip(retry, redone))
    streams.extend(redo[i] if i in redo
                   else comp[i, : comp_lens[i]].tobytes() for i in range(m))
    return blk.build_container(params, block_size, len(data), streams,
                               preset_len, dict_stream, len(dictionary))


def decode_blocks_mesh(blob, mesh: Mesh | None = None,
                       use_pallas: bool = False,
                       gather: bool | None = None) -> bytes:
    """Data-parallel block decode over every device in the mesh.

    LZTB v2 (shared preset): block 0 decodes first (one lane), its
    prefix is broadcast to every device as a replicated array, then all
    remaining blocks decode data-parallel against it.

    use_pallas runs the ring-window Pallas kernel per shard instead of
    the XLA FSM (interpret mode off-TPU); shapes outside the kernel's
    VMEM envelope fall back to the XLA step.
    """
    frame = blk.parse_container(blob)
    mesh = mesh or make_mesh()
    d = mesh.devices.size
    n = len(frame.comp_sizes)
    if n == 0:
        return b""
    offsets, _ext_sizes = frame.stream_extents(len(blob))

    def block_out_size(i):
        return _ext_sizes[i]

    first = 0
    parts = []
    preset = None
    plen = 0
    if frame.dict_len:
        # LZTB v3: decode the stored dictionary on one lane, broadcast it
        # to every device, then ALL blocks decode data-parallel against it
        from ..ops.device_decoder import decode_batch

        (dictionary,) = decode_batch(
            [bytes(blob[frame.payload_offset : frame.blocks_offset])],
            frame.params, [frame.dict_len],
        )
        preset = np.frombuffer(dictionary, dtype=np.uint8)
        plen = frame.dict_len
    elif frame.preset_len:
        from ..ops.device_decoder import decode_batch

        head = decode_batch(
            [bytes(blob[offsets[0] : offsets[1]])], frame.params,
            [block_out_size(0)],
        )
        parts.append(head[0])
        preset = np.frombuffer(head[0][: frame.preset_len], dtype=np.uint8)
        plen = frame.preset_len
        first = 1
        if n == 1:
            return parts[0]

    # Mosaic tiles the lane axis in sublanes of 8: the Pallas step needs
    # every per-device shard 8-aligned
    lanes = _pad_lanes(n - first, d * 8 if use_pallas else d)
    # word-aligned input width: the packed ring kernel consumes the
    # compressed streams four bytes per word
    max_in = (max(max(frame.comp_sizes[first:]), 16) + 3) & ~3
    comp = np.zeros((lanes, max_in), dtype=np.uint8)
    lens = np.zeros(lanes, dtype=np.int32)
    sizes = np.zeros(lanes, dtype=np.int32)
    for i in range(first, n):
        s = bytes(blob[offsets[i] : offsets[i + 1]])
        comp[i - first, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        lens[i - first] = len(s)
        sizes[i - first] = block_out_size(i)
    common = dict(
        lc=frame.params.lc,
        lp=frame.params.lp,
        pb=frame.params.pb,
        mesh_holder=_MeshHolder(mesh),
        # see encode_blocks_mesh; override for tests/A-Bs
        gather=(jax.process_count() > 1) if gather is None else gather,
    )
    dict_size = np.int64(min(frame.params.dict_size, 2**31 - 1))
    if use_pallas:
        try:
            out, ok = _decode_step_pallas(
                jnp.asarray(comp),
                jnp.asarray(lens),
                jnp.asarray(sizes + (plen if preset is not None else 0)),
                int(dict_size),
                max_out=max(frame.block_size, 1) + plen,
                interpret=jax.default_backend() != "tpu",
                preset=(jnp.asarray(preset) if preset is not None else None),
                plen=(plen if preset is not None else 0),
                **common,
            )
            out = np.asarray(out)
            ok = np.asarray(ok)
        except Exception:
            logger.warning("mesh Pallas decode step failed; "
                           "falling back to the XLA FSM", exc_info=True)
            use_pallas = False  # VMEM/lowering envelope
    if not use_pallas and preset is not None:
        out, ok = _decode_step_preset(
            jnp.asarray(comp),
            jnp.asarray(lens),
            jnp.asarray(sizes + plen),  # absolute end positions
            jnp.asarray(preset),
            dict_size,
            max_out=max(frame.block_size, 1) + plen,
            **common,
        )
    elif not use_pallas:
        out, ok = _decode_step(
            jnp.asarray(comp),
            jnp.asarray(lens),
            jnp.asarray(sizes),
            dict_size,
            max_out=max(frame.block_size, 1),
            **common,
        )
    out = np.asarray(out)
    ok = np.asarray(ok)
    m = n - first
    if not ok[:m].all():
        bad = int(np.argmin(ok[:m])) + first
        raise ValueError(f"mesh decode failed for block {bad}")
    skip = plen if preset is not None else 0
    parts.extend(out[i, skip : skip + sizes[i]].tobytes() for i in range(m))
    return b"".join(parts)
