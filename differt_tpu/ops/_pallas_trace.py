"""Fused Pallas trace megakernel: image method + validation in one kernel.

The XLA trace pipeline (rt/_solvers.py::trace_path_candidates) runs the
image method, four geometric validity checks, and the scene blockage test
as separate fused-by-XLA ops over a ``[tx, rx, candidate]`` batch. This
kernel collapses the whole per-candidate pipeline into a single Pallas
program (SURVEY.md section 7, stage 4):

- grid ``(num_tx, candidate_tiles, rx_tiles, tri_tiles)`` with
  ``C_TILE`` candidates handled per grid step (amortizing per-step
  overhead; C_TILE was swept 8/16/32/64/128 on the 113k-triangle city —
  the 35.4M paths/s plateau starts at 64);
- at the first triangle tile, each candidate's mirror images are computed
  *scalar* (they do not depend on RX), the backward intersection pass runs
  vectorized over an RX tile, the geometric checks (inside-triangle,
  same-side, segment-length, finiteness) are evaluated, and the path
  vertices go straight to the output;
- subsequent triangle tiles stream the mesh through VMEM for the blockage
  (any-hit) test with per-RX accumulators resident in VMEM — zero
  intermediate HBM traffic between tracing and validation.

The blockage phase is vectorized across the ``C_TILE`` candidate slots:
segment origins/directions and the running blocked state live as
``[C_TILE, tile_r]`` VMEM planes (slots on the sublane axis, RX on the
lane axis), so each triangle tile costs ONE scalar branch and a handful
of dense vector ops regardless of ``C_TILE``. The round-4 design looped
slots with a scalar-predicated region each — at 113k triangles (221
tiles/candidate-tile) those ~1.8k scalar branches per candidate tile were
the entire grid-step cost (docs/performance.md, "fewer grid steps, not
cheaper ones"); folding slots onto sublanes removed them and was the
single biggest XL-scale win (measured ladder in docs/performance.md).

Per-candidate scalars (mirror vertices/normals, candidate triangles) ride
in SMEM; coordinates use SoA layouts so the lane axis is the 128-wide
RX/triangle axis.

Quads are supported (the inside-triangle check accepts a hit on either
triangle of each quad); hard masks only (no smoothing) — the smoothed
cases fall back to the XLA pipeline, which is also the correctness oracle.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jaxtyping import Array, Bool, Float

from ._pallas_rt import (
    _HAS_PLTPU,
    _chunk_aabbs,
    _interpret,
    _morton_perm,
    _pad_to,
    _slab_overlap,
    _tile_aabbs,
    _vmem_spec,
)

if _HAS_PLTPU:  # pragma: no cover
    from jax.experimental.pallas import tpu as pltpu


def _smem_spec(block_shape, index_map):
    if _HAS_PLTPU and not _interpret():
        return pl.BlockSpec(block_shape, index_map, memory_space=pltpu.SMEM)
    return pl.BlockSpec(block_shape, index_map)


MAX_TILE_R = 1024
MAX_TILE_T = 2048
MAX_C_TILE = 64
# VMEM budget for one grid step's resident blocks + scratch (the chip has
# 16 MB/core; leave headroom for Mosaic's own buffers and the small SMEM
# operands). The C_TILE sweep plateaus at 64 on the XL city, but order-3
# and 1024-wide RX tiles need the smaller sizes to fit.
_VMEM_BUDGET_BYTES = 12 * 2**20
T_SUB = 64  # Triangle sublane-chunk size in the blockage phase.


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _pick_tile_t(num_tris: int) -> int:
    """Triangle-tile size targeting ~56 grid steps over the mesh.

    Small meshes keep fine 512-wide tiles (tight tile AABBs make the
    per-slot tile-level culling effective — the bruxelles coverage
    workload measured ~9% faster at 512 than 2048); Munich-class meshes
    grow the tile so the grid-step count stays bounded (113k triangles:
    2048-wide tiles measured 44.5M vs 36.5M paths/s at 512 — per-step
    overhead dominates dead tiles there). Chunk-level (T_SUB) culling is
    unaffected by the tile size.
    """
    target_tiles = 56
    raw = -(-max(num_tris, 1) // target_tiles)
    tile = max(512, -(-raw // T_SUB) * T_SUB)
    return min(MAX_TILE_T, tile, -(-max(num_tris, 1) // T_SUB) * T_SUB)


def _pick_c_tile(k: int, tile_r: int, tile_t: int, vert_rows: int) -> int:
    """Largest candidate-slot count whose blocks + scratch fit in VMEM.

    Counts the double-buffered output blocks (vertices + mask), the
    segment/flag scratch planes, the mesh/active blocks, and the RX block.
    """
    for c in (MAX_C_TILE, 32, 16, 8):
        verts = c * vert_rows * tile_r * 4 * 2
        mask = c * 8 * tile_r * 2
        seg = 6 * (k + 1) * c * tile_r * 4
        flags = 2 * c * tile_r
        mesh = (9 * tile_t * 4 + tile_t * 4) * 2
        rx = 4 * tile_r * 4 * 2
        if verts + mask + seg + flags + mesh + rx <= _VMEM_BUDGET_BYTES:
            return c
    return 8


def _trace_kernel(
    tx_ref,       # SMEM [num_tx, 8]          (x, y, z, pad...), all resident
    rx_ref,       # VMEM [4, tile_r]          rows x/y/z/pad
    mirrors_ref,  # SMEM [C_TILE, k, 8]       per bounce: mv(3) n(3) pad(2)
    tris_ref,     # SMEM [C_TILE, tpm*k, 12]  per bounce-triangle: v0/e1/e2/pad
    mesh_ref,     # VMEM [9, tile_t]          v0/e1/e2 SoA (Morton-sorted)
    active_ref,   # VMEM [1, tile_t]
    tile_aabb_ref,  # SMEM [8, num_tiles]     per-triangle-tile AABB
    chunk_aabb_ref,  # SMEM [8, num_chunks_total] per-T_SUB-chunk AABB
    verts_ref,    # VMEM [1, C_TILE, rows, tile_r] output
    mask_ref,     # VMEM [1, C_TILE, 8, tile_r] bool output (row 0 used)
    seg_scratch,  # VMEM [6*(k+1), C_TILE, tile_r] (rows: per-seg o/d coords)
    geom_scratch,  # VMEM [C_TILE, tile_r] bool
    blocked_scratch,  # VMEM [C_TILE, tile_r] bool (running any-hit state)
    *,
    order: int,
    tris_per_mirror: int,
    epsilon: float,
    hit_tol: float,
    min_len: float,
    num_rx: int,
    c_tile: int,
):
    k = order
    t_idx = pl.program_id(3)
    rx_idx = pl.program_id(2)
    tx_idx = pl.program_id(0)

    @pl.when(t_idx == 0)
    def _geometry():
        tx = [tx_ref[tx_idx, c] for c in range(3)]
        rx = [rx_ref[c, :] for c in range(3)]  # [tile_r] each

        def _geometry_slot(slot, _):
            # Forward pass: consecutive mirror images of TX — pure scalars.
            images = []
            img = tx
            for b in range(k):
                mv = [mirrors_ref[slot, b, c] for c in range(3)]
                n = [mirrors_ref[slot, b, 3 + c] for c in range(3)]
                d = (
                    (img[0] - mv[0]) * n[0]
                    + (img[1] - mv[1]) * n[1]
                    + (img[2] - mv[2]) * n[2]
                )
                img = [img[c] - 2.0 * d * n[c] for c in range(3)]
                images.append(img)

            # Backward pass: intersect toward images, last mirror first.
            points = [None] * k
            point = rx
            invalid = jnp.zeros_like(rx[0], dtype=jnp.bool_)
            for b in reversed(range(k)):
                mv = [mirrors_ref[slot, b, c] for c in range(3)]
                n = [mirrors_ref[slot, b, 3 + c] for c in range(3)]
                img = images[b]
                direction = [img[c] - point[c] for c in range(3)]
                dn = _dot3(direction, n)
                vn = (
                    (mv[0] - point[0]) * n[0]
                    + (mv[1] - point[1]) * n[1]
                    + (mv[2] - point[2]) * n[2]
                )
                parallel = dn == 0.0
                tt = vn / jnp.where(parallel, 1.0, dn)
                invalid = invalid | (parallel & (vn != 0.0))
                point = [point[c] + direction[c] * tt for c in range(3)]
                points[b] = point

            # Path vertices: tx, bounces..., rx (SoA rows).
            for c in range(3):
                verts_ref[0, slot, c, :] = jnp.broadcast_to(tx[c], rx[0].shape)
            for b in range(k):
                for c in range(3):
                    verts_ref[0, slot, 3 * (b + 1) + c, :] = points[b][c]
            for c in range(3):
                verts_ref[0, slot, 3 * (k + 1) + c, :] = rx[c]

            # Segments for the blockage phase.
            chain = [[jnp.broadcast_to(tx[c], rx[0].shape) for c in range(3)]]
            chain += points
            chain += [rx]
            seg_valid = jnp.ones_like(rx[0], dtype=jnp.bool_)
            finite = jnp.logical_not(invalid)
            for s in range(k + 1):
                o = chain[s]
                d = [chain[s + 1][c] - chain[s][c] for c in range(3)]
                for c in range(3):
                    finite = finite & jnp.isfinite(o[c]) & jnp.isfinite(d[c])
                    seg_scratch[6 * s + c, slot, :] = jnp.where(
                        jnp.isfinite(o[c]), o[c], 0.0
                    )
                    seg_scratch[6 * s + 3 + c, slot, :] = jnp.where(
                        jnp.isfinite(d[c]), d[c], 0.0
                    )
                seg_sq = _dot3(d, d)
                seg_valid = seg_valid & jnp.logical_not(seg_sq < min_len)

            # Inside-triangle checks: segment b must hit ONE of its
            # mirror's triangles (1 for plain meshes, 2 per quad).
            inside = jnp.ones_like(rx[0], dtype=jnp.bool_)
            for b in range(k):
                o = chain[b]
                d = [chain[b + 1][c] - chain[b][c] for c in range(3)]
                hit_any = jnp.zeros_like(rx[0], dtype=jnp.bool_)
                for j in range(tris_per_mirror):
                    row = tris_per_mirror * b + j
                    v0 = [tris_ref[slot, row, c] for c in range(3)]
                    e1 = [tris_ref[slot, row, 3 + c] for c in range(3)]
                    e2 = [tris_ref[slot, row, 6 + c] for c in range(3)]
                    h = [
                        d[1] * e2[2] - d[2] * e2[1],
                        d[2] * e2[0] - d[0] * e2[2],
                        d[0] * e2[1] - d[1] * e2[0],
                    ]
                    det = _dot3(h, e1)
                    inv = jnp.where(
                        det == 0.0, 0.0, 1.0 / jnp.where(det == 0.0, 1.0, det)
                    )
                    s_vec = [o[c] - v0[c] for c in range(3)]
                    u = inv * _dot3(s_vec, h)
                    q = [
                        s_vec[1] * e1[2] - s_vec[2] * e1[1],
                        s_vec[2] * e1[0] - s_vec[0] * e1[2],
                        s_vec[0] * e1[1] - s_vec[1] * e1[0],
                    ]
                    v = inv * _dot3(q, d)
                    tt = inv * _dot3(q, e2)
                    hit_any = hit_any | (
                        (jnp.abs(det) > epsilon)
                        & (u >= 0.0)
                        & (u <= 1.0)
                        & (v >= 0.0)
                        & (u + v <= 1.0)
                        & (tt > epsilon)
                    )
                inside = inside & hit_any

            # Same-side check per mirror.
            same_side = jnp.ones_like(rx[0], dtype=jnp.bool_)
            for b in range(k):
                mv = [mirrors_ref[slot, b, c] for c in range(3)]
                n = [mirrors_ref[slot, b, 3 + c] for c in range(3)]
                prev = chain[b]
                nxt = chain[b + 2]
                dot_prev = (
                    (prev[0] - mv[0]) * n[0]
                    + (prev[1] - mv[1]) * n[1]
                    + (prev[2] - mv[2]) * n[2]
                )
                dot_next = (
                    (nxt[0] - mv[0]) * n[0]
                    + (nxt[1] - mv[1]) * n[1]
                    + (nxt[2] - mv[2]) * n[2]
                )
                same_side = same_side & (
                    jnp.sign(dot_prev) == jnp.sign(dot_next)
                )

            geom = inside & same_side & seg_valid & finite
            geom_scratch[slot, :] = geom
            # Paths start "already blocked" when they are padded RX lanes
            # (zero-filled receivers at the scene origin would keep
            # overlapping chunk AABBs) or already geometrically invalid:
            # the final mask is an AND of all checks, so blockage only
            # matters for paths that survived the cheap checks — at city
            # scale that is a tiny fraction (a reflection point must land
            # inside one specific triangle), and skipping the rest is what
            # keeps the blockage sweep from degenerating to brute force
            # over wild image-method segments.
            tile_r = rx[0].shape[0]
            lane = rx_idx * tile_r + jax.lax.broadcasted_iota(
                jnp.int32, (1, tile_r), 1
            )
            blocked_scratch[slot, :] = (lane >= num_rx).reshape(
                -1
            ) | jnp.logical_not(geom)
            return None

        jax.lax.fori_loop(0, c_tile, _geometry_slot, None)

    # Blockage phase: any-hit of every segment against this triangle tile.
    # The tile-level gates are vectorized across ALL candidate slots at
    # once: slots ride the sublane axis and the RX tile the 128-wide lane
    # axis, so the pending mask and the shared slab tests are dense
    # [C_TILE, tile_r] vector ops and a DEAD tile costs exactly one
    # scalar branch + a few vector ops regardless of C_TILE. At XL scale
    # (221 tiles/candidate-tile, almost all dead) the round-4 per-slot
    # branches were the entire grid-step cost; the shared gate plus a
    # larger C_TILE is the measured ~150x XL win. Only inside a FIRING
    # tile does the kernel drop to per-slot granularity again (see
    # _blockage_slot below).
    tile_t = mesh_ref.shape[1]
    num_chunks = tile_t // T_SUB
    thresh = 1.0 - 2.0 * hit_tol

    # Level 0: one branch per grid step — skip the whole tile when every
    # (slot, RX) path is already masked/blocked or the tile is inactive.
    # Padded RX lanes and geometry-failed paths start "already blocked"
    # (see the geometry phase), so `pending` is exactly the paths whose
    # blockage still matters — at city scale a tiny fraction. The
    # any-active guard covers fully padded/masked tiles whose inverted
    # +-inf AABBs degenerate the slab test to "overlaps everything".
    pending0 = jnp.logical_not(blocked_scratch[:, :])
    tile_alive = jnp.any(pending0) & jnp.any(active_ref[0, :] > 0)

    @pl.when(tile_alive)
    def _tile():
        # Level 1: run the tile only when some still-pending segment's
        # slab interval overlaps the tile AABB (Morton-sorted triangles
        # keep it tight), tested as ONE dense [C_TILE, tile_r] op over
        # all slots.
        tile_box = [tile_aabb_ref[c, t_idx] for c in range(6)]
        segs = []
        needed = jnp.zeros((), dtype=jnp.bool_)
        for s in range(k + 1):
            o = [seg_scratch[6 * s + c, :, :] for c in range(3)]
            d = [seg_scratch[6 * s + 3 + c, :, :] for c in range(3)]
            # Offset the origin to dodge self-intersection at the
            # segment start (same trick as the mesh-level any-hit).
            o = [o[c] + d[c] * hit_tol for c in range(3)]
            segs.append((o, d))
            needed = needed | jnp.any(
                _slab_overlap(o, d, tile_box, thresh) & pending0
            )

        @pl.when(needed)
        def _blockage():
            # Inside a firing tile, fall back to per-slot granularity: a
            # per-slot tile-level slab gate, then that slot's own chunk
            # loop (exactly the round-4 structure). Firing tiles are the
            # rare case at scale — dead candidate tiles never reach this
            # fori — and per-slot culling here is what keeps coherent-RX
            # coverage workloads fast: gating only at chunk level ran the
            # per-slot slab math 8x more often (measured slower on (b)),
            # and gating nothing ran C_TILE x the MT work (measured 2x
            # slower still).
            def _blockage_slot(slot, _):
                pend_row = jnp.logical_not(
                    blocked_scratch[slot, :]
                ).reshape(1, -1)
                # Dead-slot fast path: one mask reduce + branch before any
                # slab math (most slots of a firing tile are still dead).
                slot_alive = jnp.any(pend_row)

                @pl.when(slot_alive)
                def _slot_gate():
                    slot_needed = jnp.zeros((), dtype=jnp.bool_)
                    slot_segs = []
                    for s in range(k + 1):
                        o = [
                            (
                                seg_scratch[6 * s + c, slot, :]
                                + seg_scratch[6 * s + 3 + c, slot, :]
                                * hit_tol
                            ).reshape(1, -1)
                            for c in range(3)
                        ]
                        d = [
                            seg_scratch[6 * s + 3 + c, slot, :].reshape(
                                1, -1
                            )
                            for c in range(3)
                        ]
                        slot_segs.append((o, d))
                        slot_needed = slot_needed | jnp.any(
                            _slab_overlap(o, d, tile_box, thresh) & pend_row
                        )

                    @pl.when(slot_needed)
                    def _slot_chunks(slot_segs=slot_segs):
                        for chunk in range(num_chunks):
                            sl = slice(chunk * T_SUB, (chunk + 1) * T_SUB)
                            g = t_idx * num_chunks + chunk
                            chunk_box = [chunk_aabb_ref[c, g] for c in range(6)]
                            pend = jnp.logical_not(
                                blocked_scratch[slot, :]
                            ).reshape(1, -1)
                            chunk_needed = jnp.any(active_ref[0, sl] > 0)
                            seg_needed = jnp.zeros((), dtype=jnp.bool_)
                            for s in range(k + 1):
                                o, d = slot_segs[s]
                                seg_needed = seg_needed | jnp.any(
                                    _slab_overlap(o, d, chunk_box, thresh) & pend
                                )
                            chunk_needed = chunk_needed & seg_needed

                            @pl.when(chunk_needed)
                            def _chunk(sl=sl):
                                blocked = blocked_scratch[slot, :]
                                v0 = [
                                    mesh_ref[c, sl].reshape(-1, 1)
                                    for c in range(3)
                                ]
                                e1 = [
                                    mesh_ref[3 + c, sl].reshape(-1, 1)
                                    for c in range(3)
                                ]
                                e2 = [
                                    mesh_ref[6 + c, sl].reshape(-1, 1)
                                    for c in range(3)
                                ]
                                active = active_ref[0, sl].reshape(-1, 1) > 0
                                for s in range(k + 1):
                                    o, d = slot_segs[s]
                                    h = [
                                        d[1] * e2[2] - d[2] * e2[1],
                                        d[2] * e2[0] - d[0] * e2[2],
                                        d[0] * e2[1] - d[1] * e2[0],
                                    ]
                                    det = (
                                        h[0] * e1[0] + h[1] * e1[1] + h[2] * e1[2]
                                    )
                                    inv = jnp.where(
                                        det == 0.0,
                                        0.0,
                                        1.0 / jnp.where(det == 0.0, 1.0, det),
                                    )
                                    s_vec = [o[c] - v0[c] for c in range(3)]
                                    u = inv * (
                                        s_vec[0] * h[0]
                                        + s_vec[1] * h[1]
                                        + s_vec[2] * h[2]
                                    )
                                    q = [
                                        s_vec[1] * e1[2] - s_vec[2] * e1[1],
                                        s_vec[2] * e1[0] - s_vec[0] * e1[2],
                                        s_vec[0] * e1[1] - s_vec[1] * e1[0],
                                    ]
                                    v = inv * (
                                        q[0] * d[0] + q[1] * d[1] + q[2] * d[2]
                                    )
                                    tt = inv * (
                                        q[0] * e2[0]
                                        + q[1] * e2[1]
                                        + q[2] * e2[2]
                                    )
                                    hit = (
                                        (jnp.abs(det) > epsilon)
                                        & (u >= 0.0)
                                        & (u <= 1.0)
                                        & (v >= 0.0)
                                        & (u + v <= 1.0)
                                        & (tt > epsilon)
                                        & (tt < thresh)
                                        & active
                                    )
                                    blocked = blocked | hit.any(axis=0)
                                blocked_scratch[slot, :] = blocked

                return None

            jax.lax.fori_loop(0, c_tile, _blockage_slot, None)

    @pl.when(t_idx == pl.num_programs(3) - 1)
    def _finalize():
        def _finalize_slot(slot, _):
            mask_ref[0, slot, 0, :] = geom_scratch[slot, :] & jnp.logical_not(
                blocked_scratch[slot, :]
            )
            return None

        jax.lax.fori_loop(0, c_tile, _finalize_slot, None)


@functools.partial(
    jax.jit,
    static_argnames=("order", "epsilon", "hit_tol", "min_len"),
)
def _pallas_trace_specular_impl(
    tx_vertices: Float[Array, "num_tx 3"],
    rx_vertices: Float[Array, "num_rx 3"],
    mirror_vertices: Float[Array, "num_candidates order 3"],
    mirror_normals: Float[Array, "num_candidates order 3"],
    candidate_triangles: Float[Array, "num_candidates order 3 3"],
    triangle_vertices: Float[Array, "num_triangles 3 3"],
    active_triangles: Bool[Array, " num_triangles"] | None,
    *,
    order: int,
    epsilon: float,
    hit_tol: float,
    min_len: float,
) -> tuple[
    Float[Array, "num_tx num_candidates num_rx order+2 3"],
    Bool[Array, "num_tx num_candidates num_rx"],
]:
    """Run the fused trace kernel; returns (vertices, mask).

    Axis order is ``[tx, candidate, rx]`` (transpose outside as needed).
    """
    num_tx = tx_vertices.shape[0]
    num_rx = rx_vertices.shape[0]
    num_cand = mirror_vertices.shape[0]
    num_tris = triangle_vertices.shape[0]
    k = order
    # 1 triangle per mirror for plain meshes, 2 for quads.
    tris_per_mirror = candidate_triangles.shape[1] // max(k, 1)

    # Adaptive tiles: no point padding a small mesh (or RX set) up to the
    # maximum tile — wasted sublanes dominate for small scenes. Triangles
    # ride the sublane axis in the blockage phase, so they only pad to a
    # multiple of T_SUB (the block lane dim stays legal because a single
    # tile covers the full padded array dimension).
    tile_r = min(MAX_TILE_R, pl.cdiv(max(num_rx, 1), 256) * 256)
    tile_t = _pick_tile_t(num_tris)
    rx_padded = pl.cdiv(max(num_rx, 1), tile_r) * tile_r
    tris_padded = pl.cdiv(max(num_tris, 1), tile_t) * tile_t
    vert_rows_probe = -(-3 * (k + 2) // 8) * 8
    c_tile = _pick_c_tile(k, tile_r, tile_t, vert_rows_probe)
    cand_padded = pl.cdiv(max(num_cand, 1), c_tile) * c_tile

    # Mosaic block rule: the last two block dims must divide (8, 128) or
    # equal the full array dims — hence SMEM scalars, 4-row RX, and
    # 8-row-padded outputs.
    tx_in = _pad_to(tx_vertices, 8, 1, 0.0)  # [num_tx, 8] (SMEM scalars)
    rx_in = _pad_to(rx_vertices.T, 4, 0, 0.0)  # [4, num_rx]
    rx_in = _pad_to(rx_in, rx_padded, 1, 0.0)

    mirrors = jnp.concatenate((mirror_vertices, mirror_normals), axis=-1)
    mirrors = _pad_to(mirrors, 8, 2, 0.0)  # [C, k, 8]
    mirrors = _pad_to(mirrors, cand_padded, 0, 0.0)

    ct = candidate_triangles
    cand_tris = jnp.concatenate(
        (
            ct[..., 0, :],
            ct[..., 1, :] - ct[..., 0, :],
            ct[..., 2, :] - ct[..., 0, :],
        ),
        axis=-1,
    )
    cand_tris = _pad_to(cand_tris, 12, 2, 0.0)  # [C, tpm*k, 12]
    cand_tris = _pad_to(cand_tris, cand_padded, 0, 0.0)

    # The mesh feeds only the blockage phase (no triangle indices escape),
    # so Morton-sorting it is free — and makes the per-chunk AABBs tight
    # enough for the slab-test culling to skip most (chunk, segment) pairs.
    perm = _morton_perm(triangle_vertices)
    sorted_tv = jnp.take(triangle_vertices, perm, axis=0)
    v0 = sorted_tv[:, 0, :]
    e1 = sorted_tv[:, 1, :] - v0
    e2 = sorted_tv[:, 2, :] - v0
    mesh = jnp.concatenate((v0, e1, e2), axis=-1).T  # [9, T]
    mesh = _pad_to(mesh, tris_padded, 1, 0.0)
    if active_triangles is None:
        active = jnp.ones((num_tris,), dtype=jnp.int32)
    else:
        active = jnp.take(active_triangles, perm).astype(jnp.int32)
    active = _pad_to(active.reshape(1, -1), tris_padded, 1, 0)
    # Per-triangle-tile AABBs: fold the T_SUB-chunk AABBs up to tile_t
    # granularity (margin already applied by _chunk_aabbs).
    chunk_aabb = _chunk_aabbs(mesh, active)
    tile_aabb = _tile_aabbs(chunk_aabb, tile_t)

    grid = (
        num_tx,
        cand_padded // c_tile,
        rx_padded // tile_r,
        tris_padded // tile_t,
    )
    vert_rows = -(-3 * (k + 2) // 8) * 8  # Rows padded to a multiple of 8.

    kernel = functools.partial(
        _trace_kernel,
        order=k,
        tris_per_mirror=tris_per_mirror,
        epsilon=epsilon,
        hit_tol=hit_tol,
        min_len=min_len,
        num_rx=num_rx,
        c_tile=c_tile,
    )
    scratch_shapes = [
        pltpu.VMEM((6 * (k + 1), c_tile, tile_r), jnp.float32),
        pltpu.VMEM((c_tile, tile_r), jnp.bool_),
        pltpu.VMEM((c_tile, tile_r), jnp.bool_),
    ]

    verts, mask = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(
                (num_tx, cand_padded, vert_rows, rx_padded), jnp.float32
            ),
            jax.ShapeDtypeStruct(
                (num_tx, cand_padded, 8, rx_padded), jnp.bool_
            ),
        ),
        grid=grid,
        in_specs=[
            # The whole (small) TX array stays resident in SMEM; blocking
            # it per-tx would need an illegal (1, 8) block when num_tx > 1.
            _smem_spec((num_tx, 8), lambda a, c, i, t: (0, 0)),
            _vmem_spec((4, tile_r), lambda a, c, i, t: (0, i)),
            _smem_spec((c_tile, k, 8), lambda a, c, i, t: (c, 0, 0)),
            _smem_spec(
                (c_tile, tris_per_mirror * k, 12), lambda a, c, i, t: (c, 0, 0)
            ),
            _vmem_spec((9, tile_t), lambda a, c, i, t: (0, t)),
            _vmem_spec((1, tile_t), lambda a, c, i, t: (0, t)),
            _smem_spec((8, tris_padded // tile_t), lambda a, c, i, t: (0, 0)),
            _smem_spec((8, tris_padded // T_SUB), lambda a, c, i, t: (0, 0)),
        ],
        out_specs=(
            _vmem_spec(
                (1, c_tile, vert_rows, tile_r), lambda a, c, i, t: (a, c, 0, i)
            ),
            _vmem_spec(
                (1, c_tile, 8, tile_r), lambda a, c, i, t: (a, c, 0, i)
            ),
        ),
        scratch_shapes=scratch_shapes,
        interpret=_interpret(),
    )(tx_in, rx_in, mirrors, cand_tris, mesh, active, tile_aabb, chunk_aabb)

    # [tx, cand, rows, rx] -> [tx, cand, rx, k+2, 3]
    verts = verts[:, :num_cand, : 3 * (k + 2), :num_rx]
    verts = verts.reshape(num_tx, num_cand, k + 2, 3, -1)
    verts = jnp.moveaxis(verts, -1, 2)
    mask = mask[:, :num_cand, 0, :num_rx]
    return verts, mask


def _xla_trace_vertices(tx, rx, mirror_vertices, mirror_normals, order):
    """Differentiable XLA recompute of the kernel's geometry phase.

    Op-for-op the same arithmetic as ``_trace_kernel``'s forward-image /
    backward-intersection passes, so the backward pass of
    :func:`pallas_trace_specular` differentiates values identical to the
    kernel's outputs (same recompute-from-frozen-geometry trick as the
    closest-hit custom VJP, reference _mesh.py:226-344).
    Returns ``[num_tx, num_candidates, num_rx, order + 2, 3]``.
    """
    k = order
    num_tx = tx.shape[0]
    num_rx = rx.shape[0]
    num_cand = mirror_vertices.shape[0]

    img = jnp.broadcast_to(tx[:, None, :], (num_tx, num_cand, 3))
    images = []
    for b in range(k):
        mv = mirror_vertices[None, :, b, :]
        n = mirror_normals[None, :, b, :]
        d = jnp.sum((img - mv) * n, axis=-1, keepdims=True)
        img = img - 2.0 * d * n
        images.append(img)

    point = jnp.broadcast_to(
        rx[None, None, :, :], (num_tx, num_cand, num_rx, 3)
    )
    points = [None] * k
    for b in reversed(range(k)):
        mv = mirror_vertices[None, :, None, b, :]
        n = mirror_normals[None, :, None, b, :]
        img = images[b][:, :, None, :]
        direction = img - point
        dn = jnp.sum(direction * n, axis=-1, keepdims=True)
        vn = jnp.sum((mv - point) * n, axis=-1, keepdims=True)
        tt = vn / jnp.where(dn == 0.0, 1.0, dn)
        point = point + direction * tt
        points[b] = point

    chain = [jnp.broadcast_to(tx[:, None, None, :], point.shape)]
    chain += points
    chain += [jnp.broadcast_to(rx[None, None, :, :], point.shape)]
    return jnp.stack(chain, axis=-2)


def _zero_cotangent(primal):
    if jnp.issubdtype(primal.dtype, jnp.inexact):
        return jnp.zeros_like(primal)
    import numpy as np

    return np.zeros(primal.shape, dtype=jax.dtypes.float0)


@functools.cache
def _make_trace_specular(order, epsilon, hit_tol, min_len):
    """Build the custom-VJP megakernel entry for one static config.

    ``pallas_call`` has no JVP/VJP path for kernels with scratch refs, and
    differentiating the fused blockage sweep would be wasteful anyway: the
    mask is boolean and the path vertices depend only on the cheap
    geometry phase. Forward runs the fused kernel; backward re-derives the
    vertices with :func:`_xla_trace_vertices` and pulls cotangents through
    that (no blockage work in the backward pass).
    """

    @jax.custom_vjp
    def traced(tx, rx, mirror_vertices, mirror_normals, cand_tris, mesh_tv, active):
        return _pallas_trace_specular_impl(
            tx,
            rx,
            mirror_vertices,
            mirror_normals,
            cand_tris,
            mesh_tv,
            active,
            order=order,
            epsilon=epsilon,
            hit_tol=hit_tol,
            min_len=min_len,
        )

    def fwd(tx, rx, mirror_vertices, mirror_normals, cand_tris, mesh_tv, active):
        out = traced(
            tx, rx, mirror_vertices, mirror_normals, cand_tris, mesh_tv, active
        )
        return out, (tx, rx, mirror_vertices, mirror_normals, cand_tris, mesh_tv, active)

    def bwd(res, cotangents):
        tx, rx, mirror_vertices, mirror_normals, cand_tris, mesh_tv, active = res
        g_verts, _ = cotangents  # The boolean mask carries no gradient.
        g_verts = jnp.where(jnp.isfinite(g_verts), g_verts, 0.0)

        def f(tx_, rx_, mv_, mn_):
            return _xla_trace_vertices(tx_, rx_, mv_, mn_, order)

        _, vjp = jax.vjp(f, tx, rx, mirror_vertices, mirror_normals)
        g_tx, g_rx, g_mv, g_mn = vjp(g_verts)
        return (
            g_tx,
            g_rx,
            g_mv,
            g_mn,
            _zero_cotangent(cand_tris),
            _zero_cotangent(mesh_tv),
            _zero_cotangent(active),
        )

    traced.defvjp(fwd, bwd)
    return traced


def pallas_trace_specular(
    tx_vertices,
    rx_vertices,
    mirror_vertices,
    mirror_normals,
    candidate_triangles,
    triangle_vertices,
    active_triangles,
    *,
    order: int,
    epsilon: float,
    hit_tol: float,
    min_len: float,
):
    """Differentiable fused trace (see :func:`_pallas_trace_specular_impl`).

    Vertices are differentiable w.r.t. TX/RX positions and the mirror
    geometry via an XLA recompute in the backward pass; the validity mask
    and the blockage inputs carry no gradient.
    """
    fn = _make_trace_specular(order, epsilon, hit_tol, min_len)
    if active_triangles is None:
        active_triangles = jnp.ones(
            (triangle_vertices.shape[0],), dtype=jnp.bool_
        )
    return fn(
        tx_vertices,
        rx_vertices,
        mirror_vertices,
        mirror_normals,
        candidate_triangles,
        triangle_vertices,
        active_triangles,
    )
