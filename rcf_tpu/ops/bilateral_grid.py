"""O(N) bilateral-grid filtering for dense-CRF mean field (TPU-native).

The reference accelerates the mean-field message pass with a permutohedral
lattice in CUDA (`tools/torchCRF/src/permutohedral_gpu.cu:432`): splat each
pixel onto a sparse high-dimensional lattice, blur along lattice axes, and
slice back. Its dynamic GPU hash table is hostile to XLA. This module is the
TPU-first equivalent (SURVEY.md §7, VERDICT round-1 item 2): an axis-aligned
bilateral grid over Z^d whose *sparse occupancy* is handled with sort /
cumsum / gather — no hash tables, and (crucially) no per-iteration scatters:

* cells are linearized into a single int32 index (grid dims are σ-spaced, so
  the full 5-D grid of a 1080p frame still fits in 31 bits);
* splat entries (pixel × 2^d multilinear corners) are sorted by cell ONCE
  per image; each mean-field iteration then reduces entry values per cell
  with one cumsum + two boundary gathers (sorted segment sums);
* the [1, 2, 1]^d blur walks precomputed neighbor *ranks* (dense rank map
  built once per image) — two gathers per dimension per iteration;
* slicing gathers cell values back through the same entry structure.

Per iteration the filter is therefore O(N · 2^d) gathers + one cumsum —
every op is a dense XLA gather/cumsum that TPUs execute at HBM bandwidth,
vs. the O(N^2) MXU attention engine in `ops/crf.py` (exact but quadratic).

Kernel shape: grid spacing is σ (features pre-scaled by 1/σ), multilinear
splat/slice contribute triangle kernels (var 1/6 each) and the [1,2,1] blur
var 1/2, approximating the exact exp(-||Δf||²/2) Gaussian the attention
engine computes; MAP agreement with the exact engine is validated in
`tests/test_bilateral_grid.py` (≥97% bar, VERDICT item 2).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class GridLattice:
    """Per-image splat/blur/slice structure (all shapes static).

    E  = n_pixels * 2^d   (splat entries)
    C  = E                 (cell-slot upper bound; slots >= n_unique are dead)
    """

    pix_sorted: jnp.ndarray   # [E] int32  source pixel of each cell-sorted entry
    w_sorted: jnp.ndarray     # [E] f32    entry weight, cell-sorted order
    seg_id: jnp.ndarray       # [E] int32  cell rank of each cell-sorted entry
    start_pos: jnp.ndarray    # [C] int32  first entry position of rank r (dead: E)
    end_pos: jnp.ndarray      # [C] int32  last entry position of rank r (dead: -1)
    valid: jnp.ndarray        # [C] bool   rank slot is a real cell
    nb_rank: jnp.ndarray      # [2d, C] int32  neighbor rank per axis/dir (-1: none)
    entry_rank: jnp.ndarray   # [E] int32  cell rank of each entry in ORIGINAL order
    w_orig: jnp.ndarray       # [E] f32    entry weight in original order
    n_corners: int = struct.field(pytree_node=False, default=32)


def _grid_dims(feat_max: Sequence[float]) -> tuple[int, ...]:
    """Static cell count per dim for features in [0, feat_max[d]]."""
    return tuple(int(np.floor(m)) + 2 for m in feat_max)


def build_lattice(feat: jnp.ndarray, gdims: Sequence[int]) -> GridLattice:
    """feat: [N, d] features already scaled by 1/σ (so grid spacing is 1).

    gdims must be static and satisfy prod(gdims) < 2^31 (checked here).
    """
    n, d = feat.shape
    gdims = tuple(int(g) for g in gdims)
    n_grid = int(np.prod(gdims))
    assert n_grid < 2**31, f"grid {gdims} overflows int32 ({n_grid})"
    strides = np.concatenate([np.cumprod(gdims[::-1])[::-1][1:], [1]]).astype(np.int32)

    f0 = jnp.floor(feat)
    t = feat - f0  # [N, d] in [0, 1)
    f0 = f0.astype(jnp.int32)

    corners = np.stack(np.meshgrid(*([np.arange(2)] * d), indexing="ij"),
                       axis=-1).reshape(-1, d).astype(np.int32)  # [2^d, d]
    n_c = corners.shape[0]
    # [N, 2^d] linear cell index and multilinear weight per entry.
    cell = jnp.einsum("ncd,d->nc", f0[:, None, :] + corners[None], strides,
                      preferred_element_type=jnp.int32)
    w = jnp.prod(jnp.where(corners[None].astype(bool), t[:, None, :],
                           1.0 - t[:, None, :]), axis=-1)
    e = n * n_c
    cell = cell.reshape(e)
    w_orig = w.reshape(e).astype(jnp.float32)
    pix = jnp.repeat(jnp.arange(n, dtype=jnp.int32), n_c)

    order = jnp.argsort(cell)
    cell_s = cell[order]
    pix_sorted = pix[order]
    w_sorted = w_orig[order]

    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), cell_s[1:] != cell_s[:-1]])
    seg_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1  # [E], < n_unique

    arange_e = jnp.arange(e, dtype=jnp.int32)
    start_pos = jnp.full((e,), e, jnp.int32).at[seg_id].min(arange_e)
    end_pos = jnp.full((e,), -1, jnp.int32).at[seg_id].max(arange_e)
    valid = end_pos >= 0

    # Cell key per rank slot (all writers of a slot carry the same key).
    cell_key = jnp.full((e,), 0, jnp.int32).at[seg_id].set(cell_s)
    # Dense rank map over the grid (+1 parking slot for dead ranks).
    park = jnp.where(valid, cell_key, n_grid)
    rank_map = jnp.full((n_grid + 1,), -1, jnp.int32).at[park].set(
        arange_e, mode="drop")
    rank_map = rank_map.at[n_grid].set(-1)

    # Per-dim integer coords of each rank (for boundary checks).
    coords = []
    rem = cell_key
    for s in strides:
        coords.append(rem // int(s))
        rem = rem % int(s)
    nb = []
    for dim in range(d):
        for step in (-1, 1):
            cd = coords[dim] + step
            in_range = (cd >= 0) & (cd < gdims[dim]) & valid
            nk = jnp.clip(cell_key + step * int(strides[dim]), 0, n_grid)
            r = rank_map[jnp.where(in_range, nk, n_grid)]
            nb.append(r)
    nb_rank = jnp.stack(nb)  # [2d, E]

    # Rank of each entry in original (pixel-major) order, for slicing.
    entry_rank = jnp.zeros((e,), jnp.int32).at[order].set(seg_id)

    return GridLattice(
        pix_sorted=pix_sorted, w_sorted=w_sorted, seg_id=seg_id,
        start_pos=start_pos, end_pos=end_pos, valid=valid, nb_rank=nb_rank,
        entry_rank=entry_rank, w_orig=w_orig, n_corners=n_c,
    )


def lattice_filter(lat: GridLattice, values: jnp.ndarray,
                   blur_taps: tuple[float, float] = (2.0, 1.0)) -> jnp.ndarray:
    """Unnormalized Gaussian filter of per-pixel `values` [N] -> [N].

    Splat (sorted segment sums via cumsum) -> separable [w1, w0, w1] blur
    over neighbor ranks -> multilinear slice. Normalize by
    `lattice_filter(lat, ones)` (cacheable across mean-field iterations).
    """
    e = lat.w_sorted.shape[0]
    vals = lat.w_sorted * values[lat.pix_sorted]
    csum = jnp.concatenate([jnp.zeros((1,), vals.dtype), jnp.cumsum(vals)])
    cell_vals = jnp.where(
        lat.valid,
        csum[lat.end_pos + 1] - csum[jnp.clip(lat.start_pos, 0, e)],
        0.0,
    )
    w0, w1 = blur_taps
    n_dirs = lat.nb_rank.shape[0]
    padded = jnp.concatenate([cell_vals, jnp.zeros((1,), cell_vals.dtype)])
    for i in range(0, n_dirs, 2):
        lo = padded[lat.nb_rank[i]] * (lat.nb_rank[i] >= 0)
        hi = padded[lat.nb_rank[i + 1]] * (lat.nb_rank[i + 1] >= 0)
        cell_vals = w0 * cell_vals + w1 * (lo + hi)
        padded = jnp.concatenate([cell_vals, jnp.zeros((1,), cell_vals.dtype)])

    sliced = lat.w_orig * cell_vals[lat.entry_rank]
    n = e // lat.n_corners
    return jnp.sum(sliced.reshape(n, lat.n_corners), axis=-1)


@functools.partial(jax.jit, static_argnames=("gdims",))
def _filter_once(feat, values, gdims):
    lat = build_lattice(feat, gdims)
    return lattice_filter(lat, values) / jnp.maximum(
        lattice_filter(lat, jnp.ones_like(values)), 1e-20)


def normalized_bilateral_filter(feat: jnp.ndarray, values: jnp.ndarray,
                                feat_max: Sequence[float]) -> jnp.ndarray:
    """One-shot normalized filter (reference: permutohedral `filter()`).

    feat [N, d] scaled by 1/σ; values [N]; feat_max static per-dim maxima.
    """
    return _filter_once(feat, values, _grid_dims(feat_max))
