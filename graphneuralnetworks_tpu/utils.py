"""Shared utilities: edge-id encodings, feature concatenation, 1-WL colors.

Reference parity: GNNGraphs/src/utils.jl — ``edge_encoding``/``edge_decoding``
bijections between edges and linear ids for the directed/undirected x
self-loop cases (utils.jl:189-268), ``color_refinement`` 1-WL (365-389),
``check_num_nodes/edges`` (1-28), ``normalize_graphdata`` (126-183).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "edge_encoding",
    "edge_decoding",
    "color_refinement",
    "check_num_nodes",
    "check_num_edges",
    "normalize_graphdata",
]


def normalize_graphdata(data, *, default_name: str = "x", n: int,
                        duplicate_if_needed: bool = False) -> dict:
    """Normalize user-provided feature data into a dict of [n, ...] arrays.

    Reference: GNNGraphs/src/utils.jl:126-170 (with the reference's
    trailing-obs layout transposed to our leading-obs layout):

    - ``None`` -> empty dict;
    - a bare array -> ``{default_name: array}``;
    - ``n <= 1``: vectors of size D are unsqueezed to [1, D] (global feature
      vectors become one-observation matrices);
    - ``duplicate_if_needed``: an array with leading dim ``n // 2`` is
      duplicated along the observation axis — the reference uses this when an
      undirected input doubles the edge count but features were given for
      each undirected edge once;
    - every array must end up with leading dim ``n`` (else ValueError).
    """
    if data is None:
        return {}
    if not isinstance(data, dict):
        data = {default_name: data}
    out = {}
    for k, v in data.items():
        v = np.asarray(v)
        if n <= 1 and (v.ndim == 0 or v.shape[0] != 1):
            v = v[None]
        if duplicate_if_needed and n > 0 and v.ndim and v.shape[0] == n // 2 \
                and v.shape[0] != n:
            v = np.concatenate([v, v], axis=0)
        if n > 1 and (v.ndim == 0 or v.shape[0] != n):
            raise ValueError(
                f"feature {k!r}: wrong size in leading dimension, expected "
                f"{n} but got {v.shape[0] if v.ndim else 'scalar'}")
        out[k] = v
    return out


def check_num_nodes(g, x) -> None:
    """Leading dim of ``x`` must be the padded node count (utils.jl:1-14)."""
    if x is not None and hasattr(x, "shape") and x.shape[0] != g.n_pad:
        raise ValueError(
            f"feature leading dim {x.shape[0]} != padded node count {g.n_pad}")


def check_num_edges(g, e) -> None:
    """utils.jl:16-28."""
    if e is not None and hasattr(e, "shape") and e.shape[0] != g.e_pad:
        raise ValueError(
            f"feature leading dim {e.shape[0]} != padded edge count {g.e_pad}")


def edge_encoding(s, r, n: int, *, directed: bool = True,
                  self_loops: bool = True):
    """Bijection (s, r) -> linear edge id in [0, maxid) (utils.jl:189-238).

    Four cases mirroring the reference: directed/undirected with/without
    self-loops. 0-based everywhere. Returns (idx, maxid).
    """
    s = np.asarray(s, dtype=np.int64)
    r = np.asarray(r, dtype=np.int64)
    if directed and self_loops:
        return s * n + r, n * n
    if directed and not self_loops:
        # skip the diagonal: rank of (s, r) among off-diagonal pairs
        idx = s * (n - 1) + r - (r > s)
        return idx, n * (n - 1)
    lo = np.minimum(s, r)
    hi = np.maximum(s, r)
    if self_loops:
        # pairs (i, j) with i <= j, row-major by i
        idx = lo * n - lo * (lo - 1) // 2 + (hi - lo)
        return idx, n * (n + 1) // 2
    # pairs (i, j) with i < j
    idx = lo * (n - 1) - lo * (lo - 1) // 2 + (hi - lo - 1)
    return idx, n * (n - 1) // 2


def edge_decoding(idx, n: int, *, directed: bool = True,
                  self_loops: bool = True):
    """Inverse of :func:`edge_encoding` (utils.jl:240-268)."""
    idx = np.asarray(idx, dtype=np.int64)
    if directed and self_loops:
        return (idx // n).astype(np.int32), (idx % n).astype(np.int32)
    if directed and not self_loops:
        s = idx // (n - 1)
        rem = idx % (n - 1)
        r = rem + (rem >= s)
        return s.astype(np.int32), r.astype(np.int32)
    if self_loops:
        # invert triangular (i <= j) ranking
        i = (np.floor((2 * n + 1 - np.sqrt((2 * n + 1) ** 2 - 8.0 * idx)) / 2)
             ).astype(np.int64)
        base = i * n - i * (i - 1) // 2
        # fix float edge cases
        while True:
            over = base > idx
            if not over.any():
                break
            i = i - over
            base = i * n - i * (i - 1) // 2
        j = i + (idx - base)
        return i.astype(np.int32), j.astype(np.int32)
    # i < j strict
    i = (np.floor((2 * n - 1 - np.sqrt((2 * n - 1) ** 2 - 8.0 * idx)) / 2)
         ).astype(np.int64)
    base = i * (n - 1) - i * (i - 1) // 2
    while True:
        over = base > idx
        if not over.any():
            break
        i = i - over
        base = i * (n - 1) - i * (i - 1) // 2
    j = i + 1 + (idx - base)
    return i.astype(np.int32), j.astype(np.int32)


def color_refinement(g, x0=None, *, max_iters: int = 100):
    """1-Weisfeiler-Leman color refinement (utils.jl:365-389). Host-side.

    Returns (colors[int32 N], num_colors, num_iters).
    """
    ne = int(g.num_edges)
    nn = int(g.num_nodes)
    s = np.asarray(g.senders)[:ne]
    r = np.asarray(g.receivers)[:ne]
    colors = (np.zeros(nn, np.int64) if x0 is None
              else np.asarray(x0, np.int64).copy())
    niters = 0
    for _ in range(max_iters):
        sigs = [tuple() for _ in range(nn)]
        buckets: dict[int, list[int]] = {i: [] for i in range(nn)}
        for a, b in zip(s.tolist(), r.tolist()):
            buckets[b].append(int(colors[a]))
        new_sigs = [(int(colors[i]), tuple(sorted(buckets[i])))
                    for i in range(nn)]
        mapping: dict = {}
        new_colors = np.empty(nn, np.int64)
        for i, sig in enumerate(new_sigs):
            if sig not in mapping:
                mapping[sig] = len(mapping)
            new_colors[i] = mapping[sig]
        niters += 1
        if len(set(new_colors.tolist())) == len(set(colors.tolist())) and \
                _same_partition(colors, new_colors):
            colors = new_colors
            break
        colors = new_colors
    return colors.astype(np.int32), len(set(colors.tolist())), niters


def _same_partition(a: np.ndarray, b: np.ndarray) -> bool:
    m: dict = {}
    for x, y in zip(a.tolist(), b.tolist()):
        if x in m and m[x] != y:
            return False
        m[x] = y
    return True
