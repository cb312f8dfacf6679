"""Machine-ABX discriminability over latent dumps (TPU-batched DTW).

The reference evaluates acoustic units by exporting latents (encode.py) and
running the external ZeroSpeech-2019 ABX toolkit (reference README.md:89-102;
bootphon/zerospeech2020). This module implements the metric natively so unit
quality can be tracked hermetically:

- **DTW** between two feature sequences with per-frame cosine (or euclidean)
  distance, normalized by optimal-path length — the ABXpy convention.
- **Batched TPU formulation**: per-frame distance matrices are one big
  batched matmul (MXU), and the DTW dynamic program runs as a `lax.scan`
  over anti-diagonal wavefronts, vectorized over (pair, wavefront) — no
  per-cell Python.
- **ABX score**: for a triple (A, B, X) with category(A)=category(X) and
  category(B)≠category(X), the model is correct when DTW(X,A) < DTW(X,B).
  Across-speaker task: A and B share a speaker, X is a different speaker
  (the ZeroSpeech-2019 setup). Within-speaker: all three share one.
  Aggregation is hierarchical (triples → (speaker, category-pair) cells →
  symmetrized category pairs → mean), following the toolkit's averaging
  order. This is a faithful re-implementation of the metric, not of the
  toolkit's triphone item extraction — categories are caller-provided.
"""

from __future__ import annotations

import functools
import itertools
import json
from pathlib import Path
from typing import Dict, List, Sequence, Tuple

import numpy as np

__all__ = ["batched_dtw", "pairwise_dtw", "abx_error_rate", "load_feature_dir"]


def _frame_costs(a, b, metric: str):
    """Per-frame distance matrices for padded batches.

    a: (P, N, D), b: (P, M, D) -> (P, N, M). Cosine = 1 - normalized dot
    (one batched matmul); euclidean via the |x|^2 + |y|^2 - 2xy expansion
    (also one matmul), matching the reference's VQ distance trick
    (reference model.py:126-129).
    """
    import jax.numpy as jnp

    if metric == "cosine":
        an = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
        bn = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
        return 1.0 - jnp.einsum("pnd,pmd->pnm", an, bn)
    if metric == "euclidean":
        sq = (
            jnp.sum(a * a, -1)[:, :, None]
            + jnp.sum(b * b, -1)[:, None, :]
            - 2.0 * jnp.einsum("pnd,pmd->pnm", a, b)
        )
        return jnp.sqrt(jnp.maximum(sq, 0.0))
    raise ValueError(f"unknown metric {metric!r} (cosine|euclidean)")


def _dtw_wavefront(costs, len_a, len_b):
    """Path-length-normalized DTW over padded cost matrices.

    costs: (P, N, M) with arbitrary values outside [len_a[p], len_b[p]) —
    invalid cells are masked inside the scan. Returns (P,) mean per-step
    cost along the optimal (total-cost) path, the ABXpy normalization.

    DP over anti-diagonals: cell (i, j) with k = i + j depends only on
    diagonals k-1 and k-2, so the carry is two (P, N) wavefronts (indexed
    by i) and the scan runs N+M-1 steps, each a vectorized (P, N) update.
    """
    import jax
    import jax.numpy as jnp

    P, N, M = costs.shape
    BIG = jnp.float32(1e30)

    len_a = jnp.asarray(len_a, jnp.int32)
    len_b = jnp.asarray(len_b, jnp.int32)
    k_final = len_a + len_b - 2  # diagonal holding (la-1, lb-1)
    i_final = len_a - 1

    ar = jnp.arange(N)

    def shift_i(x, fill):
        # x at wavefront index i-1 (i.e. previous row).
        return jnp.concatenate(
            [jnp.full((P, 1), fill, x.dtype), x[:, :-1]], 1
        )

    def step(carry, k):
        d_pp, l_pp, d_p, l_p, ans, ans_l = carry
        # c_k[p, i] = costs[p, i, k - i]; O(P*N) gather per diagonal.
        c_k = jnp.take_along_axis(
            costs, jnp.clip(k - ar, 0, M - 1)[None, :, None], axis=2
        )[..., 0]

        valid = (
            (ar[None, :] <= jnp.minimum(k, len_a[:, None] - 1))
            & (k - ar[None, :] >= 0)
            & (k - ar[None, :] <= len_b[:, None] - 1)
        )

        up = d_p  # (i, j-1) lives at wavefront index i of k-1
        left = shift_i(d_p, BIG)  # (i-1, j) at index i-1 of k-1
        diag = shift_i(d_pp, BIG)  # (i-1, j-1) at index i-1 of k-2
        up_l, left_l, diag_l = l_p, shift_i(l_p, 0), shift_i(l_pp, 0)

        # j-1 < 0 / i-1 < 0 predecessors are invalid.
        j = k - ar[None, :]
        up = jnp.where(j >= 1, up, BIG)
        left = jnp.where(ar[None, :] >= 1, left, BIG)
        diag = jnp.where((ar[None, :] >= 1) & (j >= 1), diag, BIG)

        best = jnp.minimum(jnp.minimum(up, left), diag)
        best_l = jnp.where(
            best == diag, diag_l, jnp.where(best == up, up_l, left_l)
        )
        # Origin cell (0, 0) has no predecessor.
        is_origin = (ar[None, :] == 0) & (j == 0)
        best = jnp.where(is_origin, 0.0, best)
        best_l = jnp.where(is_origin, 0, best_l)

        d_k = jnp.where(valid, c_k + best, BIG)
        l_k = jnp.where(valid, best_l + 1, 0)

        hit = k == k_final  # (P,)
        d_at = jnp.take_along_axis(d_k, i_final[:, None], axis=1)[:, 0]
        l_at = jnp.take_along_axis(l_k, i_final[:, None], axis=1)[:, 0]
        ans = jnp.where(hit, d_at, ans)
        ans_l = jnp.where(hit, l_at, ans_l)
        return (d_p, l_p, d_k, l_k, ans, ans_l), None

    init = (
        jnp.full((P, N), BIG),
        jnp.zeros((P, N), jnp.int32),
        jnp.full((P, N), BIG),
        jnp.zeros((P, N), jnp.int32),
        jnp.full((P,), BIG),
        jnp.ones((P,), jnp.int32),
    )
    (_, _, _, _, ans, ans_l), _ = jax.lax.scan(
        step, init, jnp.arange(N + M - 1)
    )
    return ans / jnp.maximum(ans_l, 1)


@functools.lru_cache(maxsize=None)
def _jitted_dtw(metric: str):
    # Module-level per-metric cache: every same-shape chunk of a pairwise
    # sweep reuses ONE compilation (a fresh jit wrapper per call would
    # retrace+recompile the identical program once per chunk and dominate
    # ABX wall time).
    import jax
    import jax.numpy as jnp

    return jax.jit(
        lambda a, b, la, lb: _dtw_wavefront(
            _frame_costs(a, b, metric).astype(jnp.float32), la, lb
        )
    )


def batched_dtw(
    feats_a,
    feats_b,
    len_a,
    len_b,
    metric: str = "cosine",
):
    """DTW distances for P aligned pairs of padded sequences.

    feats_a: (P, N, D), feats_b: (P, M, D); len_*: (P,) valid lengths.
    Returns np.ndarray (P,) of path-length-normalized DTW costs.
    """
    return np.asarray(_jitted_dtw(metric)(feats_a, feats_b, len_a, len_b))


def pairwise_dtw(
    features: Sequence[np.ndarray],
    metric: str = "cosine",
    chunk: int = 256,
) -> np.ndarray:
    """Full symmetric DTW distance matrix over a set of sequences.

    Pads to the common max length, batches pair chunks through the TPU
    wavefront kernel. O(U^2) pairs — intended for eval-sized sets.
    """
    u = len(features)
    lens = np.array([f.shape[0] for f in features], np.int32)
    dim = features[0].shape[1]
    n = int(lens.max())
    padded = np.zeros((u, n, dim), np.float32)
    for i, f in enumerate(features):
        padded[i, : f.shape[0]] = f

    ii, jj = np.triu_indices(u, k=1)
    dist = np.zeros((u, u), np.float64)
    for s in range(0, len(ii), chunk):
        a_idx, b_idx = ii[s : s + chunk], jj[s : s + chunk]
        d = batched_dtw(
            padded[a_idx], padded[b_idx], lens[a_idx], lens[b_idx], metric
        )
        dist[a_idx, b_idx] = d
        dist[b_idx, a_idx] = d
    return dist


def abx_error_rate(
    features: Sequence[np.ndarray],
    categories: Sequence[str],
    speakers: Sequence[str],
    across: bool = True,
    metric: str = "cosine",
    max_triples_per_cell: int = 512,
    seed: int = 0,
) -> float:
    """Hierarchically-averaged ABX error rate in [0, 1] (0 = perfect).

    across=True: ZeroSpeech across-speaker task — A, B same speaker, X a
    different speaker. across=False: within-speaker (all three one speaker).
    """
    cats = np.asarray(categories)
    spks = np.asarray(speakers)
    dist = pairwise_dtw(features, metric=metric)
    rng = np.random.default_rng(seed)

    by = {}  # (cat, spk) -> indices
    for idx, (c, s) in enumerate(zip(cats, spks)):
        by.setdefault((c, s), []).append(idx)

    uniq_cats = sorted(set(cats))
    uniq_spks = sorted(set(spks))
    pair_scores: Dict[Tuple[str, str], List[float]] = {}

    for ca, cb in itertools.permutations(uniq_cats, 2):
        for s_ab in uniq_spks:
            a_pool = by.get((ca, s_ab), [])
            b_pool = by.get((cb, s_ab), [])
            if not a_pool or not b_pool:
                continue
            x_spks = (
                [s for s in uniq_spks if s != s_ab] if across else [s_ab]
            )
            for s_x in x_spks:
                x_pool = by.get((ca, s_x), [])
                triples = [
                    (a, b, x)
                    for a in a_pool
                    for b in b_pool
                    for x in x_pool
                    if x != a and x != b and a != b
                ]
                if not triples:
                    continue
                if len(triples) > max_triples_per_cell:
                    sel = rng.choice(
                        len(triples), max_triples_per_cell, replace=False
                    )
                    triples = [triples[i] for i in sel]
                t = np.array(triples)
                dxa = dist[t[:, 2], t[:, 0]]
                dxb = dist[t[:, 2], t[:, 1]]
                correct = np.where(dxa < dxb, 1.0, np.where(dxa == dxb, 0.5, 0.0))
                pair_scores.setdefault((ca, cb), []).append(float(correct.mean()))

    if not pair_scores:
        raise ValueError("no valid ABX triples (check categories/speakers)")

    # Symmetrize (ca, cb)/(cb, ca), then average over category pairs.
    sym: Dict[Tuple[str, str], List[float]] = {}
    for (ca, cb), scores in pair_scores.items():
        key = (min(ca, cb), max(ca, cb))
        sym.setdefault(key, []).append(float(np.mean(scores)))
    score = float(np.mean([np.mean(v) for v in sym.values()]))
    return 1.0 - score


def load_item_file(
    item_path: str,
    feature_dir: str,
    frame_period: float = 0.02,
    min_frames: int = 2,
) -> Tuple[List[np.ndarray], List[str], List[str]]:
    """Parse an official ZeroSpeech/bootphon ``.item`` file into ABX inputs.

    The ZR19 eval data ships triphone item files (consumed by the external
    toolkit the reference defers to, reference README.md:89-102) with a
    header line and one row per item::

        #file onset offset #phone prev-phone next-phone speaker
        s2801a 0.3825 0.5825 n ay l s2801a

    Each item becomes one ABX token: features are the latent frames of
    ``<file>.txt`` (an encode.py dump) within [onset, offset), its category
    the (prev, phone, next) triphone, its speaker the last column.

    ``frame_period``: seconds per latent frame. The encoder halves mel
    frames (conv stride 2, reference model.py:43) over a 10 ms mel hop
    (hop 160 @ 16 kHz, reference config.py:110) -> 0.02 s per latent frame.

    Items shorter than ``min_frames`` frames or referencing missing feature
    files are skipped (counted in the returned lists' length; the CLI
    reports the totals).
    """
    feats: List[np.ndarray] = []
    cats: List[str] = []
    spks: List[str] = []
    cache: Dict[str, np.ndarray] = {}
    root = Path(feature_dir)
    with open(item_path) as f:
        lines = [l.strip() for l in f if l.strip()]
    if lines and lines[0].startswith("#"):
        lines = lines[1:]
    for line in lines:
        parts = line.split()
        if len(parts) != 7:
            raise ValueError(
                f"malformed .item line (want 7 columns): {line!r}"
            )
        fname, onset, offset, phone, prev, nxt, speaker = parts
        if fname not in cache:
            path = root / f"{fname}.txt"
            if not path.exists():
                cache[fname] = None  # type: ignore[assignment]
            else:
                cache[fname] = np.loadtxt(path, dtype=np.float32, ndmin=2)
        arr = cache[fname]
        if arr is None:
            continue
        lo = int(round(float(onset) / frame_period))
        hi = int(round(float(offset) / frame_period))
        seg = arr[max(lo, 0) : min(hi, arr.shape[0])]
        if seg.shape[0] < min_frames:
            continue
        feats.append(seg)
        cats.append(f"{prev}-{phone}-{nxt}")
        spks.append(speaker)
    if not feats:
        raise FileNotFoundError(
            f"no usable items from {item_path} with features in {feature_dir}"
        )
    return feats, cats, spks


def load_feature_dir(
    feature_dir: str, items_json: str
) -> Tuple[List[np.ndarray], List[str], List[str]]:
    """Load encode.py-format ``<stem>.txt`` dumps plus an item file.

    items_json: {"<stem>": {"category": ..., "speaker": ...}, ...}. Stems
    missing on either side are skipped (reported by the CLI).
    """
    with open(items_json) as f:
        items = json.load(f)
    feats, cats, spks = [], [], []
    for stem, meta in sorted(items.items()):
        path = Path(feature_dir) / f"{stem}.txt"
        if not path.exists():
            continue
        arr = np.loadtxt(path, dtype=np.float32, ndmin=2)
        feats.append(arr)
        cats.append(str(meta["category"]))
        spks.append(str(meta["speaker"]))
    if not feats:
        raise FileNotFoundError(
            f"no feature files from {items_json} found under {feature_dir}"
        )
    return feats, cats, spks
