"""Machine-ABX: wavefront DTW vs brute force, metric sanity, CLI."""

import json
import subprocess
import sys

import numpy as np
import pytest

from vectorquantizedcpc_tpu.eval.abx import (
    abx_error_rate,
    batched_dtw,
    load_feature_dir,
    pairwise_dtw,
)


def dtw_reference(a, b, metric="cosine"):
    """Naive O(NM) DTW, path-length normalized (test oracle)."""
    if metric == "cosine":
        an = a / np.maximum(np.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
        bn = b / np.maximum(np.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
        cost = 1.0 - an @ bn.T
    else:
        cost = np.sqrt(
            np.maximum(
                (a * a).sum(-1)[:, None]
                + (b * b).sum(-1)[None, :]
                - 2 * a @ b.T,
                0,
            )
        )
    n, m = cost.shape
    d = np.full((n, m), np.inf)
    ln = np.zeros((n, m), np.int64)
    d[0, 0], ln[0, 0] = cost[0, 0], 1
    for i in range(n):
        for j in range(m):
            if i == 0 and j == 0:
                continue
            cands = []
            if j > 0:
                cands.append((d[i, j - 1], ln[i, j - 1]))
            if i > 0:
                cands.append((d[i - 1, j], ln[i - 1, j]))
            if i > 0 and j > 0:
                cands.append((d[i - 1, j - 1], ln[i - 1, j - 1]))
            best = min(c[0] for c in cands)
            # Prefer diagonal on ties, matching the wavefront's selection.
            if i > 0 and j > 0 and d[i - 1, j - 1] == best:
                bl = ln[i - 1, j - 1]
            elif j > 0 and d[i, j - 1] == best:
                bl = ln[i, j - 1]
            else:
                bl = ln[i - 1, j]
            d[i, j] = cost[i, j] + best
            ln[i, j] = bl + 1
    return d[n - 1, m - 1] / ln[n - 1, m - 1]


@pytest.mark.parametrize("metric", ["cosine", "euclidean"])
def test_batched_dtw_matches_bruteforce(metric):
    rng = np.random.default_rng(0)
    lens_a = [5, 9, 1, 7]
    lens_b = [8, 3, 6, 7]
    dim = 4
    n, m = max(lens_a), max(lens_b)
    a = np.zeros((4, n, dim), np.float32)
    b = np.zeros((4, m, dim), np.float32)
    seqs = []
    for p, (la, lb) in enumerate(zip(lens_a, lens_b)):
        sa = rng.normal(size=(la, dim)).astype(np.float32)
        sb = rng.normal(size=(lb, dim)).astype(np.float32)
        a[p, :la], b[p, :lb] = sa, sb
        seqs.append((sa, sb))
    # Padding must not affect results: poison the padded region.
    a[:, :, :] += 0
    got = batched_dtw(a, b, np.array(lens_a), np.array(lens_b), metric)
    want = np.array([dtw_reference(sa, sb, metric) for sa, sb in seqs])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_dtw_identity_is_zero_and_symmetric():
    rng = np.random.default_rng(1)
    feats = [
        rng.normal(size=(t, 6)).astype(np.float32) for t in (4, 7, 5)
    ]
    dist = pairwise_dtw(feats)
    assert np.allclose(np.diag(dist), 0)
    np.testing.assert_allclose(dist, dist.T, atol=1e-7)
    assert (dist[np.triu_indices(3, k=1)] > 0).all()


def _toy_items(rng, separable=True, n_spk=3, n_utt=3):
    """Two 'phoneme categories' as distinct directions + speaker offsets."""
    feats, cats, spks = [], [], []
    proto = {"aa": np.array([1.0, 0, 0, 0]), "ee": np.array([0, 1.0, 0, 0])}
    for cat, base in proto.items():
        for s in range(n_spk):
            off = 0.3 * rng.normal(size=4) if separable else None
            for _ in range(n_utt):
                t = rng.integers(4, 9)
                if separable:
                    f = base[None, :] + off[None, :] + 0.05 * rng.normal(size=(t, 4))
                else:
                    f = rng.normal(size=(t, 4))
                feats.append(f.astype(np.float32))
                cats.append(cat)
                spks.append(f"s{s}")
    return feats, cats, spks


def test_abx_separable_categories_score_well():
    rng = np.random.default_rng(2)
    feats, cats, spks = _toy_items(rng, separable=True)
    err = abx_error_rate(feats, cats, spks, across=True)
    assert err < 0.05, err
    err_w = abx_error_rate(feats, cats, spks, across=False)
    assert err_w < 0.05, err_w


def test_abx_random_features_near_chance():
    rng = np.random.default_rng(3)
    feats, cats, spks = _toy_items(rng, separable=False, n_spk=3, n_utt=6)
    err = abx_error_rate(feats, cats, spks, across=True)
    assert 0.3 < err < 0.7, err


def test_abx_cli_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    feats, cats, spks = _toy_items(rng, separable=True, n_spk=2, n_utt=2)
    fdir = tmp_path / "codes"
    fdir.mkdir()
    items = {}
    for i, (f, c, s) in enumerate(zip(feats, cats, spks)):
        stem = f"utt{i:03d}"
        np.savetxt(fdir / f"{stem}.txt", f, fmt="%.16f")
        items[stem] = {"category": c, "speaker": s}
    items_path = tmp_path / "items.json"
    items_path.write_text(json.dumps(items))

    lf, lc, ls = load_feature_dir(str(fdir), str(items_path))
    assert len(lf) == len(feats) and set(lc) == {"aa", "ee"}

    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "vectorquantizedcpc_tpu.cli.eval_abx",
            "--features",
            str(fdir),
            "--items",
            str(items_path),
            "--platform",
            "cpu",
        ],
        capture_output=True,
        text=True,
        check=True,
    )
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["abx_error_rate"] < 0.1
    assert payload["task"] == "across"


def test_item_file_parser(tmp_path, rng):
    """Official bootphon .item format: header, 7 columns, onset/offset in
    seconds -> frames at 0.02 s; categories = triphones."""
    from vectorquantizedcpc_tpu.eval.abx import load_item_file

    fdir = tmp_path / "feats"
    fdir.mkdir()
    # Two utterances, 50 frames x 4 dims each (= 1.0 s at 20 ms frames).
    for stem in ("utt_a", "utt_b"):
        np.savetxt(fdir / f"{stem}.txt", rng.normal(size=(50, 4)))

    item = tmp_path / "test.item"
    item.write_text(
        "#file onset offset #phone prev-phone next-phone speaker\n"
        "utt_a 0.10 0.30 ay n l s01\n"      # frames [5, 15)
        "utt_a 0.40 0.50 eh n l s01\n"      # frames [20, 25)
        "utt_b 0.00 0.20 ay n l s02\n"      # frames [0, 10)
        "utt_b 0.90 1.20 eh n l s02\n"      # clipped to [45, 50)
        "utt_b 0.50 0.52 eh n l s02\n"      # 1 frame -> skipped
        "missing 0.0 0.5 ay n l s03\n"      # no feature file -> skipped
    )
    feats, cats, spks = load_item_file(str(item), str(fdir))
    assert len(feats) == 4
    assert [f.shape[0] for f in feats] == [10, 5, 10, 5]
    assert cats == ["n-ay-l", "n-eh-l", "n-ay-l", "n-eh-l"]
    assert spks == ["s01", "s01", "s02", "s02"]

    with pytest.raises(ValueError, match="7 columns"):
        bad = tmp_path / "bad.item"
        bad.write_text("utt_a 0.1 0.2 ay n\n")
        load_item_file(str(bad), str(fdir))


def test_item_file_cli(tmp_path, rng):
    """eval_abx --item-file end to end: two well-separated triphone
    clusters across two speakers -> near-zero error."""
    from vectorquantizedcpc_tpu.eval.abx import load_item_file  # noqa: F401

    fdir = tmp_path / "feats"
    fdir.mkdir()
    lines = ["#file onset offset #phone prev-phone next-phone speaker"]
    for si, spk in enumerate(("s01", "s02")):
        for ci, tri in enumerate((("a", "x", "b"), ("a", "y", "b"))):
            for k in range(2):
                stem = f"{spk}_{ci}_{k}"
                base = np.zeros((20, 4)) + 5.0 * ci
                base[:, ci] += 2.0
                np.savetxt(
                    fdir / f"{stem}.txt",
                    base + 0.05 * rng.normal(size=(20, 4)),
                )
                lines.append(
                    f"{stem} 0.0 0.4 {tri[1]} {tri[0]} {tri[2]} {spk}"
                )
    item = tmp_path / "cli.item"
    item.write_text("\n".join(lines) + "\n")

    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "vectorquantizedcpc_tpu.cli.eval_abx",
            "--features", str(fdir),
            "--item-file", str(item),
            "--platform", "cpu",
        ],
        capture_output=True,
        text=True,
        check=True,
    )
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["abx_error_rate"] < 0.1
    assert payload["n_categories"] == 2
    assert payload["n_speakers"] == 2
