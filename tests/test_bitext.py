"""Bitext mining: brute parity (mutual top-1 + distance margin) and the
source-broadcast guard."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _mk(ds_rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in ds_rows], pa.int64()),
                "embedding": pa.array(
                    [r[1] for r in ds_rows], pa.list_(pa.float32())
                ),
                "label": pa.array([r[2] for r in ds_rows], pa.int32()),
            }
        )
    ).repartition(3)


def _brute(rows):
    src = [(i, np.asarray(v, np.float64)) for i, v, l in rows if l == 0]
    tgt = [(i, np.asarray(v, np.float64)) for i, v, l in rows if l == 1]

    def cos(a, b):
        return round(
            float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6
        )

    out = {}
    fwd = {}
    for si, sv in src:
        scored = sorted(
            ((cos(sv, tv), -ti) for ti, tv in tgt), reverse=True
        )
        best_c, best_t = scored[0][0], -scored[0][1]
        second = scored[1][0] if len(scored) > 1 else -1.0
        fwd[si] = (best_t, best_c, round(best_c - second, 6))
    for ti, tv in tgt:
        scored = sorted(((cos(sv, tv), -si) for si, sv in src), reverse=True)
        best_s = -scored[0][1]
        if fwd.get(best_s, (None,))[0] == ti:
            t, c, m = fwd[best_s]
            out[(best_s, ti)] = (c, m)
    return out


@pytest.mark.usefixtures("ray_session")
def test_bitext_matches_bruteforce():
    from webscraper_ray.functions.ann import bitext_mutual_pairs

    rng = np.random.default_rng(21)
    rows = []
    vid = 0
    # planted translation pairs: tgt vec = small rotation of src vec
    for _ in range(6):
        v = rng.standard_normal(16).astype(np.float32)
        rows.append((vid, v.tolist(), 0))
        rows.append((vid + 100, (v + 0.05 * rng.standard_normal(16).astype(np.float32)).tolist(), 1))
        vid += 1
    # noise on both sides
    for _ in range(10):
        rows.append((vid + 200, rng.standard_normal(16).astype(np.float32).tolist(), int(rng.integers(0, 2))))
        vid += 1
    got = (
        bitext_mutual_pairs(_mk(rows))
        .to_pandas()
        .sort_values("src_id")
        .reset_index(drop=True)
    )
    exp = _brute(rows)
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        c, m = exp[(int(r["src_id"]), int(r["tgt_id"]))]
        assert (r["cos_sim"], r["margin"]) == (c, m)
    # the planted pairs are recovered
    planted = {(i, i + 100) for i in range(6)}
    assert planted <= {(int(a), int(b)) for a, b in zip(got["src_id"], got["tgt_id"])}


@pytest.mark.usefixtures("ray_session")
def test_bitext_broadcast_guard():
    from webscraper_ray.functions.ann import bitext_mutual_pairs

    rows = [(i, [1.0, 0.0], 0) for i in range(5)] + [(9, [1.0, 0.0], 1)]
    with pytest.raises(ValueError, match="broadcast"):
        bitext_mutual_pairs(_mk(rows), max_src_broadcast=3).to_pandas()
