"""pca_power_component: the exact-integer power iteration must recover
a PLANTED dominant direction (real spectral gap -> fast convergence),
and must track a float power iteration run under the same schedule on
the real corpus (validating the implementation independently of the
corpus's tiny random-data spectral gap)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _run_query(sf_dir):
    from webscraper_ray.queries import QUERIES

    t = QUERIES["pca_power_component"](sf_dir)
    order = np.argsort(t.column("dim").to_pylist())
    return np.array(t.column("comp_q").to_pylist(), dtype=np.float64)[order]


def test_recovers_planted_direction(ray_session, tmp_path):
    # x = spike outer product + small deterministic noise: top
    # eigenvector is the spike, with a wide spectral gap
    d, n = 64, 200
    k = np.arange(d)
    spike = np.cos(k / 7.0) / np.linalg.norm(np.cos(k / 7.0))
    i = np.arange(n)[:, None]
    noise = 0.02 * np.sin(i * 0.37 + k[None, :] * 1.13)
    x = (np.sin(i * 0.11) * 0.4) @ np.ones((1, d)) * spike[None, :] + noise
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [row.astype(np.float32) for row in x],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(np.zeros(n, dtype=np.int32)),
        }
    )
    pq.write_table(t, tmp_path / "embeddings.parquet")
    comp = _run_query(str(tmp_path))
    cos = abs(comp @ spike) / (np.linalg.norm(comp) * np.linalg.norm(spike))
    assert cos > 0.999, cos


def test_tracks_float_power_iteration_on_corpus(ray_session):
    from webscraper_ray.queries import _PCA_ITERS

    comp = _run_query(SF)
    emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    x = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
    g = x.T @ x
    v = np.ones(g.shape[0])
    for _ in range(_PCA_ITERS):
        v = g @ v
        v = v / np.abs(v).max()
    cos = abs(comp @ v) / (np.linalg.norm(comp) * np.linalg.norm(v))
    # same schedule, float vs exact-int with rescale quantization —
    # directions must agree tightly even though neither has converged
    # to the true eigenvector yet (random-data spectral gap is tiny)
    assert cos > 0.999, cos


def test_negative_components_survive_truncation(ray_session):
    # the quantized component vector must contain negatives (the
    # truncation-vs-floor divergence is only exercised when it does)
    comp = _run_query(SF)
    assert (comp < 0).any(), "no negative components — weak fixture"
