"""Multimodal stage plumbing (stub codecs, real schemas/actors) + ANN."""

import numpy as np
import pytest
import ray.data

from graphblas_algorithms_ray.pipelines.multimodal import (
    DecodeImage,
    FrameSample,
    image_pipeline,
    synthetic_media_dataset,
)
from graphblas_algorithms_ray.pipelines.ann import ann_topk, lsh_buckets


def test_image_pipeline_end_to_end():
    media = synthetic_media_dataset(40)
    feats = image_pipeline(media).take_all()
    assert len(feats) == 40
    emb = np.array(feats[0]["embedding"])
    assert emb.shape == (16,)
    assert abs(emb.sum() - 1.0) < 1e-9  # histogram normalized
    # deterministic: same media_id → same embedding across runs
    feats2 = image_pipeline(synthetic_media_dataset(40)).take_all()
    a = {f["media_id"]: tuple(f["embedding"]) for f in feats}
    b = {f["media_id"]: tuple(f["embedding"]) for f in feats2}
    assert a == b


def test_decode_strict_raises():
    media = synthetic_media_dataset(4)
    with pytest.raises(Exception):  # NotImplementedError surfaces via Ray
        media.map_batches(
            DecodeImage,
            fn_constructor_kwargs={"strict": True},
            batch_format="pyarrow",
            concurrency=1,
        ).take_all()


def test_frame_sample():
    media = synthetic_media_dataset(5)
    frames = media.map_batches(
        FrameSample, batch_format="pyarrow", concurrency=1
    ).take_all()
    assert len(frames) == 20  # 5 media × 4 frames
    assert {f["frame"] for f in frames} == {0, 1, 2, 3}


def test_ann_topk_exact():
    rng = np.random.RandomState(0)
    vecs = rng.normal(size=(100, 16))
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(100)]
    )
    out = ann_topk(ds, query_ids=[3], k=5, round_to=None).take_all()
    got = [(r["nid"]) for r in sorted(out, key=lambda r: -r["score"])]
    # brute-force oracle
    q = vecs[3] / np.linalg.norm(vecs[3])
    sims = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)) @ q
    sims[3] = -np.inf
    exp = list(np.argsort(-sims)[:5])
    assert got == exp


def test_lsh_buckets_deterministic():
    rng = np.random.RandomState(1)
    vecs = rng.normal(size=(50, 64))
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(50)]
    )
    b1 = {r["vec_id"]: r["bucket"] for r in lsh_buckets(ds, bits=8).take_all()}
    b2 = {r["vec_id"]: r["bucket"] for r in lsh_buckets(ds, bits=8).take_all()}
    assert b1 == b2
    assert 0 <= min(b1.values()) and max(b1.values()) < 256
    # near-identical vectors share a bucket
    ds2 = ray.data.from_items(
        [
            {"vec_id": 0, "embedding": vecs[0].tolist()},
            {"vec_id": 1, "embedding": (vecs[0] + 1e-8).tolist()},
        ]
    )
    bb = {r["vec_id"]: r["bucket"] for r in lsh_buckets(ds2, bits=8).take_all()}
    assert bb[0] == bb[1]


def test_ann_topk_lsh_bucketed():
    # planted near-duplicates: each query's top-1 must be its planted twin,
    # and every returned score must equal the true cosine similarity
    import ray.data
    from graphblas_algorithms_ray.pipelines.ann import ann_topk, ann_topk_lsh

    rng = np.random.RandomState(11)
    base = rng.normal(size=(200, 32))
    rows = []
    for i in range(200):
        rows.append({"vec_id": i, "embedding": base[i].tolist()})
    for j, q in enumerate((0, 7, 42)):
        rows.append(
            {"vec_id": 200 + j, "embedding": (base[q] + rng.normal(scale=0.01, size=32)).tolist()}
        )
    ds = ray.data.from_items(rows)
    res = ann_topk_lsh(ds, [200, 201, 202], k=3, bits=6, hamming_probes=2)
    top = {}
    for r in res.take_all():
        top.setdefault(r["qid"], []).append((r["score"], r["nid"]))
    for j, q in enumerate((0, 7, 42)):
        assert max(top[200 + j])[1] == q, (j, top[200 + j])
    # scores agree with the exact path for the pairs both return
    exact = {
        (r["qid"], r["nid"]): r["score"] for r in ann_topk(ds, [200, 201, 202], k=3).take_all()
    }
    for qid, lst in top.items():
        for s, nid in lst:
            if (qid, nid) in exact:
                assert abs(s - exact[(qid, nid)]) < 1e-9


def test_embedding_neardup_exact():
    from graphblas_algorithms_ray.pipelines.ann import embedding_neardup

    rng = np.random.RandomState(42)
    vecs = rng.normal(size=(120, 16))
    # plant two near-dup pairs
    vecs[50] = vecs[10] + rng.normal(scale=0.01, size=16)
    vecs[75] = vecs[20] * 1.5
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(120)]
    )
    out = embedding_neardup(ds, threshold=0.9, round_to=6).take_all()
    got = {(r["id_a"], r["id_b"]) for r in out}
    # brute-force oracle
    n = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = np.round(n @ n.T, 6)
    want = {
        (i, j)
        for i in range(120)
        for j in range(i + 1, 120)
        if sims[i, j] >= 0.9
    }
    assert got == want
    assert (10, 50) in got and (20, 75) in got
    for r in out:
        assert abs(r["sim"] - sims[r["id_a"], r["id_b"]]) < 1e-9


def test_embedding_neardup_lsh_recall():
    from graphblas_algorithms_ray.pipelines.ann import (
        embedding_neardup,
        embedding_neardup_lsh,
    )

    rng = np.random.RandomState(7)
    base = rng.normal(size=(30, 16))
    rows = []
    vid = 0
    vecs = {}
    for b in range(30):
        for k in range(3):  # 3 noisy copies per base vector → near-dup cliques
            v = base[b] + rng.normal(scale=0.05, size=16)
            vecs[vid] = v
            rows.append({"vec_id": vid, "embedding": v.tolist()})
            vid += 1
    ds = ray.data.from_items(rows)
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup(ds, threshold=0.95, round_to=6).take_all()
    }
    approx_rows = embedding_neardup_lsh(
        ds, threshold=0.95, bands=8, bits=6, dim=16, round_to=6
    ).take_all()
    approx = {(r["id_a"], r["id_b"]) for r in approx_rows}
    assert len(approx_rows) == len(approx)  # cross-band dedupe worked
    assert approx <= exact  # exact in-bucket verification: precision 1.0
    assert exact, "fixture must produce near-dup pairs"
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, recall


def test_bucket_pairs_degenerate_bucket_capped():
    # ADVICE r3: one hot LSH bucket of near-identical vectors must not go
    # O(n^2) memory — representatives cap + row-blocked similarity matrix
    import numpy as np
    import pyarrow as pa

    from graphblas_algorithms_ray.pipelines.ann import _BucketPairs

    rng = np.random.default_rng(3)
    n, cap = 2000, 256
    base = rng.normal(size=16)
    m = base + rng.normal(scale=1e-4, size=(n, 16))  # all near-identical
    g = pa.table(
        {
            "bucket": pa.array(np.zeros(n, np.int64)),
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(m)),
        }
    )
    bp = _BucketPairs(0.9, 6, cap=cap, block=100)
    before = _BucketPairs.truncated_buckets
    out = bp(g)
    assert _BucketPairs.truncated_buckets == before + 1
    ids_a = out["id_a"].to_numpy()
    ids_b = out["id_b"].to_numpy()
    # only the cap lowest ids survive as representatives
    assert out.num_rows == cap * (cap - 1) // 2
    assert ids_a.max() < cap and ids_b.max() < cap
    assert (ids_a < ids_b).all()
    assert (out["sim"].to_numpy() >= 0.9).all()
    # small bucket: unchanged exact semantics, blocked == unblocked
    small = g.slice(0, 50)
    full = _BucketPairs(0.9, 6)(small)
    blocked = _BucketPairs(0.9, 6, block=7)(small)
    assert full.equals(blocked)


def test_kmeans_fit_block_order_invariant():
    # fixed-point int64 partials: the fitted centroids must be BIT-identical
    # across different block structures (and runs) — the property the
    # single-process oracle relies on
    from graphblas_algorithms_ray.pipelines.ann import kmeans_fit

    rng = np.random.RandomState(5)
    vecs = rng.normal(size=(300, 12))
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(300)]
    a = kmeans_fit(ray.data.from_items(rows).repartition(2), 8, iters=4)
    b = kmeans_fit(ray.data.from_items(rows).repartition(13), 8, iters=4)
    assert a.shape == (8, 12)
    assert np.array_equal(a, b)  # exact, not allclose


def test_kmeans_fit_matches_naive_replica():
    from graphblas_algorithms_ray.pipelines.ann import (
        _init_centroids,
        _normalize_rows,
        kmeans_fit,
    )

    rng = np.random.RandomState(9)
    vecs = rng.normal(size=(200, 8))
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(200)]
    )
    got = kmeans_fit(ds, 5, iters=3, seed=7)
    # naive single-process Lloyd with the same spec constants
    scale = float(np.int64(1) << 24)
    cents = _init_centroids(5, 8, 7)
    q = np.round(vecs * scale).astype(np.int64)
    mn = _normalize_rows(vecs)
    for _ in range(3):
        cn = _normalize_rows(cents)
        assign = np.array([int(np.argmax(cn @ mn[j])) for j in range(200)])
        new = cents.copy()
        for c in range(5):
            idx = np.nonzero(assign == c)[0]
            if idx.size:
                new[c] = q[idx].sum(axis=0) / (scale * idx.size)
        cents = new
    assert np.array_equal(got, cents)


def test_kmeans_fit_empty_clusters_keep_init():
    # more clusters than points: untouched clusters keep their (normalized
    # mean update never applied) previous centroid instead of NaN
    from graphblas_algorithms_ray.pipelines.ann import kmeans_fit

    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": [float(i + 1), 0.0]} for i in range(3)]
    )
    cents = kmeans_fit(ds, 8, iters=2, dim=2)
    assert cents.shape == (8, 2)
    assert np.isfinite(cents).all()


def test_ann_topk_ivf_full_probe_equals_exact():
    # nprobe == n_clusters degenerates to exact brute force
    from graphblas_algorithms_ray.pipelines.ann import ann_topk, ann_topk_ivf

    rng = np.random.RandomState(13)
    vecs = rng.normal(size=(150, 16))
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(150)]
    )
    exact = {
        (r["qid"], r["nid"]): r["score"]
        for r in ann_topk(ds, [1, 5], k=4).take_all()
    }
    ivf = {
        (r["qid"], r["nid"]): r["score"]
        for r in ann_topk_ivf(ds, [1, 5], k=4, n_clusters=6, nprobe=6).take_all()
    }
    assert ivf == exact


def test_ann_topk_ivf_planted_neighbors():
    # planted twins must be found scanning only nprobe of n_clusters lists
    from graphblas_algorithms_ray.pipelines.ann import ann_topk_ivf

    rng = np.random.RandomState(21)
    base = rng.normal(size=(200, 32))
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(200)]
    for j, q in enumerate((3, 17, 99)):
        rows.append(
            {
                "vec_id": 200 + j,
                "embedding": (base[q] + rng.normal(scale=0.01, size=32)).tolist(),
            }
        )
    ds = ray.data.from_items(rows)
    res = ann_topk_ivf(ds, [200, 201, 202], k=3, n_clusters=8, nprobe=2).take_all()
    top = {}
    for r in res:
        top.setdefault(r["qid"], []).append((r["score"], r["nid"]))
    for j, q in enumerate((3, 17, 99)):
        assert max(top[200 + j])[1] == q, (j, top[200 + j])


def test_ann_topk_ivf_oracle_parity_sf0001():
    # the engine on the real testdata parquet must reproduce the naive
    # single-process oracle (oracle_truth.write_ann_topk_ivf_expected)
    import pyarrow.parquet as pq

    from graphblas_algorithms_ray.oracle_truth import write_ann_topk_ivf_expected
    from graphblas_algorithms_ray.pipelines.ann import ann_topk_ivf

    sf_dir = "/root/testdata/sf0.001"
    path = write_ann_topk_ivf_expected(sf_dir, [0, 1, 2], k=5, n_clusters=16, nprobe=4)
    want = pq.read_table(path).to_pylist()
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    got = ann_topk_ivf(emb, [0, 1, 2], k=5, n_clusters=16, nprobe=4).take_all()
    key = lambda r: (r["qid"], -r["score"], r["nid"])
    assert sorted(got, key=key) == sorted(want, key=key)


def test_embedding_neardup_autoroutes_to_lsh():
    import numpy as np
    import ray.data

    from graphblas_algorithms_ray.pipelines.ann import embedding_neardup

    rng = np.random.default_rng(11)
    m = rng.normal(size=(400, 64))
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": list(m[i])} for i in range(400)]
    )
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup(ds, threshold=0.8).take_all()
    }
    routed_rows = embedding_neardup(ds, threshold=0.8, max_exact_rows=100).take_all()
    routed = {(r["id_a"], r["id_b"]) for r in routed_rows}
    # LSH precision is exact: every routed pair is a true pair
    assert routed <= exact


def test_batch_topk_ties_resolve_by_nid():
    # duplicate vectors tie exactly at the per-batch k boundary: the kept
    # candidate must be the lowest nid, partition-invariantly (review r5)
    from graphblas_algorithms_ray.pipelines.ann import ann_topk

    v = [1.0, 0.0, 0.0]
    w = [0.0, 1.0, 0.0]
    rows = [{"vec_id": 0, "embedding": v}]
    # 6 identical candidates (score 1.0) + distractors; k=2 must pick 1,2
    for i in (5, 4, 3, 2, 1, 6):
        rows.append({"vec_id": i, "embedding": v})
    rows.append({"vec_id": 7, "embedding": w})
    for parts in (1, 4):
        ds = ray.data.from_items(rows).repartition(parts)
        out = ann_topk(ds, [0], k=2).take_all()
        assert sorted(r["nid"] for r in out) == [1, 2], (parts, out)


def test_ivf_index_roundtrip_matches_in_situ(tmp_path):
    # the on-disk partitioned index must return the SAME results as the
    # in-situ ann_topk_ivf (same centroids seed → same lists → same
    # candidate set), while reading only the probed partitions
    import os

    from graphblas_algorithms_ray.pipelines.ann import (
        _take_queries,
        ann_topk_ivf,
        ann_topk_ivf_indexed,
        ivf_index_write,
    )

    rng = np.random.RandomState(31)
    vecs = rng.normal(size=(300, 16))
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(300)]
    )
    index_dir = str(tmp_path / "ivf_idx")
    ivf_index_write(ds, index_dir, n_clusters=8, iters=4)
    lists = [d for d in os.listdir(index_dir) if d.startswith("list=")]
    assert 1 < len(lists) <= 8
    assert os.path.exists(os.path.join(index_dir, "centroids.parquet"))

    qids, qm = _take_queries(ds, [2, 9])
    got = ann_topk_ivf_indexed(index_dir, qids, qm, k=4, nprobe=3).take_all()
    want = ann_topk_ivf(ds, [2, 9], k=4, n_clusters=8, nprobe=3, iters=4).take_all()
    key = lambda r: (r["qid"], -r["score"], r["nid"])
    assert sorted(got, key=key) == sorted(want, key=key)
    # probing every list degenerates to the exact result set
    from graphblas_algorithms_ray.pipelines.ann import ann_topk

    full = ann_topk_ivf_indexed(index_dir, qids, qm, k=4, nprobe=8).take_all()
    exact = ann_topk(ds, [2, 9], k=4).take_all()
    assert sorted(full, key=key) == sorted(exact, key=key)
