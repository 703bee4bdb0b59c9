"""Similarity search: brute-force exactness, IVF recall, near-dup pairs."""

from __future__ import annotations

import math

import numpy as np
import pytest

from map_reduce_rpc_spark.operators import similarity
from map_reduce_rpc_spark.tables import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def test_brute_force_matches_numpy(spark, emb):
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    got = similarity.brute_force_topk(emb, [0, 1], k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid in (0, 1):
        q = vecs[qid]
        expect = sorted(
            ((np.dot(q, v) / (np.linalg.norm(q) * np.linalg.norm(v)), i)
             for i, v in vecs.items() if i != qid),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        ours = sorted(by_q[qid], key=lambda r: r["rnk"])
        assert [r["neighbor_id"] for r in ours] == [i for _, i in expect]
        for r, (c, _) in zip(ours, expect):
            assert math.isclose(r["cos"], c, rel_tol=1e-9)


def test_ivf_recall_vs_brute_force(spark, emb):
    qids = list(range(8))
    brute = similarity.brute_force_topk(emb, qids, k=10).collect()
    ivf = similarity.ivf_topk(emb, qids, k=10, nprobe=5).collect()
    b = {(r["query_id"], r["neighbor_id"]) for r in brute}
    a = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    recall = len(a & b) / len(b)
    # the synthetic labels are weak clusters: IVF must at least beat
    # the scanned-fraction floor (nprobe/nlist = 0.5)
    assert recall >= 0.5, f"IVF recall below scanned-fraction floor: {recall}"


def test_blocked_near_dups_symmetric_and_thresholded(spark, emb):
    pairs = similarity.blocked_near_dup_pairs(emb, threshold=0.5).collect()
    assert all(r["id_a"] < r["id_b"] for r in pairs)
    assert all(r["cos"] >= 0.5 for r in pairs)
