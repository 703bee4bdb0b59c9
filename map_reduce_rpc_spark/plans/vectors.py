"""Similarity-search queries over the ``embeddings`` table
(vec_id bigint, embedding array<float> dim=64, label int).

Cosine math runs on array<double> with sequential-order dot products in
both engines (zip_with+aggregate in Spark, manual list ops in DuckDB),
so results are bit-identical doubles and hash-match without tolerance.

ivf_topk is registered rows-only (its recall is probabilistic by
design); tests/test_similarity.py checks its recall against the exact
brute-force baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import similarity
from ..tables import load_table

QUERY_IDS = list(range(8))
TOP_K = 10
NEAR_DUP_THRESHOLD = 0.9

# sequential-order dot product of two DOUBLE[] lists in DuckDB SQL —
# list_dot_product would also work, but an explicit fold keeps the
# float operation order pinned to Spark's aggregate(zip_with(...)).
_DOT = (
    "list_aggregate(list_transform(range(1, len({a}) + 1), "
    "i -> {a}[i] * {b}[i]), 'sum')"
)


def _cos(a: str, b: str) -> str:
    dot = _DOT.format(a=a, b=b)
    na = _DOT.format(a=a, b=a)
    nb = _DOT.format(a=b, b=b)
    return f"({dot} / (sqrt({na}) * sqrt({nb})))"


def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 for query vectors vec_id 0..7."""
    return similarity.brute_force_topk(
        load_table(spark, sf_dir, "embeddings"), QUERY_IDS, k=TOP_K
    )


def embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine >= 0.9 pairs within each label block."""
    return similarity.blocked_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=NEAR_DUP_THRESHOLD
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-10 (probe 5 of the 10 label blocks). Rows-only
    check; recall vs brute force asserted in tests/test_similarity.py.
    (The synthetic labels are weak clusters, so recall here tracks the
    scanned fraction; with real k-means cells the same plan gives
    recall >> scanned fraction.)"""
    return similarity.ivf_topk(
        load_table(spark, sf_dir, "embeddings"), QUERY_IDS, k=TOP_K, nprobe=5
    )


KMEANS_K = 8
KMEANS_ITERS = 4


def ann_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-10 over TRAINED cells: distributed Lloyd's k-means
    (operators/similarity.kmeans_fit) learns the inverted file, then
    the same probe plan as ann_ivf_topk runs against it. The fitted
    centroid matrix flows straight into the serving plan: cell
    assignment is a narrow literal-argmin map (assign_cells — no join
    with an assignment table) and ivf_topk(centroids=...) skips the
    per-block mean re-aggregation the fit already did. Rows-only
    check (float centroid sums are engine/partition-order specific);
    tests/test_similarity.py asserts determinism, inertia descent, and
    recall at least matching the label-block IVF."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents, _cells = similarity.kmeans_fit(emb, k=KMEANS_K, iters=KMEANS_ITERS)
    return similarity.ivf_topk(
        similarity.assign_cells(emb, cents),
        QUERY_IDS,
        k=TOP_K,
        nprobe=3,
        block_col="cell",
        centroids=cents,
    )


def srp_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH cosine near-dup pairs (>= 0.9), exact-verified.
    Rows-only check (signature hashing is engine-specific); recall is
    proven on planted near-duplicates in tests/test_similarity.py.
    The natural table has no pairs above threshold (max pairwise cos
    ~0.6), so agreement with embedding_near_dups is also asserted."""
    return similarity.srp_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=NEAR_DUP_THRESHOLD
    )


_QID_LIST = ", ".join(str(i) for i in QUERY_IDS)

VECTORS_ORACLES: dict[str, str] = {
    "similarity_topk": f"""
        WITH base AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        q AS (
            SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id IN ({_QID_LIST})
        ),
        scored AS (
            SELECT q.query_id, base.vec_id AS neighbor_id,
                   {_cos("q.qv", "base.v")} AS cos
            FROM base, q
            WHERE base.vec_id <> q.query_id
        )
        SELECT query_id, neighbor_id, cos, rnk FROM (
            SELECT query_id, neighbor_id, cos,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id) AS rnk
            FROM scored
        ) WHERE rnk <= {TOP_K}
    """,
    "embedding_near_dups": f"""
        WITH base AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {_cos("a.v", "b.v")} AS cos
        FROM base a JOIN base b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE {_cos("a.v", "b.v")} >= {NEAR_DUP_THRESHOLD}
    """,
}
