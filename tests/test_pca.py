"""Semantic pin for the power-iteration PCA: on a corpus whose
variance is concentrated on one axis, the projection must recover
(sign-modulo) that coordinate. Dual-engine hash-exactness is covered
by the auto-parametrized oracle rig."""

from __future__ import annotations

import pytest

from map_reduce_rpc_spark.plans import vectors


@pytest.fixture(scope="module")
def axis_sf_dir(spark, tmp_path_factory) -> str:
    dim = vectors.EMB_DIM
    rows = []
    # 40 vectors along axis 0 with varying magnitude (the dominant
    # direction), 8 small vectors along axis 1 (noise)
    for i in range(40):
        e = [0.0] * dim
        e[0] = 0.5 + (i % 7) * 0.05
        rows.append((i, e, i % 3))
    for i in range(40, 48):
        e = [0.0] * dim
        e[1] = 0.05
        rows.append((i, e, 0))
    df = spark.createDataFrame(
        rows, f"vec_id long, embedding array<float>, label int"
    )
    out = tmp_path_factory.mktemp("axis_emb")
    df.write.mode("overwrite").parquet(str(out / "embeddings.parquet"))
    return str(out)


def test_pca_recovers_dominant_axis(spark, axis_sf_dir):
    got = {
        r["vec_id"]: r["pc1"]
        for r in vectors.pca_power_pc1(spark, axis_sf_dir).collect()
    }
    # the leading direction is axis 0 (modulo sign): for the on-axis
    # vectors, |pc1| must equal the axis-0 coordinate (up to the 2^10
    # Gram quantization of the ITERATION input — the projection itself
    # uses exact coordinates, so agreement is tight)
    for i in range(40):
        want = 0.5 + (i % 7) * 0.05
        assert abs(abs(got[i]) - want) < 1e-3, (i, got[i], want)
    # orthogonal noise vectors project to ~0
    for i in range(40, 48):
        assert abs(got[i]) < 1e-3, (i, got[i])
    # one consistent sign across the corpus half that shares a direction
    signs = {got[i] > 0 for i in range(40)}
    assert len(signs) == 1
