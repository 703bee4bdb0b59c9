"""Semantic pins for the LM-scoring and boilerplate-ratio quality
signals on a crafted corpus (the synthetic table can't plant a known
in-distribution/out-of-distribution contrast). The dual-engine
hash-exactness of both queries is covered by the auto-parametrized
oracle rig in test_relational.py; these tests pin the SEMANTICS: the
signals must rank documents the way a cleaning pipeline relies on."""

from __future__ import annotations

import pytest

from map_reduce_rpc_spark.plans import textops


@pytest.fixture(scope="module")
def lm_sf_dir(spark, tmp_path_factory) -> str:
    """10 copies of a templated doc + 1 out-of-distribution doc +
    1 short doc (< n tokens). The repeated template dominates the
    corpus LM and the shingle document frequencies."""
    template = (
        "home about contact subscribe to our newsletter all rights "
        "reserved terms of service privacy policy follow us on social"
    )
    odd = "zygote quark nebula fjord sphinx waltz glyph vortex banjo pixel"
    rows = [(i, template, "en", "tpl", len(template)) for i in range(10)]
    rows.append((10, odd, "en", "odd", len(odd)))
    rows.append((11, "too short", "en", "odd", 9))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = tmp_path_factory.mktemp("lm_corpus")
    df.write.mode("overwrite").parquet(str(out / "documents.parquet"))
    return str(out)


def test_lm_scores_rank_in_distribution_above_ood(spark, lm_sf_dir):
    scores = {
        r["doc_id"]: r
        for r in textops.trigram_lm_scores(spark, lm_sf_dir).collect()
    }
    # docs with < 3 tokens contribute no trigrams and are absent
    assert 11 not in scores
    # score is a mean probability: strictly inside (0, 1]
    for r in scores.values():
        assert 0.0 < r["lm_score"] <= 1.0
    # every template trigram occurs 10x in training; the OOD doc's
    # trigrams are singletons -> the template must score far higher
    tpl, odd = scores[0]["lm_score"], scores[10]["lm_score"]
    assert tpl > odd * 3, (tpl, odd)
    # n_trigrams = token count - 2 for the template (19 tokens)
    assert scores[0]["n_trigrams"] == 17


def test_boilerplate_ratio_flags_template_not_ood(spark, lm_sf_dir):
    rows = {
        r["doc_id"]: r
        for r in textops.boilerplate_ratio(spark, lm_sf_dir).collect()
    }
    assert 11 not in rows  # < BOILER_N tokens: no shingles
    # the template's shingles recur in 10 docs (>= BOILER_MIN_DF):
    # every one is corpus-common -> ratio exactly 1.0
    assert rows[0]["boiler_ratio"] == 1.0
    assert rows[0]["n_common"] == rows[0]["n_shingles"]
    # the OOD doc shares no shingle with anything -> ratio exactly 0.0
    assert rows[10]["boiler_ratio"] == 0.0
    assert rows[10]["n_common"] == 0


def test_lm_mix_keep_rate_rises_with_decile(spark, sf_dir):
    """The mixture gate must actually bias by quality: the keep rate
    over the top half of deciles exceeds the bottom half (each decile
    holds ~n/10 docs pre-gate, so kept counts compare directly), and
    every kept row respects its decile's md5 gate."""
    from map_reduce_rpc_spark.plans.textops import (
        LM_MIX_DECILES,
        lm_quality_mix_sample,
        trigram_lm_scores,
    )

    kept = lm_quality_mix_sample(spark, sf_dir).collect()
    total = trigram_lm_scores(spark, sf_dir).count()
    assert kept and total
    per_decile = {}
    for r in kept:
        per_decile[r["decile"]] = per_decile.get(r["decile"], 0) + 1
    low = sum(per_decile.get(d, 0) for d in range(LM_MIX_DECILES // 2))
    high = sum(
        per_decile.get(d, 0)
        for d in range(LM_MIX_DECILES // 2, LM_MIX_DECILES)
    )
    assert high > low, (per_decile, total)
    assert all(0 <= d < LM_MIX_DECILES for d in per_decile)
