"""GLM stage (M6/F9/M7 on domain data) + Entry C report aggregates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oxford_data_pipeline_spark.pipeline import PipelineConfig, run_session_pipeline
from oxford_data_pipeline_spark.pipeline.fixtures import generate_fixtures
from oxford_data_pipeline_spark.pipeline.glm_stage import (
    glm_fit,
    glm_summary,
    sensitivity_grid,
    significant_neurons,
)
from oxford_data_pipeline_spark.pipeline.reports import (
    connectivity_matrix,
    max_r2_summary,
    min_sessions_filter,
    ranked_components,
    truncate_to_min_length,
)


@pytest.fixture(scope="module")
def pipe(entry_a):
    cfg, res = entry_a
    return cfg, res


def test_glm_fit_inference(pipe):
    cfg, res = pipe
    glm = glm_fit(res["projections"], res["segmented"], res["sampled_neurons"]).cache()
    rows = glm.collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.p_value <= 1.0
        assert 0.0 <= r.r2 <= 1.0 + 1e-9
        assert r.adj_r2 <= r.r2 + 1e-9
    # the latent of side i comes from region pair_r1's own activity →
    # that region's fit must be strong for at least some fits
    own = [r for r in rows if r.region == r.pair_r1]
    assert own and max(r.r2 for r in own) > 0.5
    sig = significant_neurons(glm).collect()
    assert sig and all(r.p_value < 0.05 for r in sig)
    summary = glm_summary(glm).collect()
    total_rows = [r for r in summary if r.pair_r1 is None]
    assert len(total_rows) == 1 and total_rows[0].n_fits > 0


def test_sensitivity_grid_top_beats_random(pipe):
    cfg, res = pipe
    grid = sensitivity_grid(
        res["projections"], res["segmented"], res["sampled_neurons"],
        pcts=[0, 50], mc_iters=2,
    ).collect()
    assert grid
    # at pct=0 both strategies equal the full fit
    base = {}
    for r in grid:
        if r.pct_removed == 0:
            base.setdefault((r.session, r.pair_r1, r.pair_r2, r.region), set()).add(
                round(r.r2, 9)
            )
    assert all(len(v) == 1 for v in base.values())
    # removing top-|beta| 50% hurts at least as much as random on average
    import statistics

    top = [r.r2 for r in grid if r.strategy == "top" and r.pct_removed == 50]
    rand = [r.r2 for r in grid if r.strategy == "random" and r.pct_removed == 50]
    assert statistics.mean(top) <= statistics.mean(rand) + 1e-6


def test_ranked_components_and_connectivity(pipe):
    cfg, res = pipe
    ranked = ranked_components(res["cca_r2"])
    per = ranked.groupBy("session", "pair_r1", "pair_r2").agg(
        F.min("rnk").alias("lo"), F.max("rnk").alias("hi")
    ).collect()
    assert all(r.lo == 1 and r.hi == cfg.n_components for r in per)
    conn = connectivity_matrix(res["cca_r2"]).collect()
    assert conn
    for r in conn:
        assert 0.0 <= r.mean_r2 <= 1.0
        assert r.row_idx > 0 and r.col_idx > 0  # anatomical order resolved
    mx = max_r2_summary(res["cca_r2"]).collect()
    assert mx and all(0.0 <= r.mean_max_r2 <= 1.0 for r in mx)


def test_min_sessions_and_truncation(pipe):
    cfg, res = pipe
    filtered = min_sessions_filter(res["cca_r2"], min_sessions=3)
    counts = filtered.groupBy("pair_r1", "pair_r2").agg(
        F.countDistinct("session").alias("n")
    ).collect()
    assert all(r.n >= 3 for r in counts)
    tc = res["projection_avg"].select(
        "session", "t", "mean_value"
    )
    cut = truncate_to_min_length(tc)
    assert cut.agg(F.max("t")).collect()[0][0] <= tc.agg(F.max("t")).collect()[0][0]
