"""Entry B — cross-trial-type pipeline over the domain fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oxford_data_pipeline_spark.pipeline import PipelineConfig, run_session_pipeline
from oxford_data_pipeline_spark.pipeline.cross_condition import run_cross_condition
from oxford_data_pipeline_spark.pipeline.fixtures import LABELS, generate_fixtures


@pytest.fixture(scope="module")
def entry_b(spark, domain_fixtures, entry_a):
    fx = domain_fixtures
    cfg, a = entry_a
    b = run_cross_condition(
        fx["firing_rates"], fx["trial_events"], a["sampled_neurons"],
        a["cca_weights"], cfg, LABELS,
    )
    b["projections"].cache()
    b["timecourses"].cache()
    return cfg, a, b


def test_all_conditions_projected(entry_b):
    cfg, a, b = entry_b
    types = {r.trial_type for r in b["timecourses"].select("trial_type").distinct().collect()}
    assert types == set(LABELS)


def test_reference_condition_matches_entry_a_projection(entry_b):
    """J7 consistency: the reference condition's projection through its
    own weights must equal Entry A's projection output."""
    cfg, a, b = entry_b
    ref = (
        b["projections"]
        .filter(F.col("trial_type") == cfg.trial_type)
        .drop("trial_type")
    )
    a_rows = sorted(
        (r.session, r.pair_r1, r.pair_r2, r.side, r.component, r.trial_id, r.t,
         round(r.value, 6))
        for r in a["projections"].collect()
    )
    b_rows = sorted(
        (r.session, r.pair_r1, r.pair_r2, r.side, r.component, r.trial_id, r.t,
         round(r.value, 6))
        for r in ref.collect()
    )
    assert a_rows == b_rows


def test_peak_amplitudes_nonnegative(entry_b):
    _, _, b = entry_b
    rows = b["peak_amplitudes"].collect()
    assert rows and all(r.peak_amp >= 0 for r in rows)


def test_flip_decisions_binary_and_reused(entry_b):
    cfg, _, b = entry_b
    dec = b["flip_decisions"].collect()
    assert dec and all(r.sign in (-1.0, 1.0) for r in dec)
    # decision table is per (session, pair, side, comp) — condition-free,
    # so reuse across conditions is structural
    assert "trial_type" not in b["flip_decisions"].columns


def test_aligned_stats_cover_all_conditions_with_same_flips(entry_b):
    cfg, _, b = entry_b
    stats = b["aligned_stats"]
    types = {r.trial_type for r in stats.select("trial_type").distinct().collect()}
    assert types == set(LABELS)
    assert stats.filter(F.col("n_sessions") < 1).count() == 0


def test_condition_similarity_bounds(entry_b):
    cfg, _, b = entry_b
    rows = b["condition_similarity"].collect()
    assert rows
    assert all(r.r is None or -1.0 - 1e-9 <= r.r <= 1.0 + 1e-9 for r in rows)
    assert {r.trial_type for r in rows} == set(LABELS) - {cfg.trial_type}
