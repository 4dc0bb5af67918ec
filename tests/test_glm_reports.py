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


# ---------------------------------------------------------------------------
# Figure-report layer (Entry C figure parity as tidy CSV artifacts)
# ---------------------------------------------------------------------------
_GOLDEN_DIR = __import__("os").path.join(
    __import__("os").path.dirname(__file__), "golden"
)


def _synthetic_figure_inputs(spark):
    """Deterministic plain-decimal inputs (no ML UDF) for byte-exact
    golden comparison of the report layer itself: three pairs over
    three sessions, one pair in only two sessions (min-sessions
    exercise), sessions of unequal length (O4 truncation exercise)."""
    r2_rows = []
    pairs = [("mPFC", "STR"), ("mPFC", "MD"), ("STR", "MD")]
    for si, session in enumerate(["s1", "s2", "s3"]):
        for pi, (r1, r2name) in enumerate(pairs):
            for comp in (1, 2, 3):
                for fold in (1, 2):
                    val = round(0.8 - 0.1 * comp - 0.02 * fold + 0.01 * si + 0.005 * pi, 6)
                    r2_rows.append((session, r1, r2name, comp, fold, val))
    # ORB-STR appears in only two sessions -> dropped at min_sessions=3
    for session in ["s1", "s2"]:
        for comp in (1, 2, 3):
            for fold in (1, 2):
                r2_rows.append((session, "ORB", "STR", comp, fold, 0.5))
    cca_r2 = spark.createDataFrame(
        r2_rows,
        "session string, pair_r1 string, pair_r2 string, component int,"
        " fold int, r2 double",
    )
    proj_rows = []
    t_max = {"s1": 5, "s2": 4, "s3": 5}  # s2 shortest -> cut at t=4
    for si, session in enumerate(["s1", "s2", "s3"]):
        for side in ("u", "v"):
            for comp in (1, 2):
                for t in range(t_max[session] + 1):
                    val = round(0.1 * t + 0.05 * comp + 0.01 * si
                                - (0.2 if side == "v" else 0.0), 6)
                    proj_rows.append((session, "mPFC", "STR", side, comp, t, val))
    proj_avg = spark.createDataFrame(
        proj_rows,
        "session string, pair_r1 string, pair_r2 string, side string,"
        " component int, t int, mean_value double",
    )
    return cca_r2, proj_avg


def test_figure_reports_golden(spark, tmp_path):
    """The three Entry-C figure tables, written via the S6 CSV sink,
    must byte-match the checked-in goldens — report-layer parity for
    `CCA_test_all.py:402-541,596-813,815-970` without matplotlib."""
    from oxford_data_pipeline_spark.pipeline.figure_reports import (
        write_figure_reports,
    )

    cca_r2, proj_avg = _synthetic_figure_inputs(spark)
    paths = write_figure_reports(cca_r2, proj_avg, str(tmp_path))
    assert set(paths) == {
        "connectivity_matrix", "population_summary", "temporal_projection"
    }
    import os

    for name, path in paths.items():
        golden = os.path.join(_GOLDEN_DIR, f"{name}.csv")
        assert os.path.exists(golden), (
            f"golden file missing: regenerate via tests/golden/README"
        )
        with open(path) as got, open(golden) as want:
            assert got.read() == want.read(), f"{name}.csv drifted from golden"


def test_figure_reports_on_entry_a(pipe, tmp_path):
    """The figure tables must also run on the REAL Entry-A pipeline
    outputs (ML-UDF-produced): right shape, resolved anatomical
    indices, SEM consistency, truncation applied."""
    from pyspark.sql import functions as F2

    from oxford_data_pipeline_spark.pipeline.figure_reports import (
        connectivity_figure_table,
        population_summary_table,
        timecourse_figure_table,
    )

    cfg, res = pipe
    conn = connectivity_figure_table(res["cca_r2"], ranks=(1, 2)).collect()
    assert conn
    assert all(r.row_idx > 0 and r.col_idx > 0 for r in conn)
    assert {r["rank"] for r in conn} == {1, 2}
    pop = population_summary_table(res["cca_r2"]).collect()
    assert pop and all(0.0 <= r.mean_r2 <= 1.0 + 1e-9 for r in pop)
    tc = timecourse_figure_table(res["projection_avg"])
    rows = tc.collect()
    assert rows
    t_cut = res["projection_avg"].groupBy("session").agg(
        F2.max("t").alias("m")
    ).agg(F2.min("m")).collect()[0][0]
    assert max(r.t for r in rows) <= t_cut
    for r in rows:
        if r.n_sessions > 1 and r.std_value is not None:
            assert abs(r.sem_value * (r.n_sessions ** 0.5) - r.std_value) < 1e-4


def test_figure_svgs_render_and_deterministic(spark, tmp_path):
    """The dependency-free SVG renderers must emit well-formed XML with
    the expected mark counts, nothing outside the canvas, and
    byte-identical output across runs (no timestamps, fixed floats)."""
    import xml.etree.ElementTree as ET

    from oxford_data_pipeline_spark.pipeline.svg_figures import write_figure_svgs

    cca_r2, proj_avg = _synthetic_figure_inputs(spark)
    p1 = write_figure_svgs(cca_r2, proj_avg, str(tmp_path / "a"))
    p2 = write_figure_svgs(cca_r2, proj_avg, str(tmp_path / "b"))
    ns = {"s": "http://www.w3.org/2000/svg"}
    for name, path in p1.items():
        with open(path) as f1, open(p2[name]) as f2:
            assert f1.read() == f2.read(), f"{name}.svg not deterministic"
        root = ET.parse(path).getroot()
        W, H = float(root.get("width")), float(root.get("height"))
        for e in root.findall(".//s:rect", ns):
            x, y = float(e.get("x", 0)), float(e.get("y", 0))
            assert 0 <= x and 0 <= y
            assert x + float(e.get("width", 0)) <= W
            assert y + float(e.get("height", 0)) <= H
        for e in root.findall(".//s:polyline", ns) + root.findall(".//s:polygon", ns):
            for pt in e.get("points").split():
                x, y = map(float, pt.split(","))
                assert -1 <= x <= W + 1 and -1 <= y <= H + 1

    # timecourse: one line + one SEM band per series (4 series: 2 sides x 2 comps)
    tc = ET.parse(p1["temporal_projection"]).getroot()
    assert len(tc.findall(".//s:polyline", ns)) == 4
    assert len(tc.findall(".//s:polygon", ns)) == 4
    # connectivity: 3 pairs -> 3 data cells + 20 ramp swatches + surface
    cm = ET.parse(p1["connectivity_matrix"]).getroot()
    assert len(cm.findall(".//s:rect", ns)) == 3 + 20 + 1


def test_figure_svgs_on_entry_a(pipe, tmp_path):
    """Renderers must handle the REAL Entry-A outputs (ML-UDF floats,
    variable series counts) and stay well-formed."""
    import xml.etree.ElementTree as ET

    from oxford_data_pipeline_spark.pipeline.svg_figures import write_figure_svgs

    cfg, res = pipe
    paths = write_figure_svgs(res["cca_r2"], res["projection_avg"], str(tmp_path))
    assert set(paths) == {
        "connectivity_matrix", "connectivity_panels", "population_summary",
        "temporal_projection",
    }
    for p in paths.values():
        ET.parse(p)


def test_connectivity_panels_mirror_reference_layout(pipe, tmp_path):
    """The multi-panel figure mirrors create_connectivity_matrices_figure
    (`CCA_test_all.py:402-541`): a mean row and a std row, one panel
    per component, FIXED per-row scales (legend labels 0.6/0.2 — not
    data-derived), bold row labels, viridis/plasma ramp swatches."""
    import xml.etree.ElementTree as ET

    from oxford_data_pipeline_spark.pipeline.svg_figures import write_figure_svgs

    cfg, res = pipe
    paths = write_figure_svgs(res["cca_r2"], res["projection_avg"], str(tmp_path))
    root = ET.parse(paths["connectivity_panels"]).getroot()
    ns = {"s": "http://www.w3.org/2000/svg"}
    texts = [t.text for t in root.findall(".//s:text", ns) if t.text]
    assert "Mean Across Sessions" in texts and "Std Across Sessions" in texts
    assert any(t.startswith("Mean CV-R² [Comp ") for t in texts)
    assert any(t.startswith("Std CV-R² [Comp ") for t in texts)
    # fixed scales: both rows' vmax legend labels present
    assert "0.6" in texts and "0.2" in texts
    # ramp endpoints: viridis dark-purple anchor and plasma dark-blue anchor
    fills = {e.get("fill") for e in root.findall(".//s:rect", ns)}
    assert "#440154" in fills and "#0d0887" in fills


def test_sensitivity_curve_figure(pipe, tmp_path):
    """The sensitivity-curve figure (Oxford_glm_sensitivity.m:345-420
    parity): the table carries one (strategy, pct) row with SEM, and
    the rendered SVG has one line + band per strategy, byte-stable."""
    import xml.etree.ElementTree as ET

    from oxford_data_pipeline_spark.pipeline.figure_reports import (
        sensitivity_figure_table,
    )
    from oxford_data_pipeline_spark.pipeline.glm_stage import sensitivity_grid
    from oxford_data_pipeline_spark.pipeline.svg_figures import (
        write_sensitivity_svg,
    )

    cfg, res = pipe
    grid = sensitivity_grid(
        res["projections"], res["segmented"], res["sampled_neurons"],
        pcts=[0, 50], mc_iters=2,
    ).cache()
    tbl = sensitivity_figure_table(grid).collect()
    assert {(r.strategy, r.pct_removed) for r in tbl} == {
        ("top", 0), ("top", 50), ("random", 0), ("random", 50)
    }
    for r in tbl:
        assert 0.0 <= r.mean_r2 <= 1.0 + 1e-9

    p1 = write_sensitivity_svg(grid, str(tmp_path / "a"))
    p2 = write_sensitivity_svg(grid, str(tmp_path / "b"))
    with open(p1) as f1, open(p2) as f2:
        assert f1.read() == f2.read()
    ns = {"s": "http://www.w3.org/2000/svg"}
    root = ET.parse(p1).getroot()
    assert len(root.findall(".//s:polyline", ns)) == 2  # top, random
    assert len(root.findall(".//s:polygon", ns)) == 2   # SEM bands


def test_variance_curve_figure(pipe, tmp_path):
    """PCA cumulative-variance figure (PCA_test_all_seperate.py:228-311
    parity): monotone non-decreasing mean curves per region, one SVG
    line + SEM band per region, byte-stable."""
    import xml.etree.ElementTree as ET

    from oxford_data_pipeline_spark.pipeline.figure_reports import (
        variance_figure_table,
    )
    from oxford_data_pipeline_spark.pipeline.svg_figures import write_variance_svg

    cfg, res = pipe
    tbl = variance_figure_table(res["pca_variance"]).collect()
    assert tbl
    by_region = {}
    for r in tbl:
        by_region.setdefault(r.region, []).append((r.component, r.mean_cumulative))
    for region, pts in by_region.items():
        curve = [v for _, v in sorted(pts)]
        assert all(b >= a - 1e-9 for a, b in zip(curve, curve[1:])), region

    p1 = write_variance_svg(res["pca_variance"], str(tmp_path / "a"))
    p2 = write_variance_svg(res["pca_variance"], str(tmp_path / "b"))
    with open(p1) as f1, open(p2) as f2:
        assert f1.read() == f2.read()
    ns = {"s": "http://www.w3.org/2000/svg"}
    root = ET.parse(p1).getroot()
    assert len(root.findall(".//s:polyline", ns)) == len(by_region)
