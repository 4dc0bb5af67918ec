"""Property + determinism tests for the grouped-UDF ML queries and the
multimodal plumbing (rows-only operators: no DuckDB oracle exists)."""

from __future__ import annotations

import pytest

from oxford_data_pipeline_spark.plans import QUERIES
from tests.conftest import SF_DIR


def _rows(spark, name):
    return QUERIES[name](spark, SF_DIR).collect()


def test_m4_cv_pca(spark):
    rows = _rows(spark, "m4_cv_pca")
    assert rows
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r)
    for label, rs in by_label.items():
        rs = sorted(rs, key=lambda r: r.component)
        assert [r.component for r in rs] == [1, 2, 3, 4, 5]
        ev = [r.explained_variance for r in rs]
        assert all(e >= 0 for e in ev)
        cum = [r.cumulative_variance for r in rs]
        assert cum == sorted(cum)
        mse = [r.mean_cv_mse for r in rs]
        assert all(b <= a + 1e-9 for a, b in zip(mse, mse[1:]))


def test_m1_cv_cca_bounds(spark):
    rows = _rows(spark, "m1_cv_cca")
    assert rows
    assert all(0.0 <= r.r2 <= 1.0 for r in rows)
    folds = {r.fold for r in rows}
    comps = {r.component for r in rows}
    assert folds == {1, 2, 3, 4, 5}
    assert comps == {1, 2, 3, 4, 5}


def test_m6_glm_inference(spark):
    rows = _rows(spark, "m6_glm_inference")
    assert rows
    for r in rows:
        assert 0.0 <= r.p_value <= 1.0
        assert r.ci_lo <= r.beta <= r.ci_hi
        assert r.adj_r2 <= r.r2 + 1e-12


def test_m7_sensitivity_monotone_grid(spark):
    rows = _rows(spark, "m7_sensitivity")
    assert rows
    # pct=0: top and random strategies agree (nothing removed)
    base = {}
    for r in rows:
        if r.pct_removed == 0:
            base.setdefault((r.label, r.strategy), set()).add(round(r.r2, 9))
    labels = {k[0] for k in base}
    for lab in labels:
        assert base[(lab, "top")] == base[(lab, "random")]


def test_m8_stability_bounds(spark):
    rows = _rows(spark, "m8_stability")
    assert rows
    assert all(-1.0 <= r.corr_to_ref <= 1.0 for r in rows if r.corr_to_ref is not None)


def test_m10_wilcoxon(spark):
    rows = _rows(spark, "m10_wilcoxon")
    assert len(rows) == 1
    r = rows[0]
    assert r.n > 0 and 0.0 <= r.p_value <= 1.0


def test_m14_angles_bounds(spark):
    rows = _rows(spark, "m14_principal_angles")
    assert rows
    assert all(0.0 <= r.angle_deg <= 90.0 + 1e-9 for r in rows)


def test_m15_participation_normalized(spark):
    rows = _rows(spark, "m15_cca_pca_participation")
    assert rows
    by_pair = {}
    for r in rows:
        by_pair.setdefault(r.pair_id, []).append(r)
    for pair, rs in by_pair.items():
        total = sum(r.alpha_norm for r in rs)
        assert total == pytest.approx(1.0, abs=1e-9)
        assert all(1.0 <= r.entropy_effdim <= len(rs) + 1e-9 for r in rs)


def test_mm_byte_features(spark):
    rows = _rows(spark, "mm_byte_features")
    assert {r.modality for r in rows} == {"image", "audio", "video"}
    for r in rows:
        assert 0.0 <= r.avg_entropy <= 4.0  # 16 bins → ≤ log2(16)
        assert 0.0 <= r.avg_hist_bin0 <= 1.0


def test_decode_media_rejects_unknown_payloads():
    """decode_media is REAL (operators.codecs, round 6) — unknown
    payloads fail with ValueError (quarantine-row contract), never
    NotImplementedError, and real PNG bytes decode."""
    import numpy as np

    from oxford_data_pipeline_spark.operators.codecs import png_encode
    from oxford_data_pipeline_spark.operators.multimodal import decode_media

    with pytest.raises(ValueError, match="unknown media format"):
        decode_media(b"xx", "image")
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    arr, meta = decode_media(png_encode(img), "image")
    assert (arr == img).all() and meta["format"] == "png"


@pytest.mark.parametrize("name", ["m4_cv_pca", "m7_sensitivity", "m8_stability"])
def test_seed_determinism(spark, name):
    """Same query twice → identical rows (seeded randomness, sorted
    group input — SURVEY §7 hard parts 1-2)."""
    a = sorted(map(tuple, _rows(spark, name)))
    b = sorted(map(tuple, _rows(spark, name)))
    assert a == b


def test_multimodal_resize_and_frame_sample(spark):
    from oxford_data_pipeline_spark.operators.multimodal import (
        attach_binary_payload,
        resize_strips,
        sample_frames,
    )
    from oxford_data_pipeline_spark.sources.catalog import load_table

    mm = attach_binary_payload(load_table(spark, SF_DIR, "documents"))
    strips = resize_strips(mm).collect()
    assert strips and all(len(r.strip) == 8 for r in strips)
    assert all(0.0 <= v <= 255.0 for r in strips for v in r.strip)
    frames = sample_frames(mm).collect()
    assert frames
    assert all(r.frame_idx < 4 for r in frames)
    # only video-modality docs produce frames
    vids = {r.doc_id for r in mm.filter("meta.modality = 'video'").collect()}
    assert {r.doc_id for r in frames} <= vids


def test_multimodal_all_empty_payload_batch():
    """An Arrow batch where EVERY payload is empty must not crash the
    vectorized kernels (regression: fake_resize_features indexed into a
    zero-length byte array) and must match the per-row semantics:
    zero strip, zero entropy, no frames."""
    import pandas as pd

    from oxford_data_pipeline_spark.operators.multimodal import (
        fake_decode_features,
        fake_frame_sample,
        fake_resize_features,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "payload": [b"", b""],
            "meta": [
                {"mime": "application/octet-stream", "modality": "image", "n_bytes": 0},
                {"mime": "application/octet-stream", "modality": "video", "n_bytes": 0},
            ],
        }
    )
    strips = pd.concat(list(fake_resize_features(iter([pdf]))))
    assert list(strips["doc_id"]) == [1, 2]
    assert all(list(s) == [0.0] * 8 for s in strips["strip"])
    feats = pd.concat(list(fake_decode_features(iter([pdf]))))
    assert list(feats["byte_entropy"]) == [0.0, 0.0]
    frames = pd.concat(list(fake_frame_sample(iter([pdf]))))
    assert len(frames) == 0


def test_dedup_clusters_are_consistent(spark):
    """Cluster labels form valid connected components of the pair graph:
    every edge joins same-cluster docs, exactly one survivor (= min
    doc_id) per cluster."""
    from oxford_data_pipeline_spark.plans.dedup import dedup_minhash_lsh

    rows = _rows(spark, "dedup_clusters")
    assert rows
    label = {r.doc_id: r.cluster_id for r in rows}
    pairs = dedup_minhash_lsh(spark, SF_DIR).collect()
    for p in pairs:
        assert label[p.doc1] == label[p.doc2]
    clusters = {}
    for r in rows:
        clusters.setdefault(r.cluster_id, []).append(r)
    for cid, members in clusters.items():
        assert cid == min(m.doc_id for m in members)
        survivors = [m for m in members if m.is_survivor]
        assert len(survivors) == 1 and survivors[0].doc_id == cid


def test_m6_closed_form_matches_udf_kernel(spark):
    """The hash-checked closed-form OLS (normal equations as column
    algebra) must agree with the numpy lstsq kernel the rows-only UDF
    query uses, on the identical 2-predictor design — ties the
    SQL-verifiable math to the full-inference path."""
    import numpy as np
    from pyspark.sql import functions as F

    from oxford_data_pipeline_spark.ml.linalg import ols_inference
    from oxford_data_pipeline_spark.sources.catalog import load_table

    feats = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.col("value").alias("y"),
            (F.expr("ts DIV 3600000000000") % 24).cast("double").alias("x1"),
            (F.col("user_id") % 10).cast("double").alias("x2"),
        )
        .toPandas()
    )
    got = {
        (r.event_type, r.term): r
        for r in _rows(spark, "m6_glm_closed_form")
    }
    assert got
    for etype, grp in feats.groupby("event_type"):
        res = ols_inference(
            grp[["x1", "x2"]].to_numpy(float), grp["y"].to_numpy(float),
            inference=False,
        )
        for i, term in enumerate(["intercept", "x_hour", "x_user"]):
            row = got[(etype, term)]
            assert row.beta == pytest.approx(res["beta"][i], abs=2e-6)
            assert row.se == pytest.approx(res["se"][i], abs=2e-6)
            assert row.r2 == pytest.approx(res["r2"], abs=2e-6)
            assert row.adj_r2 == pytest.approx(res["adj_r2"], abs=2e-6)
            assert row.n == len(grp)
