"""Dependency-free SVG renderers for the Entry-C figure tables — the
reference's figure surface (`CCA_test_all.py:402-541,596-813,815-970`)
rendered for real, without matplotlib.

Pure string-built SVG, deterministic byte-for-byte (fixed float
formatting, no timestamps), driver-side over the already-small figure
tables — rendering never touches the cluster.

Visual rules follow the data-viz method this repo's tooling validates:
- magnitude (R² matrices) → sequential ramp, ONE hue light→dark;
- identity (time-course series) → fixed-order categorical slots from
  the validated reference palette, never cycled: series beyond the cap
  fold into a "not shown" legend note (the CSV is the table view);
- marks: 2 px lines, 2 px gaps between heatmap cells, recessive 1 px
  grid, text in ink colors (never the series color), direct labels at
  line ends plus a legend, native `<title>` tooltips per mark.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# validated categorical order (adjacent-pair CVD ΔE ≥ 8, normal ≥ 15;
# sub-3:1-contrast slots are relieved by direct labels + the CSV view)
SERIES_COLORS = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#e87ba4", "#008300"]
MAX_SERIES = 6
# sequential ramp endpoints: one blue hue, light→dark
_SEQ_LO, _SEQ_HI = (234, 241, 250), (21, 70, 127)
_SURFACE, _INK, _INK2, _GRID = "#fcfcfb", "#0b0b0b", "#52514e", "#e8e8e6"


def _f(x: float) -> str:
    """Fixed coordinate formatting so output is byte-deterministic."""
    return f"{x:.2f}".rstrip("0").rstrip(".")


def _seq(frac: float) -> str:
    frac = min(1.0, max(0.0, frac))
    r, g, b = (
        round(lo + (hi - lo) * frac) for lo, hi in zip(_SEQ_LO, _SEQ_HI)
    )
    return f"#{r:02x}{g:02x}{b:02x}"


def _esc(s: object) -> str:
    return (
        str(s).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def svg_heatmap(
    cells: list[dict], row_key: str, col_key: str, val_key: str, title: str,
    cell: int = 46, gap: int = 2,
    row_idx_key: str = "row_idx", col_idx_key: str = "col_idx",
) -> str:
    """Sequential heatmap of (row, col, value) cells. Rows/cols are
    ordered by the idx keys when present (anatomical order), else by
    their own values; every cell gets a value label (ink chosen for
    contrast against the cell fill) and a native tooltip."""
    if not cells:
        raise ValueError("no cells to render")

    def order(key, idx_key):
        seen = {}
        for c in cells:
            seen.setdefault(c[key], c.get(idx_key, c[key]))
        return [k for k, _ in sorted(seen.items(), key=lambda kv: (kv[1], kv[0]))]

    rows = order(row_key, row_idx_key)
    cols = order(col_key, col_idx_key)
    vals = [c[val_key] for c in cells if c[val_key] is not None]
    vmin, vmax = min(vals), max(vals)
    span = (vmax - vmin) or 1.0

    left, top = 90, 46
    w = left + len(cols) * (cell + gap) + 130
    h = top + len(rows) * (cell + gap) + 30
    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{h}"'
        f' font-family="sans-serif" font-size="11">',
        f'<rect width="{w}" height="{h}" fill="{_SURFACE}"/>',
        f'<text x="{left}" y="20" font-size="14" fill="{_INK}">{_esc(title)}</text>',
    ]
    for j, cl in enumerate(cols):
        x = left + j * (cell + gap) + cell / 2
        out.append(
            f'<text x="{_f(x)}" y="{top - 8}" text-anchor="middle"'
            f' fill="{_INK2}">{_esc(cl)}</text>'
        )
    for i, rl in enumerate(rows):
        y = top + i * (cell + gap) + cell / 2 + 4
        out.append(
            f'<text x="{left - 8}" y="{_f(y)}" text-anchor="end"'
            f' fill="{_INK2}">{_esc(rl)}</text>'
        )
    lut = {(c[row_key], c[col_key]): c for c in cells}
    for i, rl in enumerate(rows):
        for j, cl in enumerate(cols):
            c = lut.get((rl, cl))
            if c is None or c[val_key] is None:
                continue
            frac = (c[val_key] - vmin) / span
            x = left + j * (cell + gap)
            y = top + i * (cell + gap)
            ink = "#ffffff" if frac > 0.55 else _INK
            out.append(
                f'<g><rect x="{x}" y="{y}" width="{cell}" height="{cell}"'
                f' rx="4" fill="{_seq(frac)}">'
                f"<title>{_esc(rl)} × {_esc(cl)}: {c[val_key]:.6g}</title></rect>"
                f'<text x="{_f(x + cell / 2)}" y="{_f(y + cell / 2 + 4)}"'
                f' text-anchor="middle" fill="{ink}">{c[val_key]:.3g}</text></g>'
            )
    # color-scale legend: the ramp with min/max labels
    lx = left + len(cols) * (cell + gap) + 16
    for k in range(20):
        out.append(
            f'<rect x="{lx}" y="{top + k * 6}" width="14" height="6"'
            f' fill="{_seq(1 - k / 19)}"/>'
        )
    out.append(
        f'<text x="{lx + 20}" y="{top + 8}" fill="{_INK2}">{vmax:.3g}</text>'
    )
    out.append(
        f'<text x="{lx + 20}" y="{top + 124}" fill="{_INK2}">{vmin:.3g}</text>'
    )
    out.append("</svg>")
    return "".join(out)


def svg_timecourse(series: dict[str, list[tuple]], title: str,
                   width: int = 640, height: int = 340) -> str:
    """Line chart with SEM bands: series = {label: [(t, mean, sem)]},
    fixed-order categorical colors, direct label at each line end plus
    a legend row; beyond MAX_SERIES the rest fold into a muted note
    (the CSV artifact is the table view)."""
    if not series:
        raise ValueError("no series to render")
    keys = sorted(series)
    shown, folded = keys[:MAX_SERIES], keys[MAX_SERIES:]
    pts = [p for k in shown for p in series[k]]
    tmin, tmax = min(p[0] for p in pts), max(p[0] for p in pts)
    lo = min(p[1] - (p[2] or 0) for p in pts)
    hi = max(p[1] + (p[2] or 0) for p in pts)
    tspan, vspan = (tmax - tmin) or 1.0, (hi - lo) or 1.0
    left, top, right, bottom = 56, 46, 110, 40
    pw, ph = width - left - right, height - top - bottom

    def sx(t):
        return left + (t - tmin) / tspan * pw

    def sy(v):
        return top + (hi - v) / vspan * ph

    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}"'
        f' font-family="sans-serif" font-size="11">',
        f'<rect width="{width}" height="{height}" fill="{_SURFACE}"/>',
        f'<text x="{left}" y="20" font-size="14" fill="{_INK}">{_esc(title)}</text>',
    ]
    for k in range(5):  # recessive grid + y ticks
        v = lo + vspan * k / 4
        y = sy(v)
        out.append(
            f'<line x1="{left}" y1="{_f(y)}" x2="{left + pw}" y2="{_f(y)}"'
            f' stroke="{_GRID}" stroke-width="1"/>'
        )
        out.append(
            f'<text x="{left - 6}" y="{_f(y + 4)}" text-anchor="end"'
            f' fill="{_INK2}">{v:.3g}</text>'
        )
    for k in range(5):  # x ticks
        t = tmin + tspan * k / 4
        out.append(
            f'<text x="{_f(sx(t))}" y="{height - bottom + 16}" text-anchor="middle"'
            f' fill="{_INK2}">{t:.3g}</text>'
        )
    for idx, key in enumerate(shown):
        color = SERIES_COLORS[idx]
        rows = sorted(series[key])
        band_up = [(sx(t), sy(m + (s or 0))) for t, m, s in rows]
        band_dn = [(sx(t), sy(m - (s or 0))) for t, m, s in reversed(rows)]
        band = " ".join(f"{_f(x)},{_f(y)}" for x, y in band_up + band_dn)
        line = " ".join(f"{_f(sx(t))},{_f(sy(m))}" for t, m, _ in rows)
        out.append(f'<polygon points="{band}" fill="{color}" fill-opacity="0.15"/>')
        out.append(
            f'<polyline points="{line}" fill="none" stroke="{color}"'
            f' stroke-width="2"><title>{_esc(key)}</title></polyline>'
        )
        ex, ey = sx(rows[-1][0]), sy(rows[-1][1])
        out.append(  # direct label at line end (text ink, chip carries color)
            f'<circle cx="{_f(ex)}" cy="{_f(ey)}" r="3" fill="{color}"/>'
            f'<text x="{_f(ex + 6)}" y="{_f(ey + 4)}" fill="{_INK}">{_esc(key)}</text>'
        )
        ly = top + 16 * idx
        out.append(  # legend row
            f'<rect x="{width - right + 10}" y="{ly - 9}" width="10" height="10"'
            f' rx="2" fill="{color}"/>'
            f'<text x="{width - right + 26}" y="{ly}" fill="{_INK}">{_esc(key)}</text>'
        )
    if folded:
        ly = top + 16 * len(shown)
        out.append(
            f'<text x="{width - right + 10}" y="{ly}" fill="{_INK2}">'
            f"+{len(folded)} in CSV</text>"
        )
    out.append("</svg>")
    return "".join(out)


# Perceptual-ramp anchors for the reference figure's colormaps
# (`CCA_test_all.py:446-456` uses cmap='viridis' for means and
# 'plasma' for stds).  Anchor colors are the published matplotlib
# endpoints/quartiles; linear interpolation between anchors is a close
# visual stand-in without the dependency.
_VIRIDIS = [(68, 1, 84), (59, 82, 139), (33, 145, 140), (94, 201, 98), (253, 231, 37)]
_PLASMA = [(13, 8, 135), (126, 3, 168), (204, 71, 120), (248, 149, 64), (240, 249, 33)]


def _ramp(anchors: list[tuple], frac: float) -> str:
    frac = min(1.0, max(0.0, frac))
    pos = frac * (len(anchors) - 1)
    i = min(int(pos), len(anchors) - 2)
    t = pos - i
    r, g, b = (
        round(a + (b_ - a) * t) for a, b_ in zip(anchors[i], anchors[i + 1])
    )
    return f"#{r:02x}{g:02x}{b:02x}"


def svg_connectivity_panels(
    cells: list[dict], ranks: list[int], title: str,
    cell: int = 40, gap: int = 2,
) -> str:
    """The reference's multi-panel connectivity figure layout
    (`CCA_test_all.py:402-541` create_connectivity_matrices_figure):
    row 1 = mean CV-R² matrices on a FIXED 0–0.6 viridis scale, row 2 =
    std matrices on a FIXED 0–0.2 plasma scale, one column per
    component rank, anatomical region order, bold row labels — the
    fixed scales (not data-derived) are what make panels comparable
    across runs, the styling detail the reference pins."""
    if not cells:
        raise ValueError("no cells to render")
    regions: dict = {}
    for c in cells:
        regions.setdefault(c["pair_r1"], c["row_idx"])
        regions.setdefault(c["pair_r2"], c["col_idx"])
    order = [k for k, _ in sorted(regions.items(), key=lambda kv: (kv[1], kv[0]))]
    n = len(order)
    rows_spec = [
        ("Mean Across Sessions", "mean_r2", 0.0, 0.6, _VIRIDIS, "Mean CV-R²"),
        ("Std Across Sessions", "std_r2", 0.0, 0.2, _PLASMA, "Std CV-R²"),
    ]
    left, top = 150, 52
    pw = n * (cell + gap) + 40   # panel width incl. spacing
    ph = n * (cell + gap) + 46   # panel height incl. titles
    w = left + len(ranks) * pw + 70
    h = top + 2 * ph + 20
    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{h}"'
        f' font-family="sans-serif" font-size="10">',
        f'<rect width="{w}" height="{h}" fill="{_SURFACE}"/>',
        f'<text x="{left}" y="22" font-size="14" fill="{_INK}">{_esc(title)}</text>',
    ]
    lut = {(c["rank"], c["pair_r1"], c["pair_r2"]): c for c in cells}
    for ri, (row_label, key, vmin, vmax, ramp, panel_word) in enumerate(rows_spec):
        py0 = top + ri * ph
        out.append(
            f'<text x="16" y="{_f(py0 + (n * (cell + gap)) / 2)}"'
            f' font-size="12" font-weight="bold" fill="{_INK}"'
            f'>{_esc(row_label)}</text>'
        )
        for ci, rk in enumerate(ranks):
            px0 = left + ci * pw
            out.append(
                f'<text x="{_f(px0 + (n * (cell + gap)) / 2)}" y="{py0 - 6}"'
                f' text-anchor="middle" font-size="11" fill="{_INK}"'
                f'>{_esc(panel_word)} [Comp {rk}]</text>'
            )
            for i, rl in enumerate(order):
                if ci == 0:
                    out.append(
                        f'<text x="{px0 - 6}" y="{_f(py0 + i * (cell + gap) + cell / 2 + 4)}"'
                        f' text-anchor="end" fill="{_INK2}">{_esc(rl)}</text>'
                    )
                for j, cl in enumerate(order):
                    c = lut.get((rk, rl, cl))
                    if c is None or c.get(key) is None:
                        continue
                    frac = (c[key] - vmin) / (vmax - vmin)
                    x, y = px0 + j * (cell + gap), py0 + i * (cell + gap)
                    ink = "#ffffff" if frac < 0.55 else _INK
                    out.append(
                        f'<g><rect x="{x}" y="{y}" width="{cell}" height="{cell}"'
                        f' rx="3" fill="{_ramp(ramp, frac)}">'
                        f"<title>{_esc(rl)} × {_esc(cl)} comp {rk}:"
                        f" {c[key]:.6g}</title></rect>"
                        f'<text x="{_f(x + cell / 2)}" y="{_f(y + cell / 2 + 4)}"'
                        f' text-anchor="middle" fill="{ink}">{c[key]:.2g}</text></g>'
                    )
            if ci == 0:
                for j, cl in enumerate(order):
                    out.append(
                        f'<text x="{_f(px0 + j * (cell + gap) + cell / 2)}"'
                        f' y="{py0 + n * (cell + gap) + 12}" text-anchor="middle"'
                        f' fill="{_INK2}">{_esc(cl)}</text>'
                    )
        # fixed color scale per row (the reference's vmin/vmax)
        lx = left + len(ranks) * pw + 10
        for k in range(20):
            out.append(
                f'<rect x="{lx}" y="{py0 + k * 6}" width="12" height="6"'
                f' fill="{_ramp(ramp, 1 - k / 19)}"/>'
            )
        out.append(f'<text x="{lx + 16}" y="{py0 + 8}" fill="{_INK2}">{vmax:g}</text>')
        out.append(f'<text x="{lx + 16}" y="{py0 + 124}" fill="{_INK2}">{vmin:g}</text>')
    out.append("</svg>")
    return "".join(out)


def write_figure_svgs(
    cca_r2: DataFrame, projection_avg: DataFrame, out_dir: str,
    min_sessions: int = 3,
) -> dict[str, str]:
    """Render the three Entry-C figures as SVG files next to the CSV
    tables: rank-1 connectivity heatmap, pair × component population
    summary, and the temporal projection of the first (anatomical)
    pair. Returns {figure: path}."""
    from oxford_data_pipeline_spark.pipeline.figure_reports import (
        connectivity_figure_table,
        population_summary_table,
        timecourse_figure_table,
    )

    os.makedirs(out_dir, exist_ok=True)
    paths: dict[str, str] = {}

    conn = [
        r.asDict()
        for r in connectivity_figure_table(
            cca_r2, ranks=(1,), min_sessions=min_sessions
        ).collect()
    ]
    svg = svg_heatmap(
        conn, "pair_r1", "pair_r2", "mean_r2",
        "Rank-1 connectivity (mean CV-R² across sessions)",
    )
    paths["connectivity_matrix"] = os.path.join(out_dir, "connectivity_matrix.svg")
    with open(paths["connectivity_matrix"], "w") as f:
        f.write(svg)

    # the reference's full multi-panel layout (mean row / std row ×
    # component columns, fixed scales, viridis/plasma)
    ranks = (1, 2, 3)
    panel_cells = [
        r.asDict()
        for r in connectivity_figure_table(
            cca_r2, ranks=ranks, min_sessions=min_sessions
        ).collect()
    ]
    svg = svg_connectivity_panels(
        panel_cells, list(ranks), "CCA connectivity matrices (mean | std)"
    )
    paths["connectivity_panels"] = os.path.join(out_dir, "connectivity_panels.svg")
    with open(paths["connectivity_panels"], "w") as f:
        f.write(svg)

    pop = [
        r.asDict()
        for r in population_summary_table(cca_r2, min_sessions=min_sessions).collect()
    ]
    for c in pop:
        c["pair"] = f"{c['pair_r1']}–{c['pair_r2']}"
        c["pair_order"] = (c["row_idx"], c["col_idx"])
    svg = svg_heatmap(
        pop, "pair", "component", "mean_r2",
        "Population summary (mean CV-R² per pair × component)",
        row_idx_key="pair_order", col_idx_key="component",
    )
    paths["population_summary"] = os.path.join(out_dir, "population_summary.svg")
    with open(paths["population_summary"], "w") as f:
        f.write(svg)

    tc = [r.asDict() for r in timecourse_figure_table(projection_avg).collect()]
    first_pair = min((c["pair_r1"], c["pair_r2"]) for c in tc)
    series: dict[str, list[tuple]] = {}
    for c in tc:
        if (c["pair_r1"], c["pair_r2"]) != first_pair:
            continue
        series.setdefault(f"{c['side']}{c['component']}", []).append(
            (c["t"], c["mean_value"], c["sem_value"])
        )
    svg = svg_timecourse(
        series,
        f"Temporal projection {first_pair[0]}–{first_pair[1]} (mean ± SEM)",
    )
    paths["temporal_projection"] = os.path.join(out_dir, "temporal_projection.svg")
    with open(paths["temporal_projection"], "w") as f:
        f.write(svg)
    return paths


def write_variance_svg(pca_variance: DataFrame, out_dir: str) -> str:
    """Render the PCA cumulative-variance curves (mean cumulative
    explained variance ± SEM vs component, one line per region) — the
    PCA variant's figure (`PCA_test_all_seperate.py:228-311`)."""
    from oxford_data_pipeline_spark.pipeline.figure_reports import (
        variance_figure_table,
    )

    os.makedirs(out_dir, exist_ok=True)
    rows = [r.asDict() for r in variance_figure_table(pca_variance).collect()]
    series: dict[str, list[tuple]] = {}
    for r in rows:
        series.setdefault(r["region"], []).append(
            (r["component"], r["mean_cumulative"], r["sem_cumulative"])
        )
    svg = svg_timecourse(
        series, "PCA cumulative explained variance (mean ± SEM vs component)"
    )
    path = os.path.join(out_dir, "cumulative_variance.svg")
    with open(path, "w") as f:
        f.write(svg)
    return path


def write_sensitivity_svg(sensitivity: DataFrame, out_dir: str) -> str:
    """Render the neuron-removal sensitivity curves (mean R² ± SEM vs
    removal %, one line per strategy) — the reference's
    `Oxford_glm_sensitivity.m:345-420` figure — from the M7 grid."""
    from oxford_data_pipeline_spark.pipeline.figure_reports import (
        sensitivity_figure_table,
    )

    os.makedirs(out_dir, exist_ok=True)
    rows = [r.asDict() for r in sensitivity_figure_table(sensitivity).collect()]
    series: dict[str, list[tuple]] = {}
    for r in rows:
        series.setdefault(r["strategy"], []).append(
            (r["pct_removed"], r["mean_r2"], r["sem_r2"])
        )
    svg = svg_timecourse(
        series, "Neuron-removal sensitivity (mean R² ± SEM vs % removed)"
    )
    path = os.path.join(out_dir, "sensitivity_curves.svg")
    with open(path, "w") as f:
        f.write(svg)
    return path
