"""Dependency-free SVG line charts (S11 plot sinks).

The reference renders its four result charts with matplotlib
(chromadb_speed_experiment.py:520-591, chromadb_acc_experiment.py:667-756).
matplotlib is not in this container, so the plot sink emits standalone SVG
from pure string templating — same axes/series semantics, no native deps.
``plot_results``/callers try matplotlib first and fall back here.
"""

from __future__ import annotations

import math

_W, _H = 800, 450
_ML, _MR, _MT, _MB = 70, 160, 40, 55  # margins: right holds the legend
_COLORS = ["#4269d0", "#efb118", "#ff725c", "#6cc5b0", "#a463f2", "#97bbf5"]


def _ticks(lo: float, hi: float, n: int = 6) -> list[float]:
    if hi <= lo:
        hi = lo + 1.0
    raw = (hi - lo) / max(n - 1, 1)
    mag = 10 ** math.floor(math.log10(raw))
    step = min(s * mag for s in (1, 2, 2.5, 5, 10) if s * mag >= raw)
    t0 = math.floor(lo / step) * step
    out = []
    t = t0
    while t <= hi + step * 1e-9:
        if t >= lo - step * 1e-9:
            out.append(round(t, 10))
        t += step
    return out


def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return f"{int(v):,}"
    return f"{v:g}"


def line_chart(
    series: dict[str, list[tuple[float, float]]],
    path: str,
    title: str = "",
    xlabel: str = "",
    ylabel: str = "",
    y_range: tuple[float, float] | None = None,
) -> str:
    """Write a multi-series line chart to ``path`` (SVG), return the path.

    ``series`` maps legend label -> [(x, y), ...] (sorted by x by caller
    or not — sorted here)."""
    pts_all = [p for pts in series.values() for p in pts]
    xs = [p[0] for p in pts_all] or [0.0, 1.0]
    ys = [p[1] for p in pts_all] or [0.0, 1.0]
    x_lo, x_hi = min(xs), max(xs)
    y_lo, y_hi = (min(ys), max(ys)) if y_range is None else y_range
    if x_hi == x_lo:
        x_hi = x_lo + 1
    if y_hi == y_lo:
        y_hi = y_lo + 1
    pw, ph = _W - _ML - _MR, _H - _MT - _MB

    def X(x: float) -> float:
        return _ML + (x - x_lo) / (x_hi - x_lo) * pw

    def Y(y: float) -> float:
        return _MT + ph - (y - y_lo) / (y_hi - y_lo) * ph

    e: list[str] = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{_H}" '
        f'viewBox="0 0 {_W} {_H}" font-family="sans-serif">',
        f'<rect width="{_W}" height="{_H}" fill="white"/>',
        f'<text x="{_ML}" y="24" font-size="15" font-weight="bold">{title}</text>',
    ]
    for t in _ticks(y_lo, y_hi):
        y = Y(t)
        e.append(
            f'<line x1="{_ML}" y1="{y:.1f}" x2="{_W - _MR}" y2="{y:.1f}" '
            f'stroke="#e0e0e0" stroke-width="1"/>'
        )
        e.append(
            f'<text x="{_ML - 8}" y="{y + 4:.1f}" font-size="11" '
            f'text-anchor="end" fill="#555">{_fmt(t)}</text>'
        )
    for t in _ticks(x_lo, x_hi):
        x = X(t)
        e.append(
            f'<line x1="{x:.1f}" y1="{_MT + ph}" x2="{x:.1f}" y2="{_MT + ph + 5}" '
            f'stroke="#555"/>'
        )
        e.append(
            f'<text x="{x:.1f}" y="{_MT + ph + 20}" font-size="11" '
            f'text-anchor="middle" fill="#555">{_fmt(t)}</text>'
        )
    e.append(
        f'<line x1="{_ML}" y1="{_MT + ph}" x2="{_W - _MR}" y2="{_MT + ph}" '
        f'stroke="#333"/>'
    )
    e.append(f'<line x1="{_ML}" y1="{_MT}" x2="{_ML}" y2="{_MT + ph}" stroke="#333"/>')
    e.append(
        f'<text x="{_ML + pw / 2:.1f}" y="{_H - 12}" font-size="12" '
        f'text-anchor="middle">{xlabel}</text>'
    )
    e.append(
        f'<text x="18" y="{_MT + ph / 2:.1f}" font-size="12" text-anchor="middle" '
        f'transform="rotate(-90 18 {_MT + ph / 2:.1f})">{ylabel}</text>'
    )
    for i, (label, pts) in enumerate(series.items()):
        color = _COLORS[i % len(_COLORS)]
        pts = sorted(pts)
        poly = " ".join(f"{X(x):.1f},{Y(y):.1f}" for x, y in pts)
        e.append(
            f'<polyline points="{poly}" fill="none" stroke="{color}" stroke-width="2"/>'
        )
        for x, y in pts:
            e.append(f'<circle cx="{X(x):.1f}" cy="{Y(y):.1f}" r="3" fill="{color}"/>')
        ly = _MT + 14 + i * 18
        e.append(
            f'<line x1="{_W - _MR + 10}" y1="{ly - 4}" x2="{_W - _MR + 30}" '
            f'y2="{ly - 4}" stroke="{color}" stroke-width="2"/>'
        )
        e.append(f'<text x="{_W - _MR + 35}" y="{ly}" font-size="11">{label}</text>')
    e.append("</svg>")
    with open(path, "w") as f:
        f.write("\n".join(e))
    return path


def bar_chart(
    categories: list[str],
    series: dict[str, list[float]],
    path: str,
    title: str = "",
    xlabel: str = "",
    ylabel: str = "",
) -> str:
    """Grouped vertical bars: one group per category, one bar per series
    (the reference's by-collection comparison charts)."""
    ys = [v for vs in series.values() for v in vs] or [1.0]
    y_lo, y_hi = min(0.0, min(ys)), max(ys)
    if y_hi == y_lo:
        y_hi = y_lo + 1
    pw, ph = _W - _ML - _MR, _H - _MT - _MB
    n_cat, n_ser = max(len(categories), 1), max(len(series), 1)
    group_w = pw / n_cat
    bar_w = group_w * 0.8 / n_ser

    def Y(y: float) -> float:
        return _MT + ph - (y - y_lo) / (y_hi - y_lo) * ph

    e: list[str] = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{_H}" '
        f'viewBox="0 0 {_W} {_H}" font-family="sans-serif">',
        f'<rect width="{_W}" height="{_H}" fill="white"/>',
        f'<text x="{_ML}" y="24" font-size="15" font-weight="bold">{title}</text>',
    ]
    for t in _ticks(y_lo, y_hi):
        y = Y(t)
        e.append(
            f'<line x1="{_ML}" y1="{y:.1f}" x2="{_W - _MR}" y2="{y:.1f}" '
            f'stroke="#e0e0e0"/>'
        )
        e.append(
            f'<text x="{_ML - 8}" y="{y + 4:.1f}" font-size="11" '
            f'text-anchor="end" fill="#555">{_fmt(t)}</text>'
        )
    for ci, cat in enumerate(categories):
        cx = _ML + group_w * (ci + 0.5)
        e.append(
            f'<text x="{cx:.1f}" y="{_MT + ph + 18}" font-size="10" '
            f'text-anchor="middle" fill="#555">{cat}</text>'
        )
        for si, (label, vals) in enumerate(series.items()):
            if ci >= len(vals):
                continue
            color = _COLORS[si % len(_COLORS)]
            x0 = cx - group_w * 0.4 + si * bar_w
            y0 = Y(vals[ci])
            e.append(
                f'<rect x="{x0:.1f}" y="{y0:.1f}" width="{bar_w:.1f}" '
                f'height="{_MT + ph - y0:.1f}" fill="{color}"/>'
            )
    e.append(
        f'<line x1="{_ML}" y1="{_MT + ph}" x2="{_W - _MR}" y2="{_MT + ph}" '
        f'stroke="#333"/>'
    )
    e.append(f'<line x1="{_ML}" y1="{_MT}" x2="{_ML}" y2="{_MT + ph}" stroke="#333"/>')
    e.append(
        f'<text x="{_ML + pw / 2:.1f}" y="{_H - 12}" font-size="12" '
        f'text-anchor="middle">{xlabel}</text>'
    )
    e.append(
        f'<text x="18" y="{_MT + ph / 2:.1f}" font-size="12" text-anchor="middle" '
        f'transform="rotate(-90 18 {_MT + ph / 2:.1f})">{ylabel}</text>'
    )
    for i, label in enumerate(series):
        color = _COLORS[i % len(_COLORS)]
        ly = _MT + 14 + i * 18
        e.append(
            f'<rect x="{_W - _MR + 10}" y="{ly - 10}" width="12" height="12" '
            f'fill="{color}"/>'
        )
        e.append(f'<text x="{_W - _MR + 28}" y="{ly}" font-size="11">{label}</text>')
    e.append("</svg>")
    with open(path, "w") as f:
        f.write("\n".join(e))
    return path
