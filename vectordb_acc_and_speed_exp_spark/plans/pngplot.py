"""Dependency-free PNG chart renderer (S11 plot sinks, bitmap parity).

The reference ships its four result charts as PNGs rendered by matplotlib
(chromadb_speed_experiment.py:520-591, chromadb_acc_experiment.py:667-756).
matplotlib is not importable in this container, so this module rasterizes
the same charts onto a numpy RGB canvas and encodes the PNG by hand
(stdlib ``zlib`` + ``struct`` — IHDR/IDAT/IEND with per-scanline filter 0).
API mirrors ``plans.svgplot`` (``line_chart`` / ``bar_chart``); callers
emit both formats so the artifact set contains real ``.png`` files with
the reference's filenames.

Text is a 5x7 public-domain-style bitmap font (coverage: digits, ASCII
letters, common punctuation); unknown glyphs render as a hollow box.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .svgplot import _COLORS, _fmt, _ticks

_W, _H = 800, 450
_ML, _MR, _MT, _MB = 70, 160, 40, 55

# -- 5x7 font: 7 rows of 5 cells per glyph ('X' = on) ----------------------
_F = {
    " ": ["....."] * 7,
    "!": ["..X..", "..X..", "..X..", "..X..", "..X..", ".....", "..X.."],
    "%": ["XX..X", "XX..X", "...X.", "..X..", ".X...", "X..XX", "X..XX"],
    "(": ["...X.", "..X..", ".X...", ".X...", ".X...", "..X..", "...X."],
    ")": [".X...", "..X..", "...X.", "...X.", "...X.", "..X..", ".X..."],
    "+": [".....", "..X..", "..X..", "XXXXX", "..X..", "..X..", "....."],
    ",": [".....", ".....", ".....", ".....", ".....", "..X..", ".X..."],
    "-": [".....", ".....", ".....", "XXXXX", ".....", ".....", "....."],
    ".": [".....", ".....", ".....", ".....", ".....", ".XX..", ".XX.."],
    "/": ["....X", "...X.", "...X.", "..X..", ".X...", ".X...", "X...."],
    "0": [".XXX.", "X...X", "X..XX", "X.X.X", "XX..X", "X...X", ".XXX."],
    "1": ["..X..", ".XX..", "..X..", "..X..", "..X..", "..X..", ".XXX."],
    "2": [".XXX.", "X...X", "....X", "...X.", "..X..", ".X...", "XXXXX"],
    "3": [".XXX.", "X...X", "....X", "..XX.", "....X", "X...X", ".XXX."],
    "4": ["...X.", "..XX.", ".X.X.", "X..X.", "XXXXX", "...X.", "...X."],
    "5": ["XXXXX", "X....", "XXXX.", "....X", "....X", "X...X", ".XXX."],
    "6": ["..XX.", ".X...", "X....", "XXXX.", "X...X", "X...X", ".XXX."],
    "7": ["XXXXX", "....X", "...X.", "..X..", ".X...", ".X...", ".X..."],
    "8": [".XXX.", "X...X", "X...X", ".XXX.", "X...X", "X...X", ".XXX."],
    "9": [".XXX.", "X...X", "X...X", ".XXXX", "....X", "...X.", ".XX.."],
    ":": [".....", ".XX..", ".XX..", ".....", ".XX..", ".XX..", "....."],
    "=": [".....", ".....", "XXXXX", ".....", "XXXXX", ".....", "....."],
    "@": [".XXX.", "X...X", "X.XXX", "X.X.X", "X.XXX", "X....", ".XXX."],
    "A": [".XXX.", "X...X", "X...X", "XXXXX", "X...X", "X...X", "X...X"],
    "B": ["XXXX.", "X...X", "X...X", "XXXX.", "X...X", "X...X", "XXXX."],
    "C": [".XXX.", "X...X", "X....", "X....", "X....", "X...X", ".XXX."],
    "D": ["XXXX.", "X...X", "X...X", "X...X", "X...X", "X...X", "XXXX."],
    "E": ["XXXXX", "X....", "X....", "XXXX.", "X....", "X....", "XXXXX"],
    "F": ["XXXXX", "X....", "X....", "XXXX.", "X....", "X....", "X...."],
    "G": [".XXX.", "X...X", "X....", "X.XXX", "X...X", "X...X", ".XXXX"],
    "H": ["X...X", "X...X", "X...X", "XXXXX", "X...X", "X...X", "X...X"],
    "I": [".XXX.", "..X..", "..X..", "..X..", "..X..", "..X..", ".XXX."],
    "J": ["..XXX", "...X.", "...X.", "...X.", "...X.", "X..X.", ".XX.."],
    "K": ["X...X", "X..X.", "X.X..", "XX...", "X.X..", "X..X.", "X...X"],
    "L": ["X....", "X....", "X....", "X....", "X....", "X....", "XXXXX"],
    "M": ["X...X", "XX.XX", "X.X.X", "X.X.X", "X...X", "X...X", "X...X"],
    "N": ["X...X", "XX..X", "X.X.X", "X..XX", "X...X", "X...X", "X...X"],
    "O": [".XXX.", "X...X", "X...X", "X...X", "X...X", "X...X", ".XXX."],
    "P": ["XXXX.", "X...X", "X...X", "XXXX.", "X....", "X....", "X...."],
    "Q": [".XXX.", "X...X", "X...X", "X...X", "X.X.X", "X..X.", ".XX.X"],
    "R": ["XXXX.", "X...X", "X...X", "XXXX.", "X.X..", "X..X.", "X...X"],
    "S": [".XXXX", "X....", "X....", ".XXX.", "....X", "....X", "XXXX."],
    "T": ["XXXXX", "..X..", "..X..", "..X..", "..X..", "..X..", "..X.."],
    "U": ["X...X", "X...X", "X...X", "X...X", "X...X", "X...X", ".XXX."],
    "V": ["X...X", "X...X", "X...X", "X...X", "X...X", ".X.X.", "..X.."],
    "W": ["X...X", "X...X", "X...X", "X.X.X", "X.X.X", "XX.XX", "X...X"],
    "X": ["X...X", "X...X", ".X.X.", "..X..", ".X.X.", "X...X", "X...X"],
    "Y": ["X...X", "X...X", ".X.X.", "..X..", "..X..", "..X..", "..X.."],
    "Z": ["XXXXX", "....X", "...X.", "..X..", ".X...", "X....", "XXXXX"],
    "_": [".....", ".....", ".....", ".....", ".....", ".....", "XXXXX"],
    "a": [".....", ".....", ".XXX.", "....X", ".XXXX", "X...X", ".XXXX"],
    "b": ["X....", "X....", "XXXX.", "X...X", "X...X", "X...X", "XXXX."],
    "c": [".....", ".....", ".XXX.", "X....", "X....", "X...X", ".XXX."],
    "d": ["....X", "....X", ".XXXX", "X...X", "X...X", "X...X", ".XXXX"],
    "e": [".....", ".....", ".XXX.", "X...X", "XXXXX", "X....", ".XXX."],
    "f": ["..XX.", ".X..X", ".X...", "XXX..", ".X...", ".X...", ".X..."],
    "g": [".....", ".XXXX", "X...X", "X...X", ".XXXX", "....X", ".XXX."],
    "h": ["X....", "X....", "XXXX.", "X...X", "X...X", "X...X", "X...X"],
    "i": ["..X..", ".....", ".XX..", "..X..", "..X..", "..X..", ".XXX."],
    "j": ["...X.", ".....", "..XX.", "...X.", "...X.", "X..X.", ".XX.."],
    "k": ["X....", "X....", "X..X.", "X.X..", "XX...", "X.X..", "X..X."],
    "l": [".XX..", "..X..", "..X..", "..X..", "..X..", "..X..", ".XXX."],
    "m": [".....", ".....", "XX.X.", "X.X.X", "X.X.X", "X.X.X", "X.X.X"],
    "n": [".....", ".....", "XXXX.", "X...X", "X...X", "X...X", "X...X"],
    "o": [".....", ".....", ".XXX.", "X...X", "X...X", "X...X", ".XXX."],
    "p": [".....", ".....", "XXXX.", "X...X", "XXXX.", "X....", "X...."],
    "q": [".....", ".....", ".XXXX", "X...X", ".XXXX", "....X", "....X"],
    "r": [".....", ".....", "X.XX.", "XX..X", "X....", "X....", "X...."],
    "s": [".....", ".....", ".XXXX", "X....", ".XXX.", "....X", "XXXX."],
    "t": [".X...", ".X...", "XXX..", ".X...", ".X...", ".X..X", "..XX."],
    "u": [".....", ".....", "X...X", "X...X", "X...X", "X...X", ".XXXX"],
    "v": [".....", ".....", "X...X", "X...X", "X...X", ".X.X.", "..X.."],
    "w": [".....", ".....", "X...X", "X...X", "X.X.X", "X.X.X", ".X.X."],
    "x": [".....", ".....", "X...X", ".X.X.", "..X..", ".X.X.", "X...X"],
    "y": [".....", ".....", "X...X", "X...X", ".XXXX", "....X", ".XXX."],
    "z": [".....", ".....", "XXXXX", "...X.", "..X..", ".X...", "XXXXX"],
}
_BOX = ["XXXXX", "X...X", "X...X", "X...X", "X...X", "X...X", "XXXXX"]


def _hex_rgb(c: str) -> tuple[int, int, int]:
    c = c.lstrip("#")
    return int(c[0:2], 16), int(c[2:4], 16), int(c[4:6], 16)


class Canvas:
    """Minimal RGB raster surface with the primitives the charts need."""

    def __init__(self, w: int = _W, h: int = _H):
        self.w, self.h = w, h
        self.px = np.full((h, w, 3), 255, dtype=np.uint8)

    def rect(self, x0, y0, x1, y1, color):
        x0, x1 = sorted((int(round(x0)), int(round(x1))))
        y0, y1 = sorted((int(round(y0)), int(round(y1))))
        x0, y0 = max(x0, 0), max(y0, 0)
        x1, y1 = min(x1, self.w - 1), min(y1, self.h - 1)
        if x1 >= x0 and y1 >= y0:
            self.px[y0 : y1 + 1, x0 : x1 + 1] = _hex_rgb(color)

    def line(self, x0, y0, x1, y1, color, width=1):
        n = int(max(abs(x1 - x0), abs(y1 - y0), 1)) * 2
        xs = np.linspace(x0, x1, n + 1)
        ys = np.linspace(y0, y1, n + 1)
        r = (width - 1) / 2.0
        rgb = _hex_rgb(color)
        for dx in np.arange(-r, r + 0.5, 1.0) if width > 1 else [0.0]:
            for dy in np.arange(-r, r + 0.5, 1.0) if width > 1 else [0.0]:
                xi = np.clip(np.round(xs + dx).astype(int), 0, self.w - 1)
                yi = np.clip(np.round(ys + dy).astype(int), 0, self.h - 1)
                self.px[yi, xi] = rgb

    def disk(self, cx, cy, r, color):
        x0, x1 = int(cx - r - 1), int(cx + r + 2)
        y0, y1 = int(cy - r - 1), int(cy + r + 2)
        yy, xx = np.mgrid[y0:y1, x0:x1]
        mask = (xx - cx) ** 2 + (yy - cy) ** 2 <= r * r
        yy, xx = yy[mask], xx[mask]
        keep = (xx >= 0) & (xx < self.w) & (yy >= 0) & (yy < self.h)
        self.px[yy[keep], xx[keep]] = _hex_rgb(color)

    def _glyphs(self, text: str, scale: int) -> np.ndarray:
        rows = 7 * scale
        cols = max(len(text), 1) * 6 * scale
        out = np.zeros((rows, cols), dtype=bool)
        for i, ch in enumerate(text):
            g = _F.get(ch, None if ch == " " else _BOX) or _F[" "]
            bit = np.array([[c == "X" for c in row] for row in g], dtype=bool)
            bit = np.kron(bit, np.ones((scale, scale), dtype=bool))
            out[:, i * 6 * scale : i * 6 * scale + 5 * scale] = bit
        return out

    def text(self, x, y, s, color="#333333", scale=1, anchor="start", rot=0):
        """Draw ``s`` with its baseline-left at (x, y) (top-left of the 5x7
        box). anchor: start|middle|end along the text direction; rot: 0 or
        90 (counter-clockwise, for y-axis labels)."""
        bit = self._glyphs(s, scale)
        if rot:
            bit = np.rot90(bit)
        h, w = bit.shape
        x, y = int(round(x)), int(round(y))
        if anchor == "middle":
            x -= w // 2 if not rot else 0
            y -= h // 2 if rot else 0
        elif anchor == "end":
            x -= w if not rot else 0
            y -= h if rot else 0
        ys, xs = np.nonzero(bit)
        xs, ys = xs + x, ys + y
        keep = (xs >= 0) & (xs < self.w) & (ys >= 0) & (ys < self.h)
        self.px[ys[keep], xs[keep]] = _hex_rgb(color)

    def write_png(self, path: str) -> str:
        raw = b"".join(
            b"\x00" + self.px[r].tobytes() for r in range(self.h)
        )

        def chunk(tag: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", self.w, self.h, 8, 2, 0, 0, 0)
        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b"")
        )
        with open(path, "wb") as f:
            f.write(png)
        return path


def _frame(c: Canvas, y_lo, y_hi, title, xlabel, ylabel):
    """Gridlines + y ticks + axes + axis labels; returns (pw, ph, Y)."""
    pw, ph = _W - _ML - _MR, _H - _MT - _MB

    def Y(y: float) -> float:
        return _MT + ph - (y - y_lo) / (y_hi - y_lo) * ph

    c.text(_ML, 12, title, scale=2)
    for t in _ticks(y_lo, y_hi):
        y = Y(t)
        c.line(_ML, y, _W - _MR, y, "#e0e0e0")
        c.text(_ML - 8, y - 3, _fmt(t), "#555555", anchor="end")
    c.line(_ML, _MT + ph, _W - _MR, _MT + ph, "#333333")
    c.line(_ML, _MT, _ML, _MT + ph, "#333333")
    c.text(_ML + pw / 2, _H - 16, xlabel, anchor="middle")
    c.text(14, _MT + ph / 2, ylabel, anchor="middle", rot=90)
    return pw, ph, Y


def line_chart(
    series: dict[str, list[tuple[float, float]]],
    path: str,
    title: str = "",
    xlabel: str = "",
    ylabel: str = "",
    y_range: tuple[float, float] | None = None,
) -> str:
    """Multi-series line chart -> PNG at ``path`` (svgplot-equivalent)."""
    pts_all = [p for pts in series.values() for p in pts]
    xs = [p[0] for p in pts_all] or [0.0, 1.0]
    ys = [p[1] for p in pts_all] or [0.0, 1.0]
    x_lo, x_hi = min(xs), max(xs)
    y_lo, y_hi = (min(ys), max(ys)) if y_range is None else y_range
    if x_hi == x_lo:
        x_hi = x_lo + 1
    if y_hi == y_lo:
        y_hi = y_lo + 1
    c = Canvas()
    pw, ph, Y = _frame(c, y_lo, y_hi, title, xlabel, ylabel)

    def X(x: float) -> float:
        return _ML + (x - x_lo) / (x_hi - x_lo) * pw

    for t in _ticks(x_lo, x_hi):
        c.line(X(t), _MT + ph, X(t), _MT + ph + 5, "#555555")
        c.text(X(t), _MT + ph + 10, _fmt(t), "#555555", anchor="middle")
    for i, (label, pts) in enumerate(series.items()):
        color = _COLORS[i % len(_COLORS)]
        pts = sorted(pts)
        for (xa, ya), (xb, yb) in zip(pts, pts[1:]):
            c.line(X(xa), Y(ya), X(xb), Y(yb), color, width=2)
        for x, y in pts:
            c.disk(X(x), Y(y), 3, color)
        ly = _MT + 10 + i * 18
        c.line(_W - _MR + 10, ly + 3, _W - _MR + 30, ly + 3, color, width=2)
        c.text(_W - _MR + 35, ly, label)
    return c.write_png(path)


def bar_chart(
    categories: list[str],
    series: dict[str, list[float]],
    path: str,
    title: str = "",
    xlabel: str = "",
    ylabel: str = "",
) -> str:
    """Grouped vertical bars -> PNG at ``path`` (svgplot-equivalent)."""
    ys = [v for vs in series.values() for v in vs] or [1.0]
    y_lo, y_hi = min(0.0, min(ys)), max(ys)
    if y_hi == y_lo:
        y_hi = y_lo + 1
    c = Canvas()
    pw, ph, Y = _frame(c, y_lo, y_hi, title, xlabel, ylabel)
    n_cat, n_ser = max(len(categories), 1), max(len(series), 1)
    group_w = pw / n_cat
    bar_w = group_w * 0.8 / n_ser
    for ci, cat in enumerate(categories):
        cx = _ML + group_w * (ci + 0.5)
        if n_cat <= 16 or ci % max(1, n_cat // 16) == 0:
            c.text(cx, _MT + ph + 10, cat, "#555555", anchor="middle")
        for si, vals in enumerate(series.values()):
            if ci >= len(vals):
                continue
            x0 = cx - group_w * 0.4 + si * bar_w
            c.rect(x0, Y(vals[ci]), x0 + bar_w, _MT + ph, _COLORS[si % len(_COLORS)])
    for i, label in enumerate(series):
        ly = _MT + 10 + i * 18
        c.rect(_W - _MR + 10, ly, _W - _MR + 22, ly + 12, _COLORS[i % len(_COLORS)])
        c.text(_W - _MR + 28, ly, label)
    return c.write_png(path)
