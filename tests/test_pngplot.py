"""plans.pngplot: the dependency-free PNG chart sink (S11 bitmap parity
with the reference's matplotlib PNGs, chromadb_speed_experiment.py:520-591,
chromadb_acc_experiment.py:667-756). No PNG decoder is available in-env,
so validity is checked structurally: signature, IHDR geometry, zlib
round-trip of IDAT, scanline layout, and actually-drawn (non-white,
correctly-colored) pixels."""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _decode(path):
    raw = open(path, "rb").read()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    pos, chunks = 8, {}
    while pos < len(raw):
        (ln,) = struct.unpack(">I", raw[pos : pos + 4])
        tag = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", raw[pos + 8 + ln : pos + 12 + ln])
        assert crc == zlib.crc32(tag + data) & 0xFFFFFFFF
        chunks.setdefault(tag, b"")
        chunks[tag] += data
        pos += 12 + ln
    w, h, depth, ctype, *_ = struct.unpack(">IIBBBBB", chunks[b"IHDR"])
    assert (depth, ctype) == (8, 2)  # 8-bit RGB
    flat = zlib.decompress(chunks[b"IDAT"])
    assert len(flat) == h * (1 + 3 * w)
    rows = np.frombuffer(flat, dtype=np.uint8).reshape(h, 1 + 3 * w)
    assert (rows[:, 0] == 0).all()  # filter 0 per scanline
    return rows[:, 1:].reshape(h, w, 3)


def test_line_chart_png_structure(tmp_path):
    from vectordb_acc_and_speed_exp_spark.plans.pngplot import line_chart

    p = str(tmp_path / "line.png")
    out = line_chart(
        {"series a": [(0, 1.0), (10, 3.0), (20, 2.0)],
         "series b": [(0, 2.0), (10, 1.0), (20, 4.0)]},
        p, title="Latency vs size", xlabel="size", ylabel="ms",
    )
    img = _decode(out)
    assert img.shape == (450, 800, 3)
    nonwhite = (img != 255).any(axis=2)
    assert nonwhite.sum() > 2000  # axes + grid + 2 polylines + text
    # first series is drawn in the first palette color
    from vectordb_acc_and_speed_exp_spark.plans.pngplot import _hex_rgb
    from vectordb_acc_and_speed_exp_spark.plans.svgplot import _COLORS

    c0 = np.array(_hex_rgb(_COLORS[0]))
    assert (img == c0).all(axis=2).sum() > 50


def test_bar_chart_png_structure(tmp_path):
    from vectordb_acc_and_speed_exp_spark.plans.pngplot import _hex_rgb, bar_chart
    from vectordb_acc_and_speed_exp_spark.plans.svgplot import _COLORS

    p = str(tmp_path / "bars.png")
    out = bar_chart(
        ["100", "200", "300"],
        {"recall@5": [0.7, 0.8, 0.9], "recall@10": [0.6, 0.75, 0.85]},
        p, title="recall by collection", xlabel="collection", ylabel="recall",
    )
    img = _decode(out)
    c0, c1 = np.array(_hex_rgb(_COLORS[0])), np.array(_hex_rgb(_COLORS[1]))
    # bars are solid fills: both series colors cover real area
    assert (img == c0).all(axis=2).sum() > 1000
    assert (img == c1).all(axis=2).sum() > 1000


def test_experiment_chart_sinks_emit_png_and_svg(tmp_path):
    """plot_speed_charts / plot_recall_charts write the reference's four
    PNG filenames plus SVG twins."""
    import os

    from vectordb_acc_and_speed_exp_spark.experiments import (
        plot_recall_charts,
        plot_speed_charts,
    )
    from vectordb_acc_and_speed_exp_spark.plans.bench_harness import RunStats

    results = [
        RunStats(name=f"snapshot_{n:06d}", runs_sec=[n / 1e5, n / 9e4], n_rows=n)
        for n in (100, 200, 300)
    ]
    out = str(tmp_path)
    plot_speed_charts(results, out, embed_sec=0.01)
    plot_recall_charts([(100, 0.7, 0.6), (200, 0.8, 0.75)], out)
    for name in (
        "search_speed_by_pages", "search_speed_by_collection",
        "recall_by_pages", "recall_by_collection",
    ):
        assert os.path.exists(os.path.join(out, name + ".png"))
        assert os.path.exists(os.path.join(out, name + ".svg"))
        _decode(os.path.join(out, name + ".png"))
