"""Reference-layout AP table rendering (vis/logperf.py vs
cubercnn/vis/logperf.py:9-117 formats)."""
import numpy as np

from omni3d_tpu.vis import logperf as L


class TestTabulate:
    def test_grid_format(self):
        out = L.tabulate([["a", 1.5], ["bb", 2.0]], ["X", "Y"], "grid")
        lines = out.splitlines()
        assert lines[0].startswith("+") and set(lines[0]) <= {"+", "-"}
        assert "=" in lines[2]                      # header separator
        assert "| a" in out and "1.5000" in out
        # every row line has the same width
        assert len({len(ln) for ln in lines}) == 1

    def test_pipe_format_and_wrapping(self):
        cats = {f"c{i}": {"AP2D": float(i), "AP3D": float(10 + i)}
                for i in range(5)}
        import io
        import contextlib
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            L.print_ap_category_histogram("DS", cats)
        out = buf.getvalue()
        # 9-column layout: 3 (category, AP2D, AP3D) groups -> 5 cats wrap
        # onto 2 data rows
        header = [ln for ln in out.splitlines() if "category" in ln][0]
        assert header.count("category") == 3
        import re
        data_rows = [ln for ln in out.splitlines() if re.search(r"\| c\d", ln)]
        assert len(data_rows) == 2

    def test_cross_dataset_prints_both_tables(self):
        import io
        import contextlib
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            L.print_cross_dataset_table(
                {"Concat/AP2D": 27.6, "Concat/AP3D": 23.3,
                 "Concat/AP3D@15": 30.8, "Concat/AP3D-near": 27.9,
                 "Concat/AP3D-chair": 99.0})
        out = buf.getvalue()
        assert "AP3D@15" in out and "30.8000" in out   # analysis columns kept
        assert "Performance on Omni3D" in out           # headline table too
        assert "99.0" not in out                        # per-category excluded

    def test_colored_plain_when_not_tty(self):
        # pytest captures stdout (not a tty) -> no ANSI escapes
        assert L.colored("x", "cyan") == "x"

    def test_per_category_from_summary(self):
        import io
        import contextlib
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            L.print_per_category_table(
                {"Concat/AP3D-chair": 31.0, "Concat/AP2D-chair": 28.0,
                 "Concat/AP3D-near": 1.0})
        out = buf.getvalue()
        assert "chair" in out
        assert "near" not in out  # analysis stat, not a category
