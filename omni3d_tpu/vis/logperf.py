"""AP result tables (reference cubercnn/vis/logperf.py:9-117, plain text)."""
from __future__ import annotations


def format_table(rows: list[list], headers: list[str]) -> str:
    widths = [max(len(str(r[i])) for r in [headers] + rows) for i in range(len(headers))]
    def fmt(row):
        return "  ".join(str(v).ljust(w) for v, w in zip(row, widths))
    sep = "-" * (sum(widths) + 2 * (len(widths) - 1))
    return "\n".join([fmt(headers), sep] + [fmt(r) for r in rows])


def print_ap_category_table(per_cat: dict, cat_names: dict, title: str = ""):
    rows = [[cat_names.get(cid, cid), f"{ap:.2f}"] for cid, ap in sorted(per_cat.items())]
    print((title + "\n" if title else "") + format_table(rows, ["category", "AP"]))


def print_ap_analysis_table(results: dict, title: str = "Omni3D analysis"):
    keys2d = ["AP2D", "AP2D@50", "AP2D@75"]
    keys3d = ["AP3D", "AP3D@15", "AP3D@25", "AP3D@50", "AP3D-n", "AP3D-m", "AP3D-f"]
    rows = []
    for name, res in results.items():
        if not isinstance(res, dict):
            continue
        row = [name] + [f"{res.get(k, float('nan')):.2f}" for k in keys2d + keys3d]
        rows.append(row)
    print(title + "\n" + format_table(rows, ["dataset"] + keys2d + keys3d))


def print_dataset_results(results: dict):
    print_ap_analysis_table(results)


def print_cross_dataset_table(summary: dict, title: str = "Cross-dataset"):
    """Group `summarize_all`'s "<split>/<metric>" flat keys into one row per
    split (Concat / Omni3D_In / Omni3D_Out) before tabulating."""
    grouped: dict = {}
    for k, v in summary.items():
        split, _, metric = k.partition("/")
        grouped.setdefault(split, {})[metric] = v
    print_ap_analysis_table(grouped, title=title)
