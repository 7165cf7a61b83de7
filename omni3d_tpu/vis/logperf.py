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
    keys3d = ["AP3D", "AP3D@15", "AP3D@25", "AP3D@50", "AP3D-near", "AP3D-med", "AP3D-far"]
    rows = []
    for name, res in results.items():
        if not isinstance(res, dict):
            continue
        row = [name] + [f"{res.get(k, float('nan')):.2f}" for k in keys2d + keys3d]
        rows.append(row)
    print(title + "\n" + format_table(rows, ["dataset"] + keys2d + keys3d))


def print_dataset_results(results: dict):
    print_ap_analysis_table(results)


# analysis-stat suffixes sharing the "AP{2,3}D-" prefix with per-category
# entries (size splits small/med/large; depth splits near/med/far) — no
# Omni3D category uses these names
STAT_SUFFIXES = frozenset({"small", "med", "large", "near", "far"})


def _is_per_category(metric: str) -> bool:
    for tag in ("AP2D-", "AP3D-"):
        if metric.startswith(tag):
            return metric[len(tag):] not in STAT_SUFFIXES
    return False


def print_cross_dataset_table(summary: dict, title: str = "Cross-dataset"):
    """Group `summarize_all`'s "<split>/<metric>" flat keys into one row per
    split (Concat / Omni3D / Omni3D_In / Omni3D_Out) before tabulating
    (reference logperf.print_ap_omni_histogram layout)."""
    grouped: dict = {}
    for k, v in summary.items():
        split, _, metric = k.partition("/")
        if _is_per_category(metric):
            continue  # per-category entries get their own table
        grouped.setdefault(split, {})[metric] = v
    print_ap_analysis_table(grouped, title=title)


def print_per_category_table(summary: dict, title: str = "<Concat> per-category"):
    """Per-category AP2D/AP3D columns from the overall re-accumulation
    (reference logperf.print_ap_category_histogram)."""
    cats: dict = {}
    for k, v in summary.items():
        split, _, metric = k.partition("/")
        if split != "Concat" or not _is_per_category(metric):
            continue
        for tag in ("AP2D-", "AP3D-"):
            if metric.startswith(tag):
                cats.setdefault(metric[len(tag):], {})[tag[:-1]] = v
    if not cats:
        return
    rows = [[n, f"{d.get('AP2D', float('nan')):.2f}",
             f"{d.get('AP3D', float('nan')):.2f}"]
            for n, d in sorted(cats.items())]
    print(title + "\n" + format_table(rows, ["category", "AP2D", "AP3D"]))
