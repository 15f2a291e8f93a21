"""Scored evaluation on the reference's 1000-document corpus.

Replicates /root/reference/scripts/comparison/main.go:37-168: run the
extractor (fast and extensive, UseOriginalDate=true) over every
annotated document, score exact-yyyy-MM-dd TP/FP/FN/TN, print
precision/recall/accuracy/F1 + wall time — directly comparable to
BASELINE.md (go-htmldate fast: P .882 R .925 A .823 F1 .903 @0.767s;
extensive: P .870 R .993 A .865 F1 .928 @1.682s on an i7-8550U).

Annotations are parsed from the reference's Go data files at run time
(read-only); files live under test-files/{comparison,mediacloud,mock}.
Also prints per-mode divergence counts vs the reference's own recorded
answers (the Fast/Extensive fields), i.e. engine-vs-engine parity.

Usage: python scripts/eval_corpus.py [--limit N] [--procs P]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference"
SEARCH_DIRS = ["test-files/comparison", "test-files/mediacloud", "test-files/mock"]

_ENTRY_RX = re.compile(
    r'\{\s*URL:\s*"((?:[^"\\]|\\.)*)",\s*File:\s*"((?:[^"\\]|\\.)*)",\s*'
    r'Date:\s*"((?:[^"\\]|\\.)*)",\s*Fast:\s*"((?:[^"\\]|\\.)*)",\s*'
    r'Extensive:\s*"((?:[^"\\]|\\.)*)"',
    re.S,
)


def load_entries() -> list[dict]:
    entries = []
    for fname in ("data-default.go", "data-mediacloud.go"):
        src = open(f"{REF}/scripts/comparison/{fname}").read()
        for m in _ENTRY_RX.finditer(src):
            entries.append(
                {
                    "url": m.group(1),
                    "file": m.group(2),
                    "date": m.group(3),
                    "ref_fast": m.group(4),
                    "ref_extensive": m.group(5),
                }
            )
    return entries


def find_file(name: str) -> str | None:
    for d in SEARCH_DIRS:
        p = f"{REF}/{d}/{name}"
        if os.path.exists(p):
            return p
    return None


def _init_worker() -> None:
    """Pace the cyclic collector like the Spark UDF does (gctune.py):
    the DOM's parent links make every tree cyclic, and default-threshold
    collection costs ~40% of parse time."""
    import gc

    gc.set_threshold(50_000, 10, 10)


def run_one(entry: dict) -> dict | None:
    from go_htmldate_spark import Options, from_html

    path = find_file(entry["file"])
    if path is None:
        return None
    html = open(path, encoding="utf-8", errors="replace").read()
    out = dict(entry)
    t0 = time.time()
    out["fast"] = from_html(
        html, Options(use_original_date=True, skip_extensive_search=True,
                      url=entry["url"])
    ).date
    t1 = time.time()
    out["extensive"] = from_html(
        html, Options(use_original_date=True, url=entry["url"])
    ).date
    out["t_fast"] = t1 - t0
    out["t_extensive"] = time.time() - t1
    return out


def score(results: list[dict], key: str) -> dict:
    tp = fp = fn = tn = 0
    for r in results:
        pred, gold = r[key], r["date"]
        if pred and gold:
            if pred == gold:
                tp += 1
            else:
                fp += 1
        elif pred and not gold:
            fp += 1
        elif not pred and gold:
            fn += 1
        else:
            tn += 1
    p = tp / (tp + fp) if tp + fp else 0.0
    rcl = tp / (tp + fn) if tp + fn else 0.0
    return {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "precision": round(p, 3),
        "recall": round(rcl, 3),
        "accuracy": round((tp + tn) / len(results), 3),
        "f1": round(2 * p * rcl / (p + rcl), 3) if p + rcl else 0.0,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--procs", type=int, default=8)
    args = ap.parse_args()

    entries = load_entries()
    if args.limit:
        entries = entries[: args.limit]
    t0 = time.time()
    with ProcessPoolExecutor(args.procs, initializer=_init_worker) as pool:
        results = [r for r in pool.map(run_one, entries, chunksize=16) if r]
    wall = time.time() - t0

    report = {
        "n_docs": len(results),
        "fast": score(results, "fast"),
        "extensive": score(results, "extensive"),
        "wall_sec_total": round(wall, 2),
        "sum_fast_sec": round(sum(r["t_fast"] for r in results), 3),
        "sum_extensive_sec": round(sum(r["t_extensive"] for r in results), 3),
        "vs_reference": {
            "fast_same_as_ref": sum(r["fast"] == r["ref_fast"] for r in results),
            "extensive_same_as_ref": sum(
                r["extensive"] == r["ref_extensive"] for r in results
            ),
        },
        "procs": args.procs,
    }
    print(json.dumps(report))

    div = [r for r in results if r["extensive"] != r["ref_extensive"]][:15]
    for r in div:
        print(f"  DIV ext {r['file'][:40]:42s} ref={r['ref_extensive']!r} "
              f"got={r['extensive']!r} golden={r['date']!r}", file=sys.stderr)


if __name__ == "__main__":
    main()
