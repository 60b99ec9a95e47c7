"""Generate the AUTHORITATIVE perf table from the newest BENCH_r*.json.

VERDICT r4 weak #4 / next #6: PERFORMANCE.md's header table trailed the
bench artifact three rounds in a row because it was hand-synced. This tool
renders the table FROM the newest driver artifact and injects it between
markers in PERFORMANCE.md and README.md, so the docs byte-match the
measurement by construction.

Usage:
  python tools/perf_table.py            # print the table
  python tools/perf_table.py --write    # inject into PERFORMANCE.md + README.md
  python tools/perf_table.py --check    # exit 1 if any injected block is stale

tests/test_misc_components.py runs --check; run --write at the start of each
round once the driver's BENCH_r{N}.json lands.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

START_RE = re.compile(r"<!-- PERF_TABLE_START[^>]*-->")
END_MARK = "<!-- PERF_TABLE_END -->"

# (row label, metric name, per-unit field)
ROWS = [
    ("inference 2048 default (device FPS)", "inference_pairs_per_sec_n2048_default", "ms_per_pair"),
    ("inference 2048 production", "inference_pairs_per_sec_n2048_production", "ms_per_pair"),
    ("inference 16384 production", "inference_pairs_per_sec_n16384_production", "ms_per_pair"),
    ("inference 32768 production (headline)", "inference_pairs_per_sec_n32768_production", "ms_per_pair"),
    ("inference 2048 4DMatch (factor=2)", "inference_pairs_per_sec_n2048_4dmatch", "ms_per_pair"),
    ("inference 2048 lax.map B=16", "inference_pairs_per_sec_n2048_map16", "ms_per_pair"),
    ("inference 512 packed B=16", "inference_pairs_per_sec_n512_packed16", "ms_per_pair"),
    ("sustained serving 512 (device prep)", "sustained_serving_pairs_per_sec_512_deviceprep", "ms_per_pair"),
    ("sustained serving 512 (host prep)", "sustained_serving_pairs_per_sec_512_hostprep", "ms_per_pair"),
    ("sustained tester 2048", "sustained_tester_pairs_per_sec_n2048", "ms_per_pair"),
    ("sustained tester 2048 (host prep)", "sustained_tester_pairs_per_sec_n2048_hostprep", "ms_per_pair"),
    ("sustained tester 2048 (c2f dumps)", "sustained_tester_pairs_per_sec_n2048_c2f", "ms_per_pair"),
    ("train step 2048", "train_steps_per_sec_n2048", "ms_per_step"),
    ("train step 32768", "train_steps_per_sec_n32768", "ms_per_step"),
    ("train step 32768 bf16", "train_steps_per_sec_n32768_bf16", "ms_per_step"),
    ("offline RANSAC 50k hyp / 5k corr", "offline_ransac_pairs_per_sec_50k_hyp_5k_corr", "ms_per_pair"),
]


def newest_artifact() -> str:
    files = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    if not files:
        raise SystemExit("no BENCH_r*.json artifacts found")
    return files[-1]


def parse_metrics(path: str) -> dict:
    """Parse the JSON metric lines out of a driver BENCH artifact.

    The artifact's `tail` holds the last chunk of bench.py stdout and may
    START mid-line — only fully-formed JSON lines are taken."""
    with open(path) as f:
        doc = json.load(f)
    metrics = {}
    for line in doc.get("tail", "").splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "metric" in obj:
            metrics[obj["metric"]] = obj
    return metrics


def render(path: str) -> str:
    metrics = parse_metrics(path)
    name = os.path.basename(path)
    lines = [
        f"<!-- PERF_TABLE_START (generated: `python tools/perf_table.py --write`, source {name} — do not hand-edit) -->",
        f"Measured on one TPU v5e chip by the driver's end-of-round `bench.py` run ({name}).",
        "Production levers = host/device pyramid + approx kNN. Sustained lines include",
        "host prep + dump IO on this single-core dev host.",
        "",
        "| Metric | ms/pair (ms/step) | pairs/s (steps/s) |",
        "|---|---|---|",
    ]
    for label, metric, unit_field in ROWS:
        m = metrics.get(metric)
        if m is None or not m.get("value"):
            err = (m or {}).get("error", "not in artifact tail")
            lines.append(f"| {label} | — | — ({err[:40]}) |")
            continue
        per = m.get(unit_field)
        extras = ""
        if "device_ms_per_pair" in m:
            extras = (f" (device {m['device_ms_per_pair']:.1f}, roofline util "
                      f"{m.get('roofline_utilization', 0):.3f})")
        kind = {
            "measured_cpu_1core": "measured 1-core-CPU ref",
            "assumed_gpu": "assumed GPU ref",
        }.get(m.get("baseline_kind"), "assumed ref")
        vsb = f" ({m['vs_baseline']}x {kind})" if m.get("vs_baseline") else ""
        lines.append(f"| {label} | {per} | {m['value']}{extras}{vsb} |")
    lines.append(END_MARK)
    return "\n".join(lines)


def inject(doc_path: str, block: str) -> bool:
    """Replace the marker-delimited block in `doc_path`. Returns True if the
    file changed."""
    with open(doc_path) as f:
        text = f.read()
    m = START_RE.search(text)
    if not m:
        raise SystemExit(f"{doc_path}: PERF_TABLE_START marker not found")
    end = text.index(END_MARK, m.start())
    new = text[: m.start()] + block + text[end + len(END_MARK):]
    changed = new != text
    if changed:
        with open(doc_path, "w") as f:
            f.write(new)
    return changed


def check(doc_path: str, block: str) -> bool:
    with open(doc_path) as f:
        text = f.read()
    m = START_RE.search(text)
    if not m:
        print(f"STALE: {doc_path} has no PERF_TABLE_START marker")
        return False
    end = text.index(END_MARK, m.start())
    current = text[m.start(): end + len(END_MARK)]
    if current != block:
        print(f"STALE: {doc_path} perf table does not match {newest_artifact()}"
              " — run `python tools/perf_table.py --write`")
        return False
    return True


DOCS = [os.path.join(REPO, "PERFORMANCE.md"), os.path.join(REPO, "README.md")]


def main():
    block = render(newest_artifact())
    if "--write" in sys.argv:
        for doc in DOCS:
            changed = inject(doc, block)
            print(f"{'updated' if changed else 'unchanged'}: {doc}")
    elif "--check" in sys.argv:
        ok = all(check(doc, block) for doc in DOCS)
        sys.exit(0 if ok else 1)
    else:
        print(block)


if __name__ == "__main__":
    main()
