"""`make verify` — run the TPU golden sweep + benchmark and regenerate
every published table from the tool output, so the README/BASELINE numbers
can never drift from what the hardware actually measured (round-1 had
three different "published" forward numbers; this kills that class of rot).

Steps (each a subprocess so the TPU work stays in dedicated processes):
  1. python tools/golden_check.py --json results_tpu/golden_sweep.json
  2. python bench.py                -> results_tpu/bench.json
  3. rewrite README.md's BENCH_TABLE / GOLDEN_TABLE marker blocks and
     BASELINE.json's published.current block from those JSONs.

Usage: python tools/verify_publish.py [--skip-golden] [--skip-bench]
(skip flags reuse the existing results_tpu/*.json for the rewrite step).
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(ROOT, "results_tpu")
GOLDEN_JSON = os.path.join(RESULTS, "golden_sweep.json")
BENCH_JSON = os.path.join(RESULTS, "bench.json")
BASELINE_MRAYS = 31.0

# task-prefix -> pretty row name for the README golden table
_TASK_LABELS = [
    ("07-01", "07-01 legacy (reconstructed era half-lambert)"),
    ("08-01", "08-01 legacy (reconstructed era palette)"),
    ("09-01", "09-01 barycentric (AOV pass)"),
    ("09-02", "09-02 diffuse + smooth + shadows"),
    ("09-03", "09-03 reflective"),
    ("11-01", "11-01 refractive"),
    ("12-01", "12-01 textures"),
    ("13-01", "13-01 / 14-01 acceleration tree"),
    ("14-01", "13-01 / 14-01 acceleration tree"),
]


def run_golden():
    os.makedirs(RESULTS, exist_ok=True)
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "golden_check.py"),
         "--json", GOLDEN_JSON],
        check=True, cwd=ROOT,
    )


BENCH_SESSIONS = 3  # remote-relay session variance is 2-3 % — publish a band


def _median(xs):
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else 0.5 * (xs[n // 2 - 1] + xs[n // 2])


def run_bench(sessions: int = BENCH_SESSIONS):
    """Run bench.py in ``sessions`` separate processes and publish the
    MEDIAN with the min-max band.  The remote relay's session-to-session
    variance is ~2-3 % (docs/PERFORMANCE.md), so a single session's number
    can read as a regression against the driver's BENCH_r*.json record —
    the band makes the publication honest about that spread."""
    os.makedirs(RESULTS, exist_ok=True)
    runs = []
    for k in range(sessions):
        out = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            check=True, cwd=ROOT, capture_output=True, text=True,
        ).stdout
        line = [l for l in out.splitlines() if l.strip().startswith("{")][-1]
        runs.append(json.loads(line))
        print(f"session {k + 1}/{sessions}: {line}")
    bench = dict(runs[0])
    for key in ("value", "vs_baseline", "fwd_bwd_mrays",
                "fwd_bwd_vs_baseline"):
        if key in runs[0]:
            vals = [r[key] for r in runs]
            bench[key] = round(_median(vals), 3)
            bench[f"{key}_band"] = [round(min(vals), 3), round(max(vals), 3)]
    bench["sessions"] = len(runs)
    with open(BENCH_JSON, "w") as f:
        json.dump(bench, f)
        f.write("\n")
    print(json.dumps(bench))


def _replace_block(text: str, marker: str, body: str) -> str:
    pat = re.compile(
        rf"(<!-- BEGIN:{marker} -->\n).*?(<!-- END:{marker} -->)",
        re.DOTALL,
    )
    new, n = pat.subn(rf"\g<1>{body}\g<2>", text)
    if n != 1:
        raise RuntimeError(f"marker {marker} not found exactly once")
    return new


def golden_table(sweep: list) -> str:
    rows = {}
    for entry in sweep:
        label = next(
            (lab for pre, lab in _TASK_LABELS if entry["name"].startswith(pre)),
            entry["name"],
        )
        rows.setdefault(label, []).append(entry["frac"])
    seen = []
    out = ["| Task | Scenes | Pixel match (±2.5/255) |", "|---|---|---|"]
    for pre, label in _TASK_LABELS:
        if label in seen or label not in rows:
            continue
        seen.append(label)
        fracs = rows[label]
        lo, hi = min(fracs) * 100, max(fracs) * 100
        span = f"{lo:.2f} %" if abs(hi - lo) < 5e-3 else f"{lo:.2f}–{hi:.2f} %"
        out.append(f"| {label} | {len(fracs)} | {span} |")
    return "\n".join(out) + "\n"


def _band(bench: dict, key: str) -> str:
    lo, hi = bench.get(f"{key}_band", (bench[key], bench[key]))
    if hi - lo < 0.05:
        return ""
    return f", {lo:.1f}–{hi:.1f} over {bench.get('sessions', 1)} sessions"


def bench_table(bench: dict) -> str:
    fwd_mrays = bench["value"]
    fwd_ms = 1920 * 1080 / fwd_mrays / 1e3
    rows = [
        "| Metric | crt_tpu (median of sessions) | Reference CPU | Ratio |",
        "|---|---|---|---|",
        f"| Forward render | {fwd_ms:.1f} ms (**{fwd_mrays:.1f} Mrays/s**"
        f"{_band(bench, 'value')}) "
        f"| 67.0 ms (31.0 Mrays/s) | **{bench['vs_baseline']:.2f}×** |",
    ]
    if "fwd_bwd_mrays" in bench:
        fb = bench["fwd_bwd_mrays"]
        fb_ms = 1920 * 1080 / fb / 1e3
        rows.append(
            f"| Forward + backward (full gradient) | {fb_ms:.1f} ms "
            f"({fb:.1f} Mrays/s{_band(bench, 'fwd_bwd_mrays')}) "
            f"| n/a (not differentiable) "
            f"| {bench['fwd_bwd_vs_baseline']:.2f}× |"
        )
    return "\n".join(rows) + "\n"


def rewrite_published():
    with open(GOLDEN_JSON) as f:
        sweep = json.load(f)
    with open(BENCH_JSON) as f:
        bench = json.load(f)

    readme_path = os.path.join(ROOT, "README.md")
    with open(readme_path) as f:
        readme = f.read()
    readme = _replace_block(readme, "BENCH_TABLE", bench_table(bench))
    readme = _replace_block(readme, "GOLDEN_TABLE", golden_table(sweep))
    with open(readme_path, "w") as f:
        f.write(readme)
    print(f"rewrote {readme_path}")

    baseline_path = os.path.join(ROOT, "BASELINE.json")
    with open(baseline_path) as f:
        baseline = json.load(f)
    fracs = [e["frac"] for e in sweep]
    fwd_mrays = bench["value"]
    cur = {
        "hardware": "1x TPU v5e (remote relay)",
        "fwd_ms": round(1920 * 1080 / fwd_mrays / 1e3, 1),
        "fwd_mrays_per_s": fwd_mrays,  # MEDIAN over bench sessions
        "fwd_vs_cpu_baseline": bench["vs_baseline"],
        "golden_parity_min_frac": round(min(fracs), 4),
        "golden_parity_max_frac": round(max(fracs), 4),
        "bench_sessions": bench.get("sessions", 1),
        "generator": "tools/verify_publish.py (machine-generated)",
    }
    if "value_band" in bench:
        cur["fwd_mrays_band"] = bench["value_band"]
    if "fwd_bwd_mrays" in bench:
        cur["fwd_bwd_ms"] = round(1920 * 1080 / bench["fwd_bwd_mrays"] / 1e3, 1)
        cur["fwd_bwd_mrays_per_s"] = bench["fwd_bwd_mrays"]
        cur["fwd_bwd_vs_cpu_baseline"] = bench["fwd_bwd_vs_baseline"]
        if "fwd_bwd_mrays_band" in bench:
            cur["fwd_bwd_mrays_band"] = bench["fwd_bwd_mrays_band"]
    baseline.setdefault("published", {})["current"] = cur
    with open(baseline_path, "w") as f:
        json.dump(baseline, f, indent=2)
        f.write("\n")
    print(f"rewrote {baseline_path}")


def main(argv):
    if "--skip-golden" not in argv:
        run_golden()
    if "--skip-bench" not in argv:
        run_bench()
    rewrite_published()


if __name__ == "__main__":
    main(sys.argv[1:])
