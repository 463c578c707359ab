"""Render the committed bench history into a markdown report.

The analogue of the reference's committed perf-notebook analysis
(`tokenizer_ts/perf/notebook.ipynb` cells 4-8, which boxplot cycle
times and print MB/s): reads every `BENCH_r*.json` driver artifact at
the repo root, extracts the headline + per-block details, and writes a
markdown trajectory table plus per-round block summaries.

Usage:
  python tools/perf_report.py            # prints markdown to stdout
  python tools/perf_report.py --write    # refreshes docs/perf-analysis.md
                                         # (between the AUTO markers)
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
BASELINE_MBS = 20.27  # reference notebook cell 8 ("Baseline speed")


def load_round(path: Path):
    rec = json.loads(path.read_text())
    out = {"round": int(re.search(r"r(\d+)", path.stem).group(1))}
    out["headline"] = rec.get("parsed") or {}
    tail = rec.get("tail", "")
    m = re.search(r"# detail (\{.*\})", tail)
    if m:
        try:
            out["detail"] = json.loads(m.group(1))
        except ValueError:
            out["detail"] = {}
    else:
        out["detail"] = {}
    return out


def fmt_row(cells):
    return "| " + " | ".join(str(c) for c in cells) + " |"


def build_report(rounds):
    lines = []
    lines.append(
        fmt_row(
            [
                "round",
                "headline metric",
                "MB/s",
                "x baseline (20.27 MB/s)",
                "cold MB/s",
                "decode MB/s",
                "trim MB/s",
            ]
        )
    )
    lines.append(fmt_row(["---"] * 7))
    for r in rounds:
        h = r["headline"]
        d = r["detail"]
        # round 1/2 nested shapes differ; dig for the primary block
        primary = (
            d.get("cl100k_synthetic")
            or {k: v for k, v in d.items() if isinstance(v, dict)}.get(
                "gpt2", d
            )
            or {}
        )
        cold = primary.get("e2e_cold_MBps", d.get("e2e_cold_MBps", ""))
        dec = (d.get("decode") or {}).get("decode_MBps", "")
        trim = (d.get("trim_suffix") or {}).get("trim_suffix_MBps", "")
        lines.append(
            fmt_row(
                [
                    r["round"],
                    h.get("metric", "?"),
                    h.get("value", "?"),
                    h.get("vs_baseline", "?"),
                    cold,
                    dec,
                    trim,
                ]
            )
        )
    lines.append("")
    # Per-round notable blocks.
    for r in rounds:
        d = r["detail"]
        if not d:
            continue
        lines.append(f"### round {r['round']} blocks")
        ko = (d.get("cl100k_synthetic") or {}).get("kernel_only") or d.get(
            "kernel_only"
        )
        if ko:
            buckets = {
                k: v.get("MB_per_s")
                for k, v in ko.items()
                if isinstance(v, dict) and "MB_per_s" in v
            }
            if buckets:
                lines.append(
                    "- kernel-only merge MB/s by bucket: "
                    + ", ".join(f"{k}={v}" for k, v in sorted(buckets.items()))
                )
        st = d.get("scan_threads")
        if st and "steady_points" in st:
            pts = ", ".join(
                f"{p['threads']}T={p['MBps']}" for p in st["steady_points"]
            )
            lines.append(
                f"- split-phase scan: pure={st.get('pure_scan_MBps')} MB/s;"
                f" steady {pts}"
            )
        ov = d.get("overlap_ab")
        if ov and "speedup" in ov:
            lines.append(f"- overlap A/B speedup: {ov['speedup']}")
        dev = d.get("device_e2e_forced")
        if dev:
            lines.append(
                "- forced-device e2e: "
                + (
                    f"{dev['MBps']} MB/s"
                    if "MBps" in dev
                    else f"error: {dev.get('error', '?')[:80]}"
                )
            )
        sc = d.get("scaling_virtual_cpu")
        if isinstance(sc, dict) and sc.get("points"):
            xs = [
                f"{p['n']}dev={p.get('sharding_overhead_x', '?')}x"
                for p in sc["points"]
                if "step_ms" in p
            ]
            if xs:
                lines.append("- virtual-mesh sharding overhead: " + ", ".join(xs))
            w = next(
                (p for p in sc["points"] if "wave4_fused_ms" in p), None
            )
            if w:
                lines.append(
                    f"- mesh wave fusion (4 tiles): separate"
                    f" {w['wave4_separate_ms']} ms vs fused"
                    f" {w['wave4_fused_ms']} ms"
                )
        lines.append("")
    return "\n".join(lines)


def main():
    paths = sorted(REPO.glob("BENCH_r*.json"))
    rounds = [load_round(p) for p in paths]
    report = build_report(rounds)
    if "--write" in sys.argv:
        doc = REPO / "docs" / "perf-analysis.md"
        text = doc.read_text()
        begin, end = "<!-- AUTO:BEGIN -->", "<!-- AUTO:END -->"
        head, _, rest = text.partition(begin)
        _, _, tail = rest.partition(end)
        doc.write_text(head + begin + "\n" + report + "\n" + end + tail)
        print(f"wrote {doc}")
    else:
        print(report)


if __name__ == "__main__":
    main()
