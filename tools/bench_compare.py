#!/usr/bin/env python3
"""Diff two bench_out.json recordings: PLAN vs KERNEL vs ENV, per query.

Three-way verdict per shared query:
  PLAN    task count or shuffle volume moved — the physical plan changed.
  KERNEL  stats byte-identical but on-CPU time (cpu_ms) moved — same plan,
          different per-row compute (e.g. the r12 banded-levenshtein win:
          24.3s -> 15.4s with byte-identical task/shuffle stats, which the
          old two-way rule misclassified as ENV).
  ENV     stats AND cpu identical but wall moved — CPU steal, page cache,
          GC aging; external to the code under test.

cpu_ms is executorCpuTime (on-CPU ns summed over tasks): external load
inflates wall-clock and executorRunTime but not on-CPU nanoseconds, so it
survives the box's documented steal spikes. Recordings from before the
metric (r12 and earlier) lack cpu_ms; those degrade to the two-way verdict
with a NOCPU marker.

Usage: python3 tools/bench_compare.py OLD.json NEW.json [--section sf10]
(both `--section sf10` and `--section=sf10` are accepted; repeatable)
"""
import argparse
import json

# A cpu delta is "moved" when it is both relatively (>10%) and absolutely
# (>250ms) significant — listener-attribution jitter and GC accounting sit
# well under both bounds on stats-identical reruns.
CPU_REL = 0.10
CPU_ABS_MS = 250


def load(path):
    with open(path) as f:
        return json.load(f)


def stats_of(rec, section):
    if section == "sf0.1":
        return rec.get("stats", {})
    return rec.get(section, {}).get("stats", {})


def classify(a, b, keys):
    """Return (verdict, detail) for one query's old/new stat rows."""
    changed = {k: (a[k], b[k]) for k in keys if a.get(k) != b.get(k)}
    if changed:
        desc = ", ".join(f"{k} {v[0]} -> {v[1]}" for k, v in changed.items())
        return "PLAN", desc
    ca, cb = a.get("cpu_ms"), b.get("cpu_ms")
    if ca is None or cb is None:
        return "ENV?", "stats byte-identical; NOCPU (old recording)"
    dcpu = cb - ca
    if abs(dcpu) > CPU_ABS_MS and abs(dcpu) > CPU_REL * max(ca, 1):
        return "KERNEL", f"cpu_ms {ca} -> {cb} ({dcpu:+d}ms on-CPU)"
    return "ENV", f"stats and cpu_ms identical (cpu {ca} -> {cb})"


def main():
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("old", help="baseline bench_out.json recording")
    parser.add_argument("new", help="candidate bench_out.json recording")
    parser.add_argument("--section", action="append",
                        choices=["sf0.1", "sf1", "sf10"],
                        help="limit to one bench section (repeatable; "
                             "default: all three)")
    parser.add_argument("--all", action="store_true",
                        help="print every shared query, not just the movers")
    ns = parser.parse_args()  # unrecognised flags error out here
    sections = ns.section or ["sf0.1", "sf1", "sf10"]
    old, new = load(ns.old), load(ns.new)
    keys = ("tasks", "shuffle_read_bytes", "shuffle_write_bytes")
    for section in sections:
        so, sn = stats_of(old, section), stats_of(new, section)
        shared = sorted(set(so) & set(sn))
        if not shared:
            continue
        print(f"== {section} ({len(shared)} shared queries; "
              f"{len(set(sn) - set(so))} added, {len(set(so) - set(sn))} removed)")
        env_total = 0.0
        counts = {}
        for q in shared:
            a, b = so[q], sn[q]
            dt = b["sec"] - a["sec"]
            verdict, detail = classify(a, b, keys)
            counts[verdict] = counts.get(verdict, 0) + 1
            if verdict.startswith("ENV"):
                env_total += dt
            noisy = abs(dt) >= 0.5
            if ns.all or verdict in ("PLAN", "KERNEL") or noisy:
                print(f"  {q:<28} {a['sec']:6.2f} -> {b['sec']:6.2f}  "
                      f"{verdict} ({detail})")
        summary = ", ".join(f"{k}={v}" for k, v in sorted(counts.items()))
        print(f"  [{summary}; env-only wall drift: {env_total:+.1f}s]")


if __name__ == "__main__":
    main()
