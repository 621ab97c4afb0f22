#!/usr/bin/env python3
"""Diff two bench_out.json recordings: PLAN vs KERNEL vs ENV, per query.

Four-way verdict per shared query:
  PLAN    task count or shuffle volume moved — the physical plan changed.
  KERNEL  stats byte-identical but on-CPU time (cpu_ms) moved and the
          canary held steady — same plan, different per-row compute
          (e.g. the r12 banded-levenshtein win: 24.3s -> 15.4s with
          byte-identical task/shuffle stats, which the old two-way rule
          misclassified as ENV).
  HOST    cpu_ms moved but TRACKS the recording's CPU-speed canary —
          host-level contention invisible to guest accounting
          (unaccounted steal / co-tenant IPC thrash on this microVM);
          the canary is fixed spin work sampled every ~400ms, so only
          the environment can move it.
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
        # cpu_ms is itself vulnerable to INVISIBLE host contention on a
        # guest VM (unaccounted steal charged to thread CPU time, or
        # IPC degradation from co-tenant cache/bandwidth thrash — r13
        # measured contiguous windows of 5-10x inflated cpu_ms with
        # byte-identical stats, zero task GC and ~0 guest-visible
        # external CPU). The canary — fixed spin work sampled through
        # the run — moves with that contention and with nothing else,
        # so a cpu move that TRACKS a canary move in the same direction
        # is the HOST, not the kernel.
        na, nb = a.get("canary_ms", -1), b.get("canary_ms", -1)
        if na and nb and na > 0 and nb > 0:
            import math
            lcpu = math.log(cb / max(ca, 1))
            lcan = math.log(nb / na)
            same_dir = lcpu * lcan > 0
            if same_dir and abs(lcan) > math.log(1.10) and \
                    abs(lcan) >= 0.5 * abs(lcpu):
                return "HOST", (f"cpu_ms {ca} -> {cb} tracks canary "
                                f"{na:.1f} -> {nb:.1f}ms (host contention)")
            note = f"; canary {na:.1f} -> {nb:.1f}ms (steady)"
        else:
            note = "; NOCANARY"
        return "KERNEL", f"cpu_ms {ca} -> {cb} ({dcpu:+d}ms on-CPU){note}"
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
            if ns.all or verdict in ("PLAN", "KERNEL", "HOST") or noisy:
                print(f"  {q:<28} {a['sec']:6.2f} -> {b['sec']:6.2f}  "
                      f"{verdict} ({detail})")
        summary = ", ".join(f"{k}={v}" for k, v in sorted(counts.items()))
        print(f"  [{summary}; env-only wall drift: {env_total:+.1f}s]")


if __name__ == "__main__":
    main()
