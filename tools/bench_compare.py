#!/usr/bin/env python3
"""Diff two bench_out.json recordings: env noise vs plan change, per query.

A timing delta with byte-identical task count and shuffle volume is
environment (GC, page cache, external load); a delta with changed stats is
a plan change and names the stat that moved. This is the analysis every
round-over-round comparison needs — byte-equal stats across 2.5x timing
swings were how the r11 G1-aging and page-cache effects were isolated.

Usage: python3 tools/bench_compare.py OLD.json NEW.json [--section sf10]
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def stats_of(rec, section):
    if section == "sf0.1":
        return rec.get("stats", {})
    return rec.get(section, {}).get("stats", {})


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sections = [a.split("=", 1)[1] for a in sys.argv[1:]
                if a.startswith("--section=")] or ["sf0.1", "sf1", "sf10"]
    if len(args) != 2:
        sys.exit(__doc__)
    old, new = load(args[0]), load(args[1])
    keys = ("tasks", "shuffle_read_bytes", "shuffle_write_bytes")
    for section in sections:
        so, sn = stats_of(old, section), stats_of(new, section)
        shared = sorted(set(so) & set(sn))
        if not shared:
            continue
        print(f"== {section} ({len(shared)} shared queries; "
              f"{len(set(sn) - set(so))} added, {len(set(so) - set(sn))} removed)")
        env_total = 0.0
        for q in shared:
            a, b = so[q], sn[q]
            dt = b["sec"] - a["sec"]
            changed = {k: (a[k], b[k]) for k in keys if a[k] != b[k]}
            if not changed:
                env_total += dt
                if abs(dt) >= 0.5:
                    print(f"  {q:<28} {a['sec']:6.2f} -> {b['sec']:6.2f}  "
                          f"ENV (stats byte-identical)")
            else:
                desc = ", ".join(f"{k} {v[0]} -> {v[1]}"
                                 for k, v in changed.items())
                print(f"  {q:<28} {a['sec']:6.2f} -> {b['sec']:6.2f}  "
                      f"PLAN ({desc})")
        print(f"  [env-only drift over stats-identical queries: "
              f"{env_total:+.1f}s]")


if __name__ == "__main__":
    main()
