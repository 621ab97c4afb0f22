#!/usr/bin/env python3
"""Diff two bench_out.json recordings: env noise vs plan change, per query.

A timing delta with byte-identical task count and shuffle volume is
environment (GC, page cache, external load); a delta with changed stats is
a plan change and names the stat that moved. This is the analysis every
round-over-round comparison needs — byte-equal stats across 2.5x timing
swings were how the r11 G1-aging and page-cache effects were isolated.

Usage: python3 tools/bench_compare.py OLD.json NEW.json [--section sf10]
(both `--section sf10` and `--section=sf10` are accepted; repeatable)
"""
import argparse
import json


def load(path):
    with open(path) as f:
        return json.load(f)


def stats_of(rec, section):
    if section == "sf0.1":
        return rec.get("stats", {})
    return rec.get(section, {}).get("stats", {})


def main():
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("old", help="baseline bench_out.json recording")
    parser.add_argument("new", help="candidate bench_out.json recording")
    parser.add_argument("--section", action="append",
                        choices=["sf0.1", "sf1", "sf10"],
                        help="limit to one bench section (repeatable; "
                             "default: all three)")
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
