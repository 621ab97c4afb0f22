#!/usr/bin/env python3
"""Diff two bench_out.json recordings: PLAN vs KERNEL vs HOST vs ENV.

Verdicts per shared query:
  PLAN    task count or shuffle volume moved beyond jitter tolerance —
          the physical plan changed. Tolerance exists because the r13
          same-head A/B pair (bench_ab/) proved AQE coalescing and
          map-output compression are timing-sensitive: identical code
          produced tasks 118 -> 119 and shuffle bytes +-1.5-4% under
          load. Real plan changes move these stats far beyond that
          (e.g. r12's 707 -> 241 tasks).
  KERNEL  stats within jitter, on-CPU time (cpu_ms) moved, and BOTH
          recordings certify clean on BOTH contention signals — the
          section's guest-visible external CPU (< 5% of capacity) and
          the query window's canary p90 (at the box's uncontended
          speed). Same plan, different per-row compute (e.g. the r12
          banded-levenshtein win: 24.3s -> 15.4s, stats identical).
  HOST    cpu_ms moved but a contention signal fired: external CPU
          visible in the section, a window's canary p90 inflated, or
          the canary median tracking the cpu move. The r13 A/B
          calibration pair (bench_ab/) motivated needing BOTH gates:
          visible spinners inflated cpu_ms 4x via SMT sibling pressure
          while the canary's own core kept a free sibling (external-CPU
          gate catches it); conversely the "idle" pass took 5-10x cpu
          inflation with ~0 external CPU (canary p90 catches it —
          bursts move the window p90 long before the median).
  SELF    cpu_ms moved and the canary window is dirty, but per-query
          external CPU is ~0 AND the query's own on-CPU parallelism
          exceeds 15 cores on every dirty side — the query saturates
          the box and queues the canary thread itself (r14 finding:
          full-width queries can never certify canary-clean in-suite).
          Steal cannot fake this signature: stolen cores depress on-CPU
          width, they don't raise it.
  ENV     stats and cpu within noise but wall moved — CPU steal on
          off-CPU time, page cache, GC aging; external to the code.

cpu_ms is executorCpuTime (on-CPU ns summed over tasks). Recordings from
before the metric (r12-) degrade to the two-way verdict with a NOCPU
marker; recordings before canary_hi_ms degrade KERNEL to KERNEL? (the
window cleanliness cannot be certified).

Usage: python3 tools/bench_compare.py OLD.json NEW.json [--section sf10]
(both `--section sf10` and `--section=sf10` are accepted; repeatable)
"""
import argparse
import json
import math

# A cpu delta is "moved" when it is both relatively (>10%) and absolutely
# (>250ms) significant — listener-attribution jitter and GC accounting sit
# well under both bounds on stats-identical reruns.
CPU_REL = 0.10
CPU_ABS_MS = 250
# Stat-jitter tolerance (calibrated on the r13 same-head A/B pair): AQE
# re-coalesces within +-2 tasks / ~1%, compressed shuffle bytes wander a
# few percent with map-task ordering. A 0 -> nonzero shuffle is always
# PLAN (a new exchange appeared, however small).
TASK_ABS = 2
TASK_REL = 0.01
BYTES_REL = 0.05
BYTES_ABS = 262144
# A query window is "clean" when its canary p90 is within this factor of
# the box's uncontended speed (the smaller run-wide p10 of the two
# recordings). 1.35 clears timer/scheduler jitter; contention bursts park
# the p90 at 2-8x p10 (r13 A/B: loaded-run windows sat at 20-70ms vs a
# 9.6ms p10).
CLEAN_FACTOR = 1.35


def load(path):
    with open(path) as f:
        return json.load(f)


def stats_of(rec, section):
    if section == "sf0.1":
        return rec.get("stats", {})
    return rec.get(section, {}).get("stats", {})


def p10_of(rec):
    return rec.get("env", {}).get("canary_p10_ms", -1.0)


def external_frac_of(rec, section):
    """Guest-VISIBLE external CPU burned during the section that produced
    this section's stats, as a fraction of machine capacity (the sf0.1
    stats block comes from the cold pass = section p1)."""
    key = "p1" if section == "sf0.1" else section
    s = rec.get("env", {}).get("sections", {}).get(key)
    return s.get("external_frac", -1.0) if s else -1.0


def plan_moved(a, b):
    """(verdict_str_or_None, jitter_notes) for the task/shuffle stats."""
    moved, jitter = [], []
    ta, tb = a.get("tasks"), b.get("tasks")
    if ta is not None and tb is not None and ta != tb:
        if abs(tb - ta) > max(TASK_ABS, TASK_REL * max(ta, tb)):
            moved.append(f"tasks {ta} -> {tb}")
        else:
            jitter.append(f"tasks {ta} -> {tb}")
    for k in ("shuffle_read_bytes", "shuffle_write_bytes"):
        ba, bb = a.get(k), b.get(k)
        if ba is None or bb is None or ba == bb:
            continue
        zero_flip = (ba == 0) != (bb == 0) and max(ba, bb) > 65536
        big = (abs(bb - ba) > BYTES_REL * max(ba, bb)
               and abs(bb - ba) > BYTES_ABS)
        if zero_flip or big:
            moved.append(f"{k} {ba} -> {bb}")
        else:
            jitter.append(f"{k} {ba:+d}".replace("+", " ") + f" -> {bb}")
    return moved, jitter


def classify(a, b, clean_ceiling, ext_old, ext_new):
    """Return (verdict, detail) for one query's old/new stat rows."""
    moved, jitter = plan_moved(a, b)
    if moved:
        return "PLAN", ", ".join(moved)
    jnote = ("; stat jitter (AQE/compression): " + ", ".join(jitter)
             if jitter else "")
    ca, cb = a.get("cpu_ms"), b.get("cpu_ms")
    if ca is None or cb is None:
        return "ENV?", "stats within jitter; NOCPU (old recording)" + jnote
    dcpu = cb - ca
    if abs(dcpu) > CPU_ABS_MS and abs(dcpu) > CPU_REL * max(ca, 1):
        # cpu_ms is itself vulnerable to host contention. Two INDEPENDENT
        # contention signals decide whether the move is code or box, and
        # KERNEL demands both clean in BOTH recordings:
        #   1. guest-VISIBLE external CPU over the section (/proc/stat
        #      busy incl. steal, minus this JVM): co-located processes.
        #      The r13 A/B pair proved the canary alone cannot be the
        #      gate — 16 visible spinners inflated cpu_ms 4x via SMT
        #      sibling pressure while the canary's OWN core kept a free
        #      sibling and its window p90 stayed at uncontended speed.
        #   2. the canary window p90 (canary_hi_ms): contention the guest
        #      CANNOT see (unaccounted steal, co-tenant IPC thrash).
        #      Burst-sensitive: the same A/B pair showed 3-7x cpu
        #      inflation whose window MEDIAN stayed flat while the p90
        #      sat 2-8x high.
        # Plus median tracking: a canary-median move in the same
        # direction as the cpu move is the box slowing down wholesale.
        na, nb = a.get("canary_ms", -1), b.get("canary_ms", -1)
        ha, hb = a.get("canary_hi_ms", -1), b.get("canary_hi_ms", -1)
        cpu = f"cpu_ms {ca} -> {cb} ({dcpu:+d}ms on-CPU)"
        # r14+: recordings carry a per-QUERY external fraction — prefer it
        # over the section-wide one (a section mixes one stolen query with
        # nine quiet ones in both directions)
        qa_ext, qb_ext = a.get("external_frac", -1.0), b.get("external_frac", -1.0)
        per_query = qa_ext >= 0 and qb_ext >= 0
        eo, en = (qa_ext, qb_ext) if per_query else (ext_old, ext_new)
        grain = "query" if per_query else "section"
        ext_dirty = [s for s, x in (("old", eo), ("new", en)) if x > 0.05]
        if ext_dirty:
            return "HOST", (
                f"{cpu}; external CPU visible in {grain} "
                f"({'/'.join(ext_dirty)}): {eo:.0%}/{en:.0%} "
                f"of machine capacity burned by other processes")
        if na and nb and na > 0 and nb > 0:
            lcpu = math.log(cb / max(ca, 1))
            lcan = math.log(nb / na)
            if (lcpu * lcan > 0 and abs(lcan) > math.log(1.10)
                    and abs(lcan) >= 0.5 * abs(lcpu)):
                return "HOST", (f"{cpu} tracks canary median "
                                f"{na:.1f} -> {nb:.1f}ms")
            if ha > 0 and hb > 0 and clean_ceiling > 0:
                dirty = [s for s, h in (("old", ha), ("new", hb))
                         if h > clean_ceiling]
                if dirty:
                    # A dirty canary with ~0 per-query external CPU is
                    # either invisible steal (proven by the r13
                    # calibration) or the query's OWN full-width
                    # saturation queuing the canary thread (proven by the
                    # r14 top-10 certification: >15-core queries can never
                    # certify clean in-suite). On-CPU parallelism
                    # (cpu_ms / wall) separates them: self-saturation IS
                    # high own-work width, while steal steals the cores —
                    # on-CPU width stays low.
                    widths = {
                        "old": ca / max(a.get("sec", 0.0) * 1000.0, 1.0),
                        "new": cb / max(b.get("sec", 0.0) * 1000.0, 1.0)}
                    if (per_query and max(eo, en) <= 0.05
                            and all(widths[s] > 15 for s in dirty)):
                        return "SELF", (
                            f"{cpu}; window dirty ({'/'.join(dirty)}: "
                            f"canary p90 {ha:.1f}/{hb:.1f}ms vs ceiling "
                            f"{clean_ceiling:.1f}ms) but per-query "
                            f"external {eo:.1%}/{en:.1%} and on-CPU width "
                            f"{widths['old']:.0f}/{widths['new']:.0f} "
                            "cores — the query's own saturation queues "
                            "the canary, not the host")
                    self_note = (
                        f" (per-query external {eo:.1%}/{en:.1%} — "
                        "invisible steal or the query's own saturation)"
                        if per_query and max(eo, en) <= 0.05 else "")
                    return "HOST", (
                        f"{cpu}; contended window ({'/'.join(dirty)}): "
                        f"canary p90 {ha:.1f}/{hb:.1f}ms vs clean "
                        f"ceiling {clean_ceiling:.1f}ms{self_note}")
                return "KERNEL", (f"{cpu}; both windows clean (canary p90 "
                                  f"{ha:.1f}/{hb:.1f}ms <= "
                                  f"{clean_ceiling:.1f}ms){jnote}")
            return "KERNEL?", (f"{cpu}; NOCANARYHI (old recording — window "
                               f"cleanliness uncertifiable)" + jnote)
        return "KERNEL?", f"{cpu}; NOCANARY" + jnote
    return "ENV", f"stats and cpu_ms within noise (cpu {ca} -> {cb})" + jnote


def main():
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("old", help="baseline bench_out.json recording")
    parser.add_argument("new", help="candidate bench_out.json recording")
    parser.add_argument("--section", action="append",
                        choices=["sf0.1", "sf1", "sf10", "sf100"],
                        help="limit to one bench section (repeatable; "
                             "default: sf0.1/sf1/sf10)")
    parser.add_argument("--all", action="store_true",
                        help="print every shared query, not just the movers")
    ns = parser.parse_args()  # unrecognised flags error out here
    sections = ns.section or ["sf0.1", "sf1", "sf10"]
    old, new = load(ns.old), load(ns.new)
    p10s = [p for p in (p10_of(old), p10_of(new)) if p and p > 0]
    clean_ceiling = CLEAN_FACTOR * min(p10s) if p10s else -1.0
    for section in sections:
        so, sn = stats_of(old, section), stats_of(new, section)
        shared = sorted(set(so) & set(sn))
        if not shared:
            continue
        print(f"== {section} ({len(shared)} shared queries; "
              f"{len(set(sn) - set(so))} added, {len(set(so) - set(sn))} removed)")
        env_total = 0.0
        counts = {}
        ext_old = external_frac_of(old, section)
        ext_new = external_frac_of(new, section)
        for q in shared:
            a, b = so[q], sn[q]
            dt = b["sec"] - a["sec"]
            verdict, detail = classify(a, b, clean_ceiling, ext_old, ext_new)
            # Bench retries contaminated-canary queries and keeps the
            # cleanest attempt; a retried value is slightly warm (page
            # cache / JIT), so surface it next to the verdict.
            ra, rb = a.get("attempts", 1), b.get("attempts", 1)
            if ra > 1 or rb > 1:
                detail += f"; retried (attempts {ra}/{rb}, cleanest kept)"
            counts[verdict] = counts.get(verdict, 0) + 1
            if verdict.startswith("ENV"):
                env_total += dt
            noisy = abs(dt) >= 0.5
            if ns.all or verdict.rstrip("?") in (
                    "PLAN", "KERNEL", "HOST", "SELF") or noisy:
                print(f"  {q:<28} {a['sec']:6.2f} -> {b['sec']:6.2f}  "
                      f"{verdict} ({detail})")
        summary = ", ".join(f"{k}={v}" for k, v in sorted(counts.items()))
        print(f"  [{summary}; env-only wall drift: {env_total:+.1f}s]")


if __name__ == "__main__":
    main()
