#!/usr/bin/env python3
"""Compare two bench artifacts with the BASELINE.md adjudication rules
applied automatically, so raw-total swings on a throttled machine never
need manual arithmetic again (VERDICT r10 #6).

Rules encoded (from BASELINE.md):
  1. per-query basis = min(cold, rerun) — the deflake pass re-times
     every >=2 s query at run end; the cold number includes whatever
     throttle window it landed in;
  2. calibration normalization — divide by the nearest calibration
     sample (by queries-completed position) for the cold time, and by
     rerun_calibration for the rerun time, BEFORE taking the min;
     calibration is a fixed CPU job, higher = slower machine;
  3. queries present in only one run are listed, not compared.

Usage:
  python3 tools/benchdiff.py OLD.json NEW.json [--top N] [--threshold R]

Accepts either the full-detail artifact (bench_out.json) or a driver
BENCH_r*.json wrapper holding the parsed line under "parsed" (falls
back to scanning "tail" for the last JSON object).
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        doc = json.load(f)
    # driver wrapper: {"parsed": {...}} or {"tail": "...{json}..."}
    if "queries" not in doc:
        if isinstance(doc.get("parsed"), dict):
            doc = doc["parsed"]
        elif "tail" in doc:
            tail = doc["tail"]
            # last complete {...} JSON object in the tail
            for start in range(len(tail)):
                if tail[start] != "{":
                    continue
                try:
                    cand = json.loads(tail[start:].splitlines()[0])
                    if "queries" in cand:
                        doc = cand
                except Exception:
                    continue
            if "queries" not in doc:
                sys.exit(f"{path}: no parseable bench line in tail")
        else:
            sys.exit(f"{path}: not a bench artifact (no queries/parsed/tail)")
    return doc


def smooth_samples(samples):
    """Drop poisoned calibration samples: a sample >= 2.5x the median of
    its neighbors is a throttle spike that landed INSIDE the fixed CPU
    job — using it as the local clock makes every nearby query look
    fast on that run (and flags the OTHER run's queries as 5-6x
    regressions, the r12 [150, 1.54s] incident)."""
    if len(samples) < 3:
        return samples
    kept = []
    for i, (pos, val) in enumerate(samples):
        neigh = [samples[j][1] for j in range(max(0, i - 2),
                                              min(len(samples), i + 3))
                 if j != i]
        neigh.sort()
        med = neigh[len(neigh) // 2]
        if med > 0 and val >= 2.5 * med:
            continue
        kept.append((pos, val))
    return kept or samples


def nearest_cal(samples, pos, fallback):
    """Calibration sample nearest to `pos` queries-completed."""
    if not samples:
        return fallback
    return min(samples, key=lambda s: abs(s[0] - pos))[1]


def normalized(doc):
    """name -> normalized basis seconds (min of cal-normalized cold and
    rerun-cal-normalized rerun)."""
    queries = doc["queries"]
    cal0 = doc.get("calibration", 1.0) or 1.0
    samples = smooth_samples(doc.get("calibration_samples") or [])
    reruns = doc.get("reruns") or {}
    rcal = doc.get("rerun_calibration", cal0) or cal0
    names = sorted(queries)  # the run order Bench uses
    out = {}
    for pos, name in enumerate(names):
        cal = nearest_cal(samples, pos, cal0)
        basis = queries[name] / cal
        if name in reruns:
            basis = min(basis, reruns[name] / rcal)
        out[name] = basis
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=15,
                    help="rows to print (largest |delta| first)")
    ap.add_argument("--threshold", type=float, default=1.3,
                    help="flag ratio beyond this as regression/improvement")
    args = ap.parse_args()
    a, b = load(args.old), load(args.new)
    # basis guard: a compact line's per-query "queries" map switched
    # meaning at r13 (cold -> min(cold, rerun)). Comparing compact
    # lines with different bases reads the basis change as a
    # performance change. Full artifacts (raw cold + rerun maps
    # present) renormalize from raws, so they are always comparable.
    def full(doc):
        return bool(doc.get("reruns"))
    if not (full(a) and full(b)):
        ba, bb = a.get("basis", "cold"), b.get("basis", "cold")
        if ba != bb:
            sys.exit(f"refusing to compare: basis fields differ "
                     f"(old={ba}, new={bb}) and at least one side lacks "
                     f"raw cold/rerun maps — compare the full "
                     f"bench_out.json artifacts instead")
    na, nb = normalized(a), normalized(b)
    common = sorted(set(na) & set(nb))
    only_a = sorted(set(na) - set(nb))
    only_b = sorted(set(nb) - set(na))
    rows = []
    for q in common:
        ratio = nb[q] / na[q] if na[q] > 0 else float("inf")
        rows.append((q, na[q], nb[q], ratio))
    rows.sort(key=lambda r: -abs(r[2] - r[1]))
    ta, tb = sum(na[q] for q in common), sum(nb[q] for q in common)
    print(f"# normalized basis = min(cold/cal, rerun/rerun_cal); "
          f"{len(common)} common queries")
    print(f"total (common): {ta:8.2f} -> {tb:8.2f}  "
          f"ratio {tb / ta if ta else float('nan'):.3f}")
    print(f"{'query':34} {'old':>8} {'new':>8} {'ratio':>7}")
    flagged = 0
    for q, va, vb, ratio in rows[: args.top]:
        mark = ""
        if ratio >= args.threshold and vb - va > 0.2:
            # a regression call needs a throttle-free second opinion on
            # the NEW side: Bench reruns every query at run end (since
            # r12), so a missing rerun sample means an old artifact
            # whose sub-2s cold time has no deflake — say so instead of
            # crying REGRESSION on unadjudicated noise
            if q not in (b.get("reruns") or {}):
                mark = "  UNADJUDICATED (no rerun sample in new run)"
            else:
                # raw second opinion: if neither the raw cold nor the
                # raw rerun moved >= 25%, the normalized swing came
                # from the calibration clock, not the query
                ra = a["queries"].get(q)
                rb = b["queries"].get(q)
                rra = (a.get("reruns") or {}).get(q)
                rrb = (b.get("reruns") or {}).get(q)
                cold_moved = ra and rb and rb / ra >= 1.25
                # a missing rerun sample on either side gives NO
                # opinion — it must not default to "moved" (that would
                # re-open the calibration-artifact false positive on
                # sub-2s queries the old run never deflaked)
                rerun_moved = (rra is not None and rrb is not None and
                               rra > 0 and rrb / rra >= 1.25)
                if cold_moved or rerun_moved:
                    mark = "  REGRESSION"
                    flagged += 1
                else:
                    mark = "  calibration artifact (raw cold+rerun flat)"
        elif ratio <= 1 / args.threshold and va - vb > 0.2:
            mark = "  improved"
        print(f"{q:34} {va:8.2f} {vb:8.2f} {ratio:7.2f}{mark}")
    if only_b:
        print(f"new-only ({len(only_b)}): {', '.join(only_b)}")
    if only_a:
        print(f"dropped ({len(only_a)}): {', '.join(only_a)}")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
