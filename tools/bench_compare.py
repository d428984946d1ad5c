#!/usr/bin/env python3
"""Calibrated round-over-round bench comparison.

Usage: python3 tools/bench_compare.py <BENCH_a.json> <BENCH_b.json> [threshold]

Reads two driver bench files (BENCH_r{N}.json — the driver wraps the
Bench main's JSON line under "parsed"; a raw one-line Bench output file
works too), normalizes every per-query time by that round's `calib` row
(the isolated tpch_q1 min-of-3 — the host-speed yardstick), and prints
the regressed/improved table at the given calibrated-ratio threshold
(default 1.3). Host noise moves raw seconds ~2x between rounds
(SCALING.md history); calibrated ratios are what a regression claim
should cite.

(Local dev tool only — the shipped Scala library does not depend on it.)
"""
import json
import sys


def load(path: str) -> dict:
    if not path.endswith(".json"):
        raise SystemExit(f"{path}: expected a .json file")
    with open(path) as f:
        text = f.read()
    try:
        raw = json.loads(text)
    except json.JSONDecodeError:
        # raw Bench stdout captures hold several JSON lines (per-pass
        # detail, then the driver-contract line LAST) — take the last
        # parseable line instead of demanding a single JSON document
        raw = None
        for line in reversed([l for l in text.splitlines() if l.strip()]):
            try:
                raw = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
    if raw is None:
        raise SystemExit(f"{path}: no parseable JSON (not a bench file?)")
    parsed = raw.get("parsed", raw)
    if "queries" not in parsed:
        raise SystemExit(f"{path}: no 'queries' map (not a bench file?)")
    if not parsed.get("calib"):
        raise SystemExit(f"{path}: no 'calib' row — pre-r11 bench files "
                         "cannot be calibrated; compare shapes by hand")
    return parsed


def main(a_path: str, b_path: str, threshold: float) -> int:
    a, b = load(a_path), load(b_path)
    ca, cb = a["calib"], b["calib"]
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb))
    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))
    print(f"calib: {a_path}={ca:.3f}s  {b_path}={cb:.3f}s  "
          f"(host-speed ratio {cb / ca:.2f}x)")
    print(f"shared queries: {len(shared)}  "
          f"only-in-a: {len(only_a)}  only-in-b: {len(only_b)}")
    rows = []
    for q in shared:
        na, nb = qa[q] / ca, qb[q] / cb
        rows.append((nb / na if na > 0 else float("inf"), q, qa[q], qb[q], na, nb))
    rows.sort(reverse=True)
    regressed = [r for r in rows if r[0] >= threshold]
    improved = [r for r in rows if r[0] <= 1 / threshold]
    sum_a = sum(qa[q] for q in shared)
    sum_b = sum(qb[q] for q in shared)
    print(f"shared-sum raw: {sum_a:.1f}s -> {sum_b:.1f}s   "
          f"calibrated: {sum_a / ca:.1f} -> {sum_b / cb:.1f} "
          f"({(sum_b / cb) / (sum_a / ca):.2f}x)")

    def table(title, rs):
        if not rs:
            print(f"\n{title}: none at threshold {threshold}x")
            return
        print(f"\n{title} (calibrated ratio >= {threshold}x or <= {1/threshold:.2f}x):")
        print(f"{'query':<32} {'raw_a':>7} {'raw_b':>7} {'cal_a':>7} {'cal_b':>7} {'ratio':>6}")
        for ratio, q, ra, rb, na, nb in rs:
            print(f"{q:<32} {ra:>7.2f} {rb:>7.2f} {na:>7.2f} {nb:>7.2f} {ratio:>6.2f}")

    table("REGRESSED", regressed)
    table("IMPROVED", improved)
    if only_b:
        print(f"\nnew in b: {', '.join(only_b)}")
    if only_a:
        print(f"dropped from b: {', '.join(only_a)}")
    return 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    sys.exit(main(sys.argv[1], sys.argv[2],
                  float(sys.argv[3]) if len(sys.argv) > 3 else 1.3))
