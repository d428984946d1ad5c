#!/usr/bin/env python3
"""Calibrated round-over-round bench comparison.

Usage: python3 tools/bench_compare.py <BENCH_a.json> <BENCH_b.json> [threshold]
       python3 tools/bench_compare.py --scale <BENCH.json> [min_secs]

--scale mode: scale-ratio distribution hygiene. The driver's
`ratio_median` (per-query sf0.1/sf0.01 wall ratio) drifts DOWN as cheap
fixed-overhead gates enter the query set (a 0.8s/0.65s gate contributes
a ~1.2 ratio that says nothing about data scaling), so cross-round
median comparisons need a stable basis. This mode reports the ratio
distribution twice — all queries, and excluding queries whose main-SF
time is under `min_secs` (default 1.0s, the overhead-dominated band) —
plus the quartiles and the excluded list. Needs a bench capture that
still has the full detail line (local runs; the driver's trailing-2000-
char capture usually truncates the per-query ratio map).

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


def load_detail(path: str) -> dict:
    """Parse the bench DETAIL line (the one carrying per-query `ratio`
    and `queries2` maps) out of a full bench capture; falls back to any
    JSON line that has a `ratio` map."""
    with open(path) as f:
        text = f.read()
    best = None
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            raw = json.loads(line)
        except json.JSONDecodeError:
            continue
        parsed = raw.get("parsed", raw)
        for cand in (parsed, raw):
            if isinstance(cand, dict) and "ratio" in cand:
                best = cand if best is None else best
    if best is None:
        raise SystemExit(f"{path}: no line with a per-query 'ratio' map — "
                         "driver-truncated capture? re-run Bench locally")
    return best


def quartiles(xs):
    xs = sorted(xs)
    if not xs:
        return (0.0, 0.0, 0.0)
    # the Bench main's median convention: sorted[n/2]
    return (xs[len(xs) // 4], xs[len(xs) // 2], xs[(3 * len(xs)) // 4])


def scale_mode(path: str, min_secs: float) -> int:
    d = load_detail(path)
    ratio = d["ratio"]
    # main-SF per-query times live in the contract line (truncated to the
    # most expensive ~70 entries); reconstruct the rest from the detail
    # line's second-SF times: t_big = ratio * t_small by definition
    big = dict(load(path)["queries"])
    q2 = d.get("queries2", {})
    for q, r in ratio.items():
        if q not in big and q in q2:
            big[q] = q2[q] * r
    rows = [(q, r, big.get(q)) for q, r in ratio.items()]
    all_r = [r for _, r, _ in rows]
    kept = [(q, r) for q, r, b in rows if b is not None and b >= min_secs]
    cheap = [(q, r) for q, r, b in rows if b is not None and b < min_secs]
    unk = [(q, r) for q, r, b in rows if b is None]
    q1a, meda, q3a = quartiles(all_r)
    q1k, medk, q3k = quartiles([r for _, r in kept])
    print(f"scale-ratio distribution of {path} (min_secs={min_secs}):")
    print(f"  all {len(all_r)} queries:            "
          f"q1={q1a:.3f} median={meda:.3f} q3={q3a:.3f}")
    print(f"  >= {min_secs}s at main SF ({len(kept)} queries): "
          f"q1={q1k:.3f} median={medk:.3f} q3={q3k:.3f}")
    if cheap:
        worst_cheap = sorted(cheap, key=lambda t: -t[1])[:5]
        print(f"  excluded sub-{min_secs}s: {len(cheap)} queries "
              f"(their ratios say overhead, not scaling); "
              f"largest: {', '.join(f'{q}={r:.2f}' for q, r in worst_cheap)}")
    if unk:
        print(f"  {len(unk)} ratio rows missing from the main-SF query map "
              "(truncated contract line) — counted in 'all' only")
    worst = sorted(kept, key=lambda t: -t[1])[:8]
    print("  worst data-dominated ratios: "
          + ", ".join(f"{q}={r:.2f}" for q, r in worst))
    return 0


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--scale":
        sys.exit(scale_mode(sys.argv[2],
                            float(sys.argv[3]) if len(sys.argv) > 3 else 1.0))
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    sys.exit(main(sys.argv[1], sys.argv[2],
                  float(sys.argv[3]) if len(sys.argv) > 3 else 1.3))
