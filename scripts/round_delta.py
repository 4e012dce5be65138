"""Round-over-round guard: diff the driver's CORRECTNESS_r{N}.json and
BENCH_r{N}.json against the previous round and append a named, query-level
delta line to ROUND_DELTAS.jsonl — so a regression is a named fact in the
repo, not something a later round has to rediscover.

Usage (from the repo root, after the driver drops a new round's files):

    python scripts/round_delta.py

Reported per round pair:
* correctness transitions per query (pass -> fail/err, err -> pass, new, gone)
* bench per-query time deltas, flagging >10% regressions on shared queries
* totals for both rounds

The line is also printed human-readably.  Idempotent: re-running for an
already-recorded round pair replaces that pair's line.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REGRESSION_PCT = 10.0


def _rounds(pattern: str) -> dict[int, str]:
    out = {}
    for path in glob.glob(os.path.join(REPO, pattern)):
        m = re.search(r"_r(\d+)\.json$", path)
        if m:
            out[int(m.group(1))] = path
    return out


def _correctness_status(entry: dict) -> str:
    if entry.get("err") == "no_oracle":
        return "rows_only"  # non-SQL-expressible op, weaker check by design
    if entry.get("err"):
        return "err"
    checks = [entry.get("rows_match"), entry.get("schema_match"), entry.get("hash_match")]
    if all(c is None for c in checks):
        return "rows_only"
    return "pass" if all(c in (True, None) for c in checks) else "fail"


def correctness_delta(prev_path: str | None, cur_path: str) -> dict:
    cur = {k: _correctness_status(v) for k, v in json.load(open(cur_path)).items()}
    prev = (
        {k: _correctness_status(v) for k, v in json.load(open(prev_path)).items()}
        if prev_path
        else {}
    )
    transitions = {
        q: f"{prev[q]} -> {cur[q]}" for q in sorted(set(prev) & set(cur)) if prev[q] != cur[q]
    }
    return {
        "n_pass": sum(1 for s in cur.values() if s == "pass"),
        "n_fail": sum(1 for s in cur.values() if s in ("fail", "err")),
        "failing": sorted(q for q, s in cur.items() if s in ("fail", "err")),
        "transitions": transitions,
        "new": sorted(set(cur) - set(prev)) if prev_path else [],
        "gone": sorted(set(prev) - set(cur)),
    }


def _load_bench(path: str, overlay_local: bool = False) -> dict:
    data = json.load(open(path))
    # the driver wraps the bench JSON line under "parsed"
    out = data["parsed"] if isinstance(data.get("parsed"), dict) else data
    # The printed line only carries the core32 per-query map (the driver's
    # tail capture is 2000 chars); bench.py persists the complete map to
    # BENCH_LOCAL.json.  Overlay that full map ONLY for the CURRENT round's
    # file (BENCH_LOCAL.json is overwritten per run, so it can never belong
    # to a previous round — and a coincidental core32 match must not hand
    # the previous round this round's numbers, zeroing every delta), and
    # only when the totals agree (same-run sanity check).
    local = os.path.join(REPO, "BENCH_LOCAL.json")
    if overlay_local and isinstance(out, dict) and os.path.exists(local):
        full = json.load(open(local))
        if full.get("core32_total") == out.get("core32_total") and len(
            full.get("queries", {})
        ) > len(out.get("queries", {})):
            out = {**out, "queries": full["queries"]}
            if "cold" in full:  # full cold map (r8+): richer than cold_s
                out["cold"] = full["cold"]
    return out


_SECTIONS = ("core32_total", "extended_total", "r3_total", "r4_total",
             "r5_total", "r6_total", "r7_total", "r8_total",
             "core32_cold_total", "sections_cold_total", "tail_total")


def bench_delta(prev_path: str | None, cur_path: str) -> dict:
    cur = _load_bench(cur_path, overlay_local=True)
    out: dict = {"total": cur.get("value")}
    for section in _SECTIONS:
        if section in cur:
            out[section] = cur[section]
    if not prev_path:
        return out
    prev = _load_bench(prev_path)
    for section in _SECTIONS:
        if section in prev:
            out[f"prev_{section}"] = prev[section]
    pq, cq = prev.get("queries", {}), cur.get("queries", {})
    # WARM deltas are judged against the machine-measured noise band
    # (bench.py r9+: p90 of core-32 replay deltas + warm-iteration
    # spreads), never below the plain 10% floor — r8 saw 15 warm
    # "regressions" of 10-32% that were machine draw argued in prose;
    # now "within band" vs "structural" is a recorded fact.  Rounds
    # benched before the band existed fall back to the 10% floor.
    noise_band = max(
        float(cur.get("noise_band_pct") or 0.0),
        float(prev.get("noise_band_pct") or 0.0),
    )
    warm_threshold = max(REGRESSION_PCT, noise_band)
    regressions = {}
    within_band = {}
    for q in sorted(set(pq) & set(cq)):
        if pq[q] <= 0:
            continue
        pct = round((cq[q] - pq[q]) / pq[q] * 100, 1)
        if pct > warm_threshold:
            regressions[q] = {"prev_s": pq[q], "cur_s": cq[q], "pct": pct}
        elif pct > REGRESSION_PCT:
            within_band[q] = {"prev_s": pq[q], "cur_s": cq[q], "pct": pct}
    # persist-heavy queries report warm-min AND cold (r8+): compare
    # cold-to-cold so a cache-measurement change can never flatter a
    # cross-round delta (the r7 prefix_filter_simjoin 9.45 -> 0.87 s lesson)
    pc, cc = prev.get("cold", prev.get("cold_s", {})), cur.get("cold", cur.get("cold_s", {}))
    cold_regressions = {}
    for q in sorted(set(pc) & set(cc)):
        if pc[q] > 0 and (cc[q] - pc[q]) / pc[q] * 100 > REGRESSION_PCT:
            cold_regressions[q] = {"prev_cold_s": pc[q], "cur_cold_s": cc[q],
                                   "pct": round((cc[q] - pc[q]) / pc[q] * 100, 1)}
    out.update({
        "prev_total": prev.get("value"),
        "warm_threshold_pct": warm_threshold,
        "warm_regressions_gt_band": regressions,
        "warm_within_noise_band": within_band,
        "cold_regressions_gt_10pct": cold_regressions,
        "new_queries": sorted(set(cq) - set(pq)),
    })
    return out


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--round", type=int, default=None,
        help="record this round's delta line instead of the latest "
             "(backfill; compares against the nearest earlier round)",
    )
    args = ap.parse_args()

    corr, bench = _rounds("CORRECTNESS_r*.json"), _rounds("BENCH_r*.json")
    if not corr and not bench:
        print("no driver round files found", file=sys.stderr)
        raise SystemExit(1)
    all_rounds = set(corr) | set(bench)
    cur_round = args.round if args.round is not None else max(all_rounds)
    if cur_round not in all_rounds:
        print(f"no driver files for round {cur_round}", file=sys.stderr)
        raise SystemExit(1)
    prev_rounds = [r for r in all_rounds if r < cur_round]
    prev_round = max(prev_rounds) if prev_rounds else None

    line = {"round": cur_round, "vs_round": prev_round}
    if cur_round in corr:
        line["correctness"] = correctness_delta(
            corr.get(prev_round) if prev_round else None, corr[cur_round]
        )
    if cur_round in bench:
        line["bench"] = bench_delta(
            bench.get(prev_round) if prev_round else None, bench[cur_round]
        )

    out_path = os.path.join(REPO, "ROUND_DELTAS.jsonl")
    # one line per round, ordered by round: replace any existing line(s)
    # for this round (idempotent re-runs, and a historical duplicate-line
    # cleanup) rather than appending a second copy
    by_round: dict[int, dict] = {}
    if os.path.exists(out_path):
        for ln in open(out_path):
            if ln.strip():
                e = json.loads(ln)
                by_round[e.get("round")] = e
    by_round[cur_round] = line
    with open(out_path, "w") as f:
        for r in sorted(by_round):
            f.write(json.dumps(by_round[r]) + "\n")
    print(json.dumps(line, indent=2))


if __name__ == "__main__":
    main()
