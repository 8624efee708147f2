"""Merge per-invocation `bench.py --scaling --rounds 1` JSON lines into the
reported scaling statistics (medians across rounds, per the CLAUDE.md rule:
never trust a single block-sequential measurement on this host).

    python tools/scaling_summary.py /tmp/scaling_r*.json
"""

from __future__ import annotations

import json
import sys


def main(paths: list[str]) -> None:
    rounds = []
    for p in paths:
        try:
            with open(p) as f:
                line = f.read().strip()
            if line:
                rounds.append(json.loads(line))
        except (OSError, json.JSONDecodeError):
            continue
    if not rounds:
        raise SystemExit("no readable scaling rounds")

    def series(key):
        out = []
        for r in rounds:
            out.extend(r.get(f"per_round_efficiency_{key}", []))
        return out

    med = lambda xs: sorted(xs)[len(xs) // 2] if xs else None
    knee = series("1x2_to_2x2")
    wide = series("1x2_to_4x2")
    best = {}
    for r in rounds:
        for rd in r.get("per_round_best_sec", []):
            for k, v in rd.items():
                best.setdefault(k, []).append(v)
    print(json.dumps({
        "rounds": len(rounds),
        "rows": rounds[0].get("rows"),
        "per_round_efficiency_1x2_to_2x2": knee,
        "median_efficiency_1x2_to_2x2": round(med(knee), 3) if knee else None,
        "per_round_efficiency_1x2_to_4x2": wide,
        "median_efficiency_1x2_to_4x2": round(med(wide), 3) if wide else None,
        "best_sec_per_config": {
            k: sorted(v) for k, v in sorted(best.items())
        },
        "pooled_best_efficiency_1x2_to_2x2": round(
            min(best["1x2"]) / (2 * min(best["2x2"])), 3
        ) if "1x2" in best and "2x2" in best else None,
        "pooled_best_efficiency_1x2_to_4x2": round(
            min(best["1x2"]) / (4 * min(best["4x2"])), 3
        ) if "1x2" in best and "4x2" in best else None,
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
