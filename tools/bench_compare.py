#!/usr/bin/env python3
"""Diff two bench JSONs (BENCH_rN.json / BENCH_DETAIL.json) and print
per-query movers, so phantom (box-noise) vs real regressions are triaged
in-round instead of by the judge.

Usage: tools/bench_compare.py OLD.json NEW.json [--threshold 1.5]

Accepts either the compact medians-only line or the detail line (both
carry a "queries" object of per-query median seconds). Queries present in
only one file are listed separately. A mover is |new/old| outside
[1/threshold, threshold]; sub-50 ms medians are skipped (pure jitter at
that resolution).
"""
import json
import sys


def from_text(text):
    """Extract the last {...} JSON object carrying a "queries" key from
    free-form text (the driver stores the bench's stdout tail verbatim,
    prefixed by build-tool noise)."""
    best = None
    for i, ch in enumerate(text):
        if ch != "{":
            continue
        try:
            obj, _ = json.JSONDecoder().raw_decode(text[i:])
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict) and "queries" in obj:
            best = obj
    return best


def load(path):
    with open(path) as f:
        text = f.read()
    try:
        obj = json.loads(text)
        if isinstance(obj, dict):
            if "queries" in obj:  # BENCH_DETAIL.json / raw compact line
                return obj
            if "tail" in obj:  # driver-wrapped BENCH_rN.json
                inner = from_text(obj["tail"])
                if inner:
                    return inner
    except json.JSONDecodeError:
        pass
    obj = from_text(text)  # free-form logs
    if obj:
        return obj
    raise SystemExit(f"{path}: no parseable bench line with a 'queries' key")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.5
    for i, a in enumerate(sys.argv):
        if a == "--threshold":
            thr = float(sys.argv[i + 1])
    if len(args) != 2:
        raise SystemExit(__doc__)
    old, new = load(args[0]), load(args[1])
    oq, nq = old["queries"], new["queries"]
    print(f"total: {old.get('value')} -> {new.get('value')} "
          f"(runs: {old.get('runs', '?')} -> {new.get('runs', '?')})")
    movers = []
    for k in sorted(set(oq) & set(nq)):
        a, b = oq[k], nq[k]
        if max(a, b) < 0.05:
            continue
        ratio = b / a if a > 0 else float("inf")
        if ratio > thr or ratio < 1 / thr:
            movers.append((ratio, k, a, b))
    for ratio, k, a, b in sorted(movers, key=lambda m: -abs(m[0] - 1)):
        arrow = "SLOWER" if ratio > 1 else "faster"
        print(f"  {k}: {a:.2f}s -> {b:.2f}s  ({ratio:.2f}x {arrow})")
    if not movers:
        print(f"  no movers beyond {thr}x")
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    if only_old:
        print(f"  dropped queries: {', '.join(only_old)}")
    if only_new:
        print(f"  new queries: {', '.join(only_new)}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # e.g. piped into head
        pass
