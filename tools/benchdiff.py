#!/usr/bin/env python3
"""Compare two graft.Bench outputs and flag per-key movers.

Usage: python3 tools/benchdiff.py OLD.json NEW.json [ratio_threshold]

Each input is the two-line Bench output (or just its first line): the
line whose JSON has "detail":"per_query" carries the per-key seconds.
The driver's recorded BENCH_r{N}.json (one object with a truncated
"tail" of stdout) is also accepted: per-key pairs are recovered from
the tail fragment and the side is marked PARTIAL, which disables the
dropped-key check (a key absent from a truncated record proves
nothing). Prints keys whose NEW/OLD ratio exceeds the threshold
(default 1.5) and keys present on only one side, so a round-over-round
regression or an accidentally dropped key is one command away instead
of a by-eye diff of 260+ numbers.

Exit code: 0 if nothing flagged, 1 otherwise (usable as a CI gate).
"""
import json
import re
import sys


def load(path):
    tail = None
    last = None
    with open(path) as f:
        text = f.read()
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d.get("detail") == "per_query":
            # since r14 Bench emits the pair after EVERY key (kill
            # survivability); the LAST complete per_query line carries
            # the full merged min-of-passes map
            last = d
        if "tail" in d:
            tail = d["tail"]
    if last is not None:
        return last["queries"], last.get("errors", {}), False
    if tail is None:
        # driver records may be pretty-printed (multi-line object)
        try:
            d = json.loads(text)
            if isinstance(d, dict):
                if d.get("detail") == "per_query":
                    return d["queries"], d.get("errors", {}), False
                tail = d.get("tail")
        except json.JSONDecodeError:
            pass
    if tail is not None:
        qs = {k: float(v)
              for k, v in re.findall(r'"([a-z]\d+_\w+)":([0-9.]+)', tail)}
        # recover the errors channel from the fragment too: a truncated
        # record that still shows failed keys must not pass the gate as
        # if they had benched clean (the r5-incident class this channel
        # exists to surface)
        errs = {}
        m = re.search(r'"errors":\{(.*?)\}', tail)
        if m:
            errs = {k: v for k, v in
                    re.findall(r'"([a-z]\d+_\w+)":"((?:[^"\\]|\\.)*)"',
                               m.group(1))}
        if qs or errs:
            return qs, errs, True
    raise SystemExit(f"{path}: no per_query line found")


def main():
    old, old_errs, old_partial = load(sys.argv[1])
    new, new_errs, new_partial = load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    flagged = False
    if old_partial or new_partial:
        sides = [s for s, p in (("OLD", old_partial), ("NEW", new_partial))
                 if p]
        print(f"note: {'/'.join(sides)} recovered from a truncated driver "
              f"record — totals and key presence are partial")
    # a key in `errors` FAILED during the bench run — that is always a
    # flag, and louder than any timing mover
    if new_errs:
        flagged = True
        for k in sorted(new_errs):
            print(f"ERROR {k}: {new_errs[k]}")
    fixed = sorted(set(old_errs) - set(new_errs))
    if fixed:
        print(f"errors fixed ({len(fixed)}): {', '.join(fixed)}")
    # a key that errored on one side still RAN there — reporting it as
    # dropped/new would misstate suite membership on top of the ERROR line
    only_old = sorted(set(old) - set(new) - set(new_errs))
    only_new = sorted(set(new) - set(old) - set(old_errs))
    if only_old and not new_partial:
        flagged = True
        print(f"dropped keys ({len(only_old)}): {', '.join(only_old)}")
    if only_new and not old_partial:
        print(f"new keys ({len(only_new)}): {', '.join(only_new)}")
    movers = []
    for k in sorted(set(old) & set(new)):
        o, n = old[k], new[k]
        # sub-100ms numbers are scheduling noise at local[32]; skip
        if o < 0.1 and n < 0.1:
            continue
        ratio = n / o if o > 0 else float("inf")
        # tolerance rationale (r12 verdict item 7): sub-second keys drift
        # 2-3x between sessions from machine weather alone (BASELINE.md's
        # round-9/12 notes; d2 tripped the 2x wire at r12 with UNTOUCHED
        # code), so a ratio alone is not evidence there — require a
        # half-second of absolute movement too before flagging. Keys at
        # >= 1s keep the pure ratio gate (so a caller-lowered threshold
        # still catches e.g. a 20% regression on a multi-second key).
        # EXCEPT at extreme ratios: a 0.06s -> 0.54s key is a 9x
        # regression that the absolute floor would swallow entirely —
        # so the pure-ratio gate returns at max(thresh, 4.0), but paired
        # with a SMALL absolute minimum (0.1s): at the tens-of-
        # milliseconds scale weather DOES multiply a key 4x on pure
        # jitter (0.02s -> 0.09s is 4.5x inside 70ms of movement — r14
        # advice), so millisecond keys cannot trip the escape.
        if ratio >= thresh and (o >= 1.0 or (n - o) >= 0.5
                                or (ratio >= max(thresh, 4.0)
                                    and (n - o) >= 0.1)):
            movers.append((ratio, k, o, n))
    for ratio, k, o, n in sorted(movers, reverse=True):
        flagged = True
        print(f"{k:32s} {o:7.2f}s -> {n:7.2f}s  ({ratio:.1f}x)")
    tot_o = sum(old.values())
    tot_n = sum(new.values())
    ratio = f"{tot_n / tot_o:.2f}x" if tot_o > 0 else "n/a"
    print(f"total: {tot_o:.1f}s -> {tot_n:.1f}s "
          f"({ratio}, {len(old)} -> {len(new)} keys)")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
