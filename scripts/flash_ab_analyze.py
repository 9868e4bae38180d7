"""Summarize flash A/B training-quality runs (VERDICT r4 next #1).

Parses adyolo_tpu train logs (the ``NNN epoch result`` blocks) into
per-epoch val-SELD trajectories and prints a side-by-side table plus the
best-so-far summary for each run.  Pure text processing — safe to run on
the 1-CPU host while the chip trains.

Usage: python scripts/flash_ab_analyze.py LOG [LOG...]
"""
from __future__ import annotations

import os
import re
import sys


def parse(path):
    """Returns [(epoch, train_loss, val_loss, val_seld, conf_thresh)]."""
    rows = []
    epoch = None
    thresh = None
    tloss = vloss = None
    with open(path) as f:
        for ln in f:
            m = re.match(r"(\d{3}) epoch result\.\.\. \(conf_thresh: ([0-9.]+)\)", ln)
            if m:
                epoch, thresh = int(m.group(1)), float(m.group(2))
                continue
            m = re.search(r"train/valid/test time: .* loss: ([0-9.]+)/([0-9.]+)/", ln)
            if m and epoch is not None:
                tloss, vloss = float(m.group(1)), float(m.group(2))
                continue
            m = re.search(r"valid score: ER: ([0-9.]+), F: ([0-9.]+), "
                          r"LE: ([0-9.]+), LR: ([0-9.]+), SELD: ([0-9.]+)", ln)
            if m and epoch is not None:
                rows.append((epoch, tloss, vloss, float(m.group(5)), thresh,
                             float(m.group(2)), float(m.group(3)),
                             float(m.group(4))))
                epoch = None
    # resume segments repeat epochs; keep the last occurrence of each
    out = {}
    for r in rows:
        out[r[0]] = r
    return [out[e] for e in sorted(out)]


def main():
    runs = {os.path.basename(p).replace(".log", ""): parse(p)
            for p in sys.argv[1:]}
    if not runs:
        print(__doc__)
        return 1
    names = list(runs)
    print("epoch  " + "  ".join(f"{n:>16s}" for n in names) + "   (val SELD)")
    max_ep = max((r[-1][0] for r in runs.values() if r), default=0)
    best = {n: (None, 2.0) for n in names}
    for e in range(1, max_ep + 1):
        cells = []
        for n in names:
            row = next((r for r in runs[n] if r[0] == e), None)
            if row is None:
                cells.append(" " * 16)
                continue
            seld = row[3]
            mark = ""
            if seld < best[n][1]:
                best[n] = (e, seld)
                mark = "*"
            cells.append(f"{seld:15.4f}{mark or ' '}")
        if e <= 10 or e % 5 == 0 or any(c.endswith("*") for c in cells):
            print(f"{e:5d}  " + "  ".join(cells))
    print()
    for n in names:
        r = runs[n]
        if not r:
            print(f"{n}: no epochs parsed")
            continue
        e, s = best[n]
        last = r[-1]
        print(f"{n}: {last[0]} epochs, best val SELD {s:.4f} @ epoch {e}, "
              f"final train loss {last[1]:.4f}, final F {last[5]:.2f} "
              f"LE {last[6]:.1f} LR {last[7]:.2f} (thresh {last[4]})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
