#!/usr/bin/env python3
"""Extend the Oliver ground-truth fixture (see gen_oliver_fixture.py) with:

  ranks.csv        — oliver_mhw.rank() over the DEFAULT detect() events of
                     the original series: per-event rank + return period
                     under duration / intensity_max / intensity_cumulative.
  series_cold.csv  — an independent synthetic series (seed 43) with three
                     injected COLD dips.
  cold_events.csv  — oliver_mhw.detect(..., coldSpells=True) ground truth
                     on that series (intensities negated back by Oliver).

Build tooling only; the committed CSVs are the fixture.
"""
import csv
import os
import sys
from datetime import date

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "scipy_shim"))
sys.path.insert(0, "/root/reference/tests/data/legacy")
import marineHeatWaves as oliver_mhw  # noqa: E402

OUT = os.path.join(HERE, "..", "src", "test", "resources", "fixtures", "oliver")


def time_axis():
    t_start = date(1982, 1, 1).toordinal()
    t_end = date(2013, 12, 31).toordinal()
    return np.arange(t_start, t_end + 1)


def warm_series(t):
    # identical to gen_oliver_fixture.generate_synthetic_data
    temp = 15.0 * np.ones(len(t))
    temp += 5.0 * np.cos(2 * np.pi * (t - 150) / 365.25)
    temp += 0.2 * (t - t[0]) / (t[-1] - t[0])
    np.random.seed(42)
    temp += 0.5 * np.random.randn(len(t))
    temp[1000:1050] += 4.0
    temp[4000:4100] += 3.0
    temp[8000:8050] += 5.0
    return temp


def cold_series(t):
    temp = 15.0 * np.ones(len(t))
    temp += 5.0 * np.cos(2 * np.pi * (t - 150) / 365.25)
    temp += 0.2 * (t - t[0]) / (t[-1] - t[0])
    np.random.seed(43)
    temp += 0.5 * np.random.randn(len(t))
    temp[1000:1050] -= 4.0
    temp[4000:4100] -= 3.0
    temp[8000:8050] -= 5.0
    return temp


def main():
    t = time_axis()

    # ---- ranks over the default warm detection --------------------------
    events, _ = oliver_mhw.detect(t, warm_series(t))
    rank, rp = oliver_mhw.rank(t, events)
    n = events["n_events"]
    with open(os.path.join(OUT, "ranks.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["date_start", "duration", "intensity_max",
                    "intensity_cumulative",
                    "rank_duration", "rank_imax", "rank_icum",
                    "rp_duration", "rp_imax", "rp_icum"])
        for i in range(n):
            ds = events["date_start"][i]
            w.writerow([
                ds.isoformat() if hasattr(ds, "isoformat")
                else date.fromordinal(int(ds)).isoformat(),
                repr(float(events["duration"][i])),
                repr(float(events["intensity_max"][i])),
                repr(float(events["intensity_cumulative"][i])),
                int(rank["duration"][i]),
                int(rank["intensity_max"][i]),
                int(rank["intensity_cumulative"][i]),
                repr(float(rp["duration"][i])),
                repr(float(rp["intensity_max"][i])),
                repr(float(rp["intensity_cumulative"][i])),
            ])
    print(f"warm n_events={n}, n_days={len(t)}")
    print("durations:", sorted(int(d) for d in events["duration"]))

    # ---- cold spells ----------------------------------------------------
    ctemp = cold_series(t)
    cev, _ = oliver_mhw.detect(t, ctemp, coldSpells=True)
    with open(os.path.join(OUT, "series_cold.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["date", "temp"])
        for ti, v in zip(t, ctemp):
            w.writerow([date.fromordinal(int(ti)).isoformat(), repr(float(v))])
    cols = ["date_start", "date_end", "date_peak", "duration",
            "intensity_max", "intensity_mean", "intensity_cumulative"]
    with open(os.path.join(OUT, "cold_events.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(cols)
        for i in range(cev["n_events"]):
            row = []
            for c in cols:
                v = cev[c][i]
                if c.startswith("date_"):
                    row.append(v.isoformat() if hasattr(v, "isoformat")
                               else date.fromordinal(int(v)).isoformat())
                else:
                    row.append(repr(float(v)))
            w.writerow(row)
    print(f"cold n_events={cev['n_events']}")
    print("cold durations:", [int(d) for d in cev["duration"]])
    print("cold imax:", [round(float(x), 3) for x in cev["intensity_max"]])


if __name__ == "__main__":
    main()
