#!/usr/bin/env python3
"""Generate the Oliver et al. marineHeatWaves ground-truth fixture.

Reproduces the synthetic series from the reference's own reproducibility test
(/root/reference/tests/test_reproducibility.py) and runs the ORIGINAL Oliver
code (/root/reference/tests/data/legacy/marineHeatWaves.py) on it, exporting:

  src/test/resources/fixtures/oliver/series.csv   — date,temp (11688 rows)
  src/test/resources/fixtures/oliver/clim.csv     — date,seas,thresh (per time point)
  src/test/resources/fixtures/oliver/events.csv   — per-event ground truth

This is build tooling only (runs on the dev box with the driver-side python);
the Scala library never depends on it. The committed CSVs are the fixture.
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


def generate_synthetic_data():
    # Mirrors /root/reference/tests/test_reproducibility.py:generate_synthetic_data
    t_start = date(1982, 1, 1).toordinal()
    t_end = date(2013, 12, 31).toordinal()
    time = np.arange(t_start, t_end + 1)

    temp = 15.0 * np.ones(len(time))
    temp += 5.0 * np.cos(2 * np.pi * (time - 150) / 365.25)
    temp += 0.2 * (time - time[0]) / (time[-1] - time[0])
    np.random.seed(42)
    temp += 0.5 * np.random.randn(len(time))
    temp[1000:1050] += 4.0
    temp[4000:4100] += 3.0
    temp[8000:8050] += 5.0
    return time, temp


def main():
    t, temp = generate_synthetic_data()
    events, clim = oliver_mhw.detect(t, temp)

    os.makedirs(OUT, exist_ok=True)

    with open(os.path.join(OUT, "series.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["date", "temp"])
        for ti, v in zip(t, temp):
            w.writerow([date.fromordinal(int(ti)).isoformat(), repr(float(v))])

    with open(os.path.join(OUT, "clim.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["date", "seas", "thresh"])
        for ti, s, th in zip(t, clim["seas"], clim["thresh"]):
            w.writerow([date.fromordinal(int(ti)).isoformat(),
                        repr(float(s)), repr(float(th))])

    cols = [
        "date_start", "date_end", "date_peak", "duration",
        "intensity_max", "intensity_mean", "intensity_var",
        "intensity_cumulative", "rate_onset", "rate_decline",
    ]
    n = events["n_events"]
    with open(os.path.join(OUT, "events.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(cols)
        for i in range(n):
            row = []
            for c in cols:
                v = events[c][i]
                if c.startswith("date_"):
                    row.append(v.isoformat() if hasattr(v, "isoformat")
                               else date.fromordinal(int(v)).isoformat())
                else:
                    row.append(repr(float(v)))
            w.writerow(row)

    print(f"n_events={n}")
    print("durations:", [int(d) for d in events["duration"]])
    print("first event:", {c: events[c][0] for c in cols})


if __name__ == "__main__":
    main()
