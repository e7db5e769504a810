#!/usr/bin/env python3
"""Generate the best-practice chain ground-truth fixture.

Reproduces the synthetic series of the reference's best-practice tests
(/root/reference/tests/test_best_practice.py::_make_da — slope=0.02,
seed=42, daily 1982-01-01..2012-12-31) and runs the reference's
best_practice chain semantics on it:

  detrend(period=slice('1982','2011'))          climatology.py:43-76
  compute_climatology(baseline, smoothed)       climatology.py:79-131
  compute_threshold(0.9, hw=5, smoothed)        climatology.py:134-260

The reference module itself needs xarray (not installed here), so the
chain is transcribed to numpy/pandas EXACTLY per the reference source:
  - leap-normalized DOY (common/core.py:_clim_doy);
  - linear fit on the baseline slice, trend evaluated over the full
    record (fitted values are affine-reparameterization-invariant, so
    days-since-start x is equivalent to xarray's datetime numeric);
  - per-DOY baseline mean (DOY 366 from real leap days only — NaN-free
    natural occupancy, no Feb-29 interpolation);
  - pooled ±hw cross-year window quantile (linear interpolation,
    year-boundary samples drawn from the adjacent year when present —
    the _build_cross_year_pad construction);
  - circular ±15 running-mean smoothing of both tables (the dummy-
    leap-year pad+rolling construction reduces to a circular mean).

Build tooling only (driver-side python); the committed CSVs under
src/test/resources/fixtures/bp/ are the fixture consumed by
BestPracticeParitySpec.
"""
import csv
import os

import numpy as np
import pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "src", "test", "resources", "fixtures", "bp")

HW = 5          # windowHalfWidth
SMOOTH_HALF = 15  # smoothPercentileWidth=31 → ±15
PCTILE = 0.9
BASE_Y0, BASE_Y1 = 1982, 2011


def make_series():
    # test_best_practice.py::_make_da(slope=0.02, seed=42)
    time = pd.date_range("1982", "2013", freq="D", inclusive="left")
    n = len(time)
    t = np.arange(n, dtype=float)
    np.random.seed(42)
    data = (15.0
            + 5.0 * np.cos(2 * np.pi * t / 365.25)
            + 0.02 * t
            + 0.3 * np.random.randn(n))
    return time, data


def clim_doy(time):
    yr = time.year.values
    doy = time.dayofyear.values
    leap = (yr % 4 == 0) & ((yr % 100 != 0) | (yr % 400 == 0))
    return np.where((~leap) & (doy >= 60), doy + 1, doy)


def smooth_circular(a366):
    """climatology.py:109-127 / :246-258: pad 31 positions each side,
    centered 31-wide NaN-skipping running mean, keep the middle year —
    i.e. a circular nanmean over positions c-15..c+15."""
    out = np.full(366, np.nan)
    for c in range(366):
        idx = [(c + k) % 366 for k in range(-SMOOTH_HALF, SMOOTH_HALF + 1)]
        out[c] = np.nanmean(a366[idx])
    return out


def main():
    time, data = make_series()
    yr = time.year.values
    cdoy = clim_doy(time)

    # ---- detrend: fit on 1982..2011, evaluate over the full record
    x = np.arange(len(time), dtype=float)
    fit_mask = (yr >= BASE_Y0) & (yr <= BASE_Y1)
    coef = np.polyfit(x[fit_mask], data[fit_mask], 1)
    detrended = data - np.polyval(coef, x)

    base = fit_mask

    # ---- compute_climatology (on detrended, baseline period, smoothed)
    clim = np.full(366, np.nan)
    for c in range(1, 367):
        vals = detrended[base & (cdoy == c)]
        if len(vals):
            clim[c - 1] = vals.mean()
    seas = smooth_circular(clim)

    # ---- compute_threshold (pooled ±hw cross-year quantile, smoothed)
    val = {}
    for i in np.where(base)[0]:
        val[(yr[i], cdoy[i])] = detrended[i]
    years = np.unique(yr[base])
    thresh_raw = np.full(366, np.nan)
    for c in range(1, 367):
        samples = []
        for Y in years:
            for k in range(-HW, HW + 1):
                dd, YY = c + k, Y
                if dd < 1:
                    dd, YY = dd + 366, Y - 1
                elif dd > 366:
                    dd, YY = dd - 366, Y + 1
                v = val.get((YY, dd))
                if v is not None:
                    samples.append(v)
        thresh_raw[c - 1] = np.quantile(np.array(samples), PCTILE,
                                        method="linear")
    thresh = smooth_circular(thresh_raw)

    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "series.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["date", "sst"])
        for d, v in zip(time, data):
            w.writerow([d.date().isoformat(), repr(float(v))])
    with open(os.path.join(OUT, "detrended.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["date", "value"])
        for d, v in zip(time, detrended):
            w.writerow([d.date().isoformat(), repr(float(v))])
    with open(os.path.join(OUT, "clim.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["doy", "seas", "thresh"])
        for c in range(366):
            w.writerow([c + 1, repr(float(seas[c])), repr(float(thresh[c]))])
    assert np.all(thresh > seas), "reference invariant: thresh > seas"
    print(f"wrote {OUT}: {len(time)} series rows, 366 clim rows")


if __name__ == "__main__":
    main()
