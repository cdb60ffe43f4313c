#!/usr/bin/env python3
"""PromQL conformance fixture generator.

Implements the PUBLIC Prometheus algorithms (promql/functions.go
extrapolatedRate, promql/quantile.go bucketQuantile — the classic
pre-native-histogram forms the graft operators re-express) independently
of the Scala code, defines edge-case fixtures, and writes
src/test/resources/promql_fixtures.json with both the samples and the
expected outputs. PromqlConformanceSpec replays the samples through the
REAL graft operators (qRateExtrapolated / qIncrease /
qHistogramQuantile / qHoltWinters) on events-shaped parquet and compares.

Regenerate with: python3 tools/promql_ref.py
"""
import json
import os

W = 1704067200  # window base: divisible by 300 and 3600


# ---- Prometheus extrapolatedRate (promql/functions.go), isCounter,
# isRate, range = 300 s, evaluated over [W, W+300) on a fixed grid ----
def extrapolated_rate(samples, w_start, rng=300.0):
    """samples: sorted [(t_seconds, value)]; returns rate or None."""
    if len(samples) < 2:
        return None
    t_first, v_first = samples[0]
    t_last, _ = samples[-1]
    if t_last <= t_first:
        return None
    # reset-corrected increase
    result = 0.0
    prev = v_first
    for _, v in samples[1:]:
        if v < prev:
            result += v          # counter reset: contributes new value
        else:
            result += v - prev
        prev = v
    duration_to_start = t_first - w_start
    duration_to_end = (w_start + rng) - t_last
    sampled = t_last - t_first
    avg_dur = sampled / (len(samples) - 1)
    if result > 0 and v_first >= 0:
        duration_to_zero = sampled * (v_first / result)
        if duration_to_zero < duration_to_start:
            duration_to_start = duration_to_zero
    threshold = avg_dur * 1.1
    extrapolate = sampled
    extrapolate += duration_to_start if duration_to_start < threshold \
        else avg_dur / 2.0
    extrapolate += duration_to_end if duration_to_end < threshold \
        else avg_dur / 2.0
    return result * ((extrapolate / sampled) / rng)


# ---- Prometheus bucketQuantile (promql/quantile.go), q = 0.9 like
# qHistogramQuantile. Input is OBSERVED buckets only (zero-count buckets
# dropped first): graft's operator derives buckets from raw sample
# values, so its bucket schema is exactly the observed set — and
# quantile.go's sort.Search / bucketStart logic over that schema is what
# the operator must reproduce (e.g. a quantile landing in +Inf returns
# the highest OBSERVED finite bound, quantile.go's
# `buckets[len(buckets)-2].upperBound`). ----
def bucket_quantile(q, buckets):
    """buckets: sorted [(le, count)] per-bucket (NOT cumulative), le may
    be float('inf'). Returns the interpolated quantile."""
    buckets = [(le, c) for le, c in buckets if c > 0]  # observed schema
    total = sum(c for _, c in buckets)
    rank = q * total
    # sort.Search: first bucket whose CUMULATIVE count >= rank
    cum = 0
    cums = []
    for _, c in buckets:
        cum += c
        cums.append(cum)
    b = next(i for i, c in enumerate(cums) if c >= rank)
    if b == len(buckets) - 1 and buckets[b][0] == float("inf"):
        return buckets[len(buckets) - 2][0]  # highest observed finite le
    bucket_start = 0.0
    count = cums[b]
    r = rank
    if b > 0:
        bucket_start = buckets[b - 1][0]
        count -= cums[b - 1]
        r -= cums[b - 1]
    return bucket_start + (buckets[b][0] - bucket_start) * (r / count)


# ---- qIncrease semantics: cross-window reset-corrected delta sum
# (the PromQL reset rule; windowing assigns each delta to the LATER
# sample's 1h window, no extrapolation — documented operator scope) ----
def increase_windows(samples, win=3600):
    out = {}
    for (t0, v0), (t1, v1) in zip(samples, samples[1:]):
        d = v1 if v1 < v0 else v1 - v0
        w = (int(t1) // win) * win
        out[w] = out.get(w, 0.0) + d
    return {w: round(v, 2) for w, v in out.items()}


# ---- qHoltWinters twin: alpha=beta=0.5 double-exponential smoothing on
# integer cents with the offset-shift halve (exact arithmetic twin) ----
def holt_winters_cents(cents):
    OFF = 1 << 40

    def halve(x):
        return ((x + 2 * OFF) >> 1) - OFF

    s_prev, s = 0, cents[0]
    b = cents[1] - cents[0]
    first = True
    for x in cents[1:]:
        if not first:
            b = halve(s - s_prev + b)
        sn = halve(x + s + b)
        s_prev, s = s, sn
        first = False
    return round(s / 100.0, 2)


def rate_cases():
    """Each case: one series, samples inside [W, W+300)."""
    C = []

    def case(name, pts):  # pts: [(offset_s, value)]
        C.append({"name": name,
                  "samples": [[W + o, v] for o, v in pts]})

    case("steady_counter",
         [(10 + 20 * i, round(1.5 * i, 2)) for i in range(15)])
    case("two_samples", [(60, 10.00), (240, 25.00)])
    case("reset_mid_window",
         [(30, 100.00), (90, 150.00), (150, 10.00), (210, 60.00),
          (270, 110.00)])
    case("reset_to_zero",
         [(30, 500.00), (90, 0.00), (150, 50.00), (210, 100.00)])
    case("clustered_start",
         [(5, 1.00), (15, 2.00), (25, 3.00), (35, 4.00), (45, 5.00)])
    case("clustered_end",
         [(255, 1.00), (265, 2.00), (275, 3.00), (285, 4.00),
          (295, 5.00)])
    case("zero_cap_engaged",
         [(100, 0.50), (150, 100.00), (200, 200.00), (250, 300.00)])
    case("zero_cap_not_engaged",
         [(100, 5000.00), (150, 5001.00), (200, 5002.00),
          (250, 5003.00)])
    case("flat_counter", [(60, 42.00), (120, 42.00), (180, 42.00),
                          (240, 42.00)])
    case("monotone_decreasing",
         [(60, 50.00), (120, 40.00), (180, 30.00), (240, 20.00)])
    case("subsecond_spacing",
         [(100.25, 1.00), (100.75, 2.00), (101.25, 3.00),
          (299.50, 10.00)])
    case("two_close_mid", [(149, 7.00), (151, 9.00)])
    case("reset_at_first_delta",
         [(50, 900.00), (100, 1.00), (200, 2.00), (280, 3.00)])
    case("uneven_spacing",
         [(20, 0.00), (30, 5.00), (200, 10.00), (290, 15.00)])
    for c in C:
        r = extrapolated_rate([(t, v) for t, v in c["samples"]], W)
        c["expected_rate"] = round(r, 6)
        c["w_start"] = W
    return C


def increase_cases():
    C = []

    def case(name, pts):
        C.append({"name": name,
                  "samples": [[W + o, v] for o, v in pts]})

    # monotone across two 1h windows: boundary delta lands in window 2
    case("inc_monotone_two_windows",
         [(600, 10.00), (1800, 20.00), (3000, 30.00),
          (4200, 45.00), (5400, 60.00)])
    # reset exactly at the window edge (VERDICT's named edge case)
    case("inc_reset_at_window_edge",
         [(1200, 500.00), (2400, 600.00), (3601, 5.00), (4800, 55.00)])
    case("inc_reset_inside_window",
         [(300, 50.00), (900, 75.00), (1500, 2.00), (2100, 27.00)])
    # single sample in window 2 still receives the boundary delta
    case("inc_single_sample_window",
         [(3000, 100.00), (4000, 160.00)])
    case("inc_two_resets",
         [(600, 30.00), (1200, 1.00), (1800, 31.00), (2400, 2.00),
          (3000, 32.00)])
    for c in C:
        exp = increase_windows([(t, v) for t, v in c["samples"]])
        c["expected"] = sorted([[w, v] for w, v in exp.items()])
    return C


def hq_cases():
    # counts per bucket le∈{1,2,5,10,inf} — the spec materializes
    # `counts[b]` samples with a value inside bucket b
    C = []

    def case(name, c1, c2, c5, c10, cinf):
        buckets = [(1.0, c1), (2.0, c2), (5.0, c5), (10.0, c10),
                   (float("inf"), cinf)]
        C.append({"name": name, "counts": [c1, c2, c5, c10, cinf],
                  "expected_q90": round(bucket_quantile(0.9, buckets), 6)})

    case("hq_uniform", 10, 10, 10, 10, 10)          # rank 45 → +Inf → 10
    case("hq_all_first_bucket", 20, 0, 0, 0, 0)     # interpolate from 0
    case("hq_exact_boundary", 9, 1, 0, 0, 0)        # rank 9 = cum(b1)
    case("hq_inf_bucket", 1, 1, 1, 1, 16)           # q90 in +Inf → 10
    case("hq_empty_middle", 5, 0, 0, 0, 1)          # gap buckets skipped
    case("hq_single_sample", 0, 0, 1, 0, 0)         # rank .9 in b5
    case("hq_rank_in_b2", 5, 10, 1, 0, 0)           # rank 14.4 in b2
    case("hq_skew_last_finite", 1, 1, 1, 27, 0)     # deep in b10
    case("hq_total_ten", 3, 3, 3, 1, 0)             # rank 9 in b10... check
    return C


def hw_cases():
    C = []

    def case(name, values):
        cents = [int(round(v * 100)) for v in values]
        C.append({"name": name, "values": values,
                  "expected_smoothed": holt_winters_cents(cents)})

    case("hw_two_points", [10.00, 14.00])
    case("hw_linear_ramp", [1.00, 2.00, 3.00, 4.00, 5.00])
    case("hw_alternating", [10.00, 0.00, 10.00, 0.00, 10.00])
    case("hw_step_jump", [5.00, 5.00, 5.00, 50.00, 50.00])
    case("hw_ten_points",
         [3.00, 4.50, 4.00, 6.00, 7.25, 7.00, 9.00, 10.50, 10.00, 12.00])
    return C


# ---- qIrate twin: Prometheus irate() on the fixed 300 s grid —
# last two samples of the window, reset rule (last < prev → last IS the
# increase), rate over their exact time distance. Mirrors the operator's
# integer-cents quantization so expected values are engine-exact. ----
def irate(samples):
    if len(samples) < 2:
        return None
    (pt, pv), (lt, lv) = samples[-2], samples[-1]
    if lt <= pt:
        return None
    pc, lc = int(round(pv * 100)), int(round(lv * 100))
    inc = lc if lc < pc else lc - pc
    return round((inc / 100.0) / (lt - pt), 6)


# ---- qResets twin: Prometheus resets() per 1h window — count of
# negative successive deltas, window-local. ----
def resets(samples):
    c = 0
    for (_, a), (_, b) in zip(samples, samples[1:]):
        if b < a:
            c += 1
    return c


# ---- qDelta twin: last − first per 1h window, no reset correction
# (the operator's documented gauge scope; boundary extrapolation lives
# in qRateExtrapolated). ----
def delta(samples):
    if len(samples) < 2:
        return None
    return round(samples[-1][1] - samples[0][1], 2)


def irate_cases():
    C = []

    def case(name, pts):
        C.append({"name": name, "samples": [[W + o, v] for o, v in pts]})

    case("ir_steady", [(10, 1.00), (100, 5.00), (110, 10.00)])  # dt 10
    case("ir_reset_last_pair", [(50, 100.00), (100, 200.00),
                                (150, 3.00)])  # reset: irate from 3.00
    case("ir_two_samples", [(60, 2.00), (120, 5.00)])  # dt 60
    case("ir_subsecond", [(100.0, 1.00), (100.5, 2.00)])  # dt 0.5
    case("ir_long_gap", [(10, 0.00), (250, 12.00)])  # dt 240
    case("ir_decreasing_gauge", [(40, 9.00), (90, 6.00),
                                 (140, 3.00)])  # reset rule fires
    for c in C:
        c["expected_irate"] = irate([(t, v) for t, v in c["samples"]])
        c["w_start"] = W
    return C


def resets_cases():
    C = []

    def case(name, pts):
        C.append({"name": name, "samples": [[W + o, v] for o, v in pts]})

    case("rs_none", [(100, 1.00), (200, 2.00), (300, 3.00)])
    case("rs_two", [(100, 5.00), (200, 1.00), (300, 6.00), (400, 2.00)])
    case("rs_alternating", [(100, 2.00), (200, 1.00), (300, 2.00),
                            (400, 1.00), (500, 2.00)])
    case("rs_all_down", [(100, 9.00), (200, 7.00), (300, 5.00),
                         (400, 3.00)])
    for c in C:
        c["expected_resets"] = resets([(t, v) for t, v in c["samples"]])
        c["expected_n"] = len(c["samples"])
    return C


# ---- qChanges twin: Prometheus changes() per 1h window — count of
# successive UNEQUAL sample pairs, window-local (promql/functions.go
# funcChanges; the NaN branch is out of scope — fixtures carry no
# NaNs, and the operator's cents quantization makes 2-decimal
# fixture values compare identically to the float path). ----
def changes(samples):
    return sum(1 for (_, a), (_, b) in zip(samples, samples[1:])
               if a != b)


def changes_cases():
    C = []

    def case(name, pts):
        C.append({"name": name, "samples": [[W + o, v] for o, v in pts]})

    case("ch_flat", [(60, 5.00), (120, 5.00), (180, 5.00), (240, 5.00)])
    case("ch_single", [(90, 3.25)])
    case("ch_alternating", [(60, 1.00), (120, 2.00), (180, 1.00),
                            (240, 2.00), (300, 1.00)])
    case("ch_plateaus", [(60, 1.00), (120, 1.00), (180, 2.00),
                         (240, 2.00), (300, 2.00), (360, 3.00)])
    case("ch_monotone", [(60, 1.00), (120, 2.00), (180, 3.00),
                         (240, 4.00)])
    case("ch_return_to_prev", [(60, 4.00), (120, 7.00), (180, 4.00)])
    case("ch_negative_cross", [(60, -1.00), (120, 0.00), (180, 1.00),
                               (240, 1.00), (300, -1.00)])
    for c in C:
        c["expected_changes"] = changes([(t, v) for t, v in c["samples"]])
        c["expected_points"] = len(c["samples"])
    return C


# ---- qIdelta twin: Prometheus idelta() — last sample minus the one
# before it (promql/functions.go funcIdelta → instantValue with
# isRate=false), defined only when the window holds ≥2 samples with
# distinct timestamps. graft evaluates on the 300 s grid and emits
# exact cents plus the sample gap in µs. ----
def idelta(samples):
    if len(samples) < 2:
        return None
    (pt, pv), (lt, lv) = samples[-2], samples[-1]
    if lt <= pt:
        return None
    return (int(round(lv * 100)) - int(round(pv * 100)),
            int(round((lt - pt) * 1e6)))


def idelta_cases():
    C = []

    def case(name, pts):
        C.append({"name": name, "samples": [[W + o, v] for o, v in pts]})

    case("id_increasing", [(10, 1.00), (70, 2.00), (130, 4.00)])
    case("id_drop_last", [(10, 5.00), (150, 2.50)])
    case("id_irregular_gap", [(5, 1.00), (20, 1.25), (290, 1.10)])
    case("id_negative_values", [(30, -2.00), (90, -3.50)])
    case("id_same_value", [(40, 2.00), (100, 2.00)])
    case("id_subsecond_gap", [(100.0, 1.00), (100.5, 3.00)])
    case("id_single_sample", [(50, 9.00)])
    for c in C:
        r = idelta([(t, v) for t, v in c["samples"]])
        c["expected_idelta_cents"] = None if r is None else r[0]
        c["expected_gap_us"] = None if r is None else r[1]
    return C


def delta_cases():
    C = []

    def case(name, pts):
        C.append({"name": name, "samples": [[W + o, v] for o, v in pts]})

    case("dl_gauge_down", [(100, 80.25), (900, 60.50), (1700, 40.75)])
    case("dl_gauge_up", [(100, 1.25), (1700, 9.75)])
    case("dl_round_trip", [(100, 5.00), (900, 50.00), (1700, 5.00)])
    for c in C:
        c["expected_delta"] = delta([(t, v) for t, v in c["samples"]])
    return C


# ---- qDeriv / qPredictLinear twin: Prometheus linearRegression
# (promql/functions.go) in ITS OWN formulation — float seconds, value
# units, covariance form — deliberately NOT the operator's
# exact-integer cents/milliseconds normal equations. Agreement after
# rounding proves the integer reformulation computes the same line. ----
def linear_regression(samples, intercept_time):
    """samples: [(t_seconds, value)]; returns (slope value/s, intercept
    value at intercept_time) — funcDeriv/funcPredictLinear's shared
    core."""
    sx = sy = sxy = sx2 = 0.0
    n = float(len(samples))
    for t, v in samples:
        x = float(t) - intercept_time
        sx += x
        sy += v
        sxy += x * v
        sx2 += x * x
    cov_xy = sxy - sx * sy / n
    var_x = sx2 - sx * sx / n
    slope = cov_xy / var_x
    intercept = sy / n - slope * sx / n
    return slope, intercept


def _regression_pts():
    """Shared sample shapes for deriv + predict_linear (offsets s)."""
    return [
        ("steady_ramp", [(0, 1.00), (600, 2.00), (1200, 3.00),
                         (1800, 4.00)]),
        ("noisy", [(10, 1.23), (500, 4.56), (900, 3.21), (1500, 7.89),
                   (2200, 6.54)]),
        ("two_points", [(100, 5.00), (700, 8.50)]),
        ("negative_slope", [(0, 50.00), (900, 30.00), (1800, 10.00)]),
        ("flat", [(0, 3.14), (600, 3.14), (1200, 3.14)]),
        # millisecond-grid spacing: x lands on the operator's ms floor
        ("subsecond", [(100.001, 1.00), (100.501, 2.00),
                       (101.001, 4.00)]),
    ]


def deriv_cases():
    C = []
    for name, pts in _regression_pts():
        samples = [(W + o, v) for o, v in pts]
        slope_per_s, _ = linear_regression(samples, samples[0][0])
        C.append({"name": "dv_" + name,
                  "samples": [[t, v] for t, v in samples],
                  # operator emits cents/ms = (value/s) / 10
                  "expected_slope": round(slope_per_s / 10.0, 6)})
    return C


def predict_linear_cases():
    C = []
    for name, pts in _regression_pts():
        samples = [(W + o, v) for o, v in pts]
        # predict_linear(v[1h], 300): intercept at the window end
        # (= eval time T), predict 300 s ahead
        slope, intercept = linear_regression(samples, W + 3600.0)
        C.append({"name": "pl_" + name,
                  "samples": [[t, v] for t, v in samples],
                  "expected_predicted": round(intercept + slope * 300.0, 4)})
    return C


# ---- qHistogramFraction twin: linear interpolation of the [3, 8]
# mass inside le-buckets {1,2,5,10,+Inf} — interp(x) = cum_below +
# (x-lo)/(hi-lo) * bucket_count, fraction = (interp(8)-interp(3))/N.
# Computed from per-bucket counts here vs the operator's conditional
# cumulative sums over raw samples. ----
def histogram_fraction(lower, upper, counts):
    """counts: per-bucket for le {1,2,5,10,inf}; returns the fraction."""
    bounds = [1.0, 2.0, 5.0, 10.0, float("inf")]
    total = sum(counts)

    def interp(x):
        lo, cum_below = 0.0, 0
        for hi, c in zip(bounds, counts):
            if x <= hi:
                return cum_below + (x - lo) / (hi - lo) * c
            lo, cum_below = hi, cum_below + c
        return float(total)

    return (interp(float(upper)) - interp(float(lower))) / total


def hf_cases():
    """Per-bucket counts for le {1,2,5,10,+Inf}; representative sample
    values 0.5/1.5/3.0/7.0/20.0 (cents 50/150/300/700/2000) as in
    hq_cases — PromqlConformanceSpec materializes the samples."""
    C = []

    def case(name, c1, c2, c5, c10, cinf):
        counts = [c1, c2, c5, c10, cinf]
        reps = [0.5, 1.5, 3.0, 7.0, 20.0]
        total = sum(counts)
        s = sum(c * r for c, r in zip(counts, reps))
        C.append({"name": name, "counts": counts,
                  "expected_count": total,
                  "expected_avg": round(s / total, 6),
                  "expected_frac": round(
                      histogram_fraction(3, 8, counts), 6)})

    case("hf_uniform", 2, 2, 2, 2, 2)
    case("hf_empty_middle", 3, 4, 0, 5, 1)       # (2,5] bucket empty
    case("hf_all_below", 6, 4, 0, 0, 0)          # fraction 0
    case("hf_all_in_range_bucket", 0, 0, 9, 0, 0)  # all mass in (2,5]
    case("hf_all_above", 0, 0, 0, 7, 3)          # upper interp only
    case("hf_skew_inf", 1, 1, 1, 1, 16)          # +Inf-heavy tail
    return C


# ---- quantile_over_time / mad_over_time twin: promql/quantile.go
# quantile() over RAW samples — sort, rank q*(n-1), linear
# interpolation between the straddling values. Float arithmetic, the
# form Prometheus actually runs; the operators run Spark `percentile`
# (same rank definition) — rounded agreement proves it. ----
def promql_quantile(q, values):
    vs = sorted(values)
    n = len(vs)
    rank = q * (n - 1)
    lower = int(rank)
    upper = min(lower + 1, n - 1)
    weight = rank - lower
    return vs[lower] * (1 - weight) + vs[upper] * weight


def _sample_shapes():
    """Value lists exercising the rank arithmetic's branches."""
    return [
        ("odd_count", [1.25, 9.75, 3.50, 7.00, 5.25]),
        ("even_count", [2.00, 4.00, 6.00, 8.00]),
        ("single_sample", [42.17]),
        ("two_samples", [1.00, 2.00]),
        ("duplicates", [5.00, 5.00, 5.00, 9.00]),
        # 11 values: p90 rank = 0.9*10 = 9.0 lands EXACTLY on an index
        ("exact_rank", [float(i) for i in range(1, 12)]),
    ]


def qot_cases():
    C = []
    for name, vals in _sample_shapes():
        C.append({"name": "qt_" + name,
                  "values": vals,
                  "expected_p50": round(promql_quantile(0.5, vals), 4),
                  "expected_p90": round(promql_quantile(0.9, vals), 4),
                  "expected_p99": round(promql_quantile(0.99, vals), 4),
                  "expected_n": len(vals)})
    return C


def mad_cases():
    C = []
    for name, vals in _sample_shapes():
        if len(vals) < 2:
            continue
        med = promql_quantile(0.5, vals)
        mad = promql_quantile(0.5, [abs(v - med) for v in vals])
        C.append({"name": "md_" + name,
                  "values": vals,
                  "expected_mad": round(mad, 4),
                  "expected_median": round(med, 4)})
    return C


# ---- stdvar_over_time twin: population variance sum((x-mean)^2)/n in
# FLOAT (Prometheus's aux/count incremental form reduces to this) vs
# the operator's exact-integer (n*S2 - S1^2)/n^2 over cents. ----
def stdvar_cases():
    C = []
    for name, vals in _sample_shapes():
        if len(vals) < 2:
            continue
        mean = sum(vals) / len(vals)
        var = sum((v - mean) ** 2 for v in vals) / len(vals)
        C.append({"name": "sv_" + name,
                  "values": vals,
                  "expected_stdvar": round(var, 6),
                  "expected_stddev": round(var ** 0.5, 6)})
    return C


# ---- Aggregation-operator family (promql/engine.go aggregation():
# topk/bottomk's k-element value heap — transcribed with the operators'
# documented deterministic user tie-break; quantile() across series via
# the same rank-interpolation rule as quantile_over_time; stddev/stdvar
# across series in Prometheus's float aux/count incremental form (vs
# the operator's exact-integer (n*S2-S1^2)/n^2); count_values()'s
# value-bucket counting). Series values live inside ONE 1h window so
# the aggregation grid cannot matter. ----
def agg_series_shapes():
    """[(case, [(series_key, [values...])...])] — the per-series sample
    lists exercise sum-then-rank (multi-sample), exact ties AT and
    BELOW rank k, duplicate values, fewer-than-k membership, and
    negative values."""
    return [
        ("distinct", [(1, [5.00]), (2, [3.00]), (3, [7.00]), (4, [1.00])]),
        ("tie_at_rank_k", [(1, [4.00]), (2, [4.00]), (3, [4.00]), (4, [4.00])]),
        ("tie_below_k", [(1, [9.00]), (2, [1.00]), (3, [1.00]), (4, [8.00])]),
        ("fewer_than_k", [(1, [4.00]), (2, [2.00])]),
        ("multi_sample_sum", [(1, [1.00, 2.00]), (2, [4.00]),
                              (3, [0.50, 0.25])]),
        ("dup_values", [(1, [5.00]), (2, [5.00]), (3, [2.00]), (4, [5.00])]),
        ("negative_values", [(1, [-3.00]), (2, [2.00]), (3, [-3.00]),
                             (4, [0.00])]),
    ]


def _series_cents(series):
    return [(k, sum(int(round(v * 100)) for v in vals))
            for k, vals in series]


def topk_bottomk_cases():
    C = []
    for name, series in agg_series_shapes():
        sums = _series_cents(series)
        top = sorted(sums, key=lambda x: (-x[1], x[0]))[:3]
        bot = sorted(sums, key=lambda x: (x[1], x[0]))[:3]

        def fmt(rows):
            return [[float(k), round(c / 100.0, 2)] for k, c in rows]
        C.append({"name": "tk_" + name,
                  "samples": [[float(k), float(i), v]
                              for k, vals in series
                              for i, v in enumerate(vals)],
                  "expected_topk": fmt(top),
                  "expected_bottomk": fmt(bot)})
    return C


def quantile_agg_cases():
    """quantile(phi, v) across series — one sample per series, the
    instant-aggregation shape."""
    C = []
    for name, vals in _sample_shapes():
        C.append({"name": "qa_" + name,
                  "samples": [[float(u), 0.0, v]
                              for u, v in enumerate(vals, start=1)],
                  "expected_p50": round(promql_quantile(0.5, vals), 4),
                  "expected_p90": round(promql_quantile(0.9, vals), 4),
                  "expected_n": len(vals)})
    return C


def stddev_agg_cases():
    """stddev/stdvar across series (population), per-series value = the
    window sum — replicating the operator's exact float pipeline:
    stdvar = (n*S2 - S1^2)/n^2 over cents, /1e4 to value units."""
    C = []
    for name, series in agg_series_shapes():
        sums = [c for _, c in _series_cents(series)]
        n = len(sums)
        if n < 2:
            continue
        s1 = sum(sums)
        s2 = sum(c * c for c in sums)
        stdvar = (n * s2 - s1 * s1) / (n * n) / 10000.0
        stddev = ((n * s2 - s1 * s1) / (n * n)) ** 0.5 / 100.0
        C.append({"name": "sd_" + name,
                  "samples": [[float(k), float(i), v]
                              for k, vals in series
                              for i, v in enumerate(vals)],
                  "expected_n": n,
                  "expected_stdvar": stdvar,
                  "expected_stddev": stddev})
    return C


def over_time_cases():
    """min/max/avg/sum/count_over_time per series-window — the simple
    *_over_time aggregations, replicating the operator's exact pipeline
    (avg as an exact x1e4 truncating-integer, sum via cents)."""
    C = []
    for name, vals in _sample_shapes():
        cents = [int(round(v * 100)) for v in vals]
        C.append({"name": "ot_" + name,
                  "values": vals,
                  "expected_min": round(min(vals), 4),
                  "expected_max": round(max(vals), 4),
                  "expected_sum": round(sum(cents) / 100.0, 2),
                  "expected_avg_x10000": sum(cents) * 100 // len(cents),
                  "expected_count": len(vals)})
    return C


# ---- qTsOfExtrema twin: Prometheus 3.x funcTsOfMaxOverTime /
# funcTsOfMinOverTime / funcTsOfLastOverTime (promql/functions.go):
# iterate samples in time order keeping `v >= max` (resp. `v <= min`),
# so a VALUE TIE resolves to the LATEST timestamp; last is the final
# sample's timestamp. The operator compares exact cents — fixture
# values stay 2-decimal so both paths see identical comparisons. ----
def ts_of_cases():
    C = []

    def case(name, pts):
        C.append({"name": name, "samples": [[W + o, v] for o, v in pts]})

    case("tso_monotone", [(60, 1.00), (120, 2.00), (180, 3.00)])
    case("tso_single", [(90, 4.25)])
    case("tso_max_tie_latest", [(60, 5.00), (120, 3.00), (180, 5.00),
                                (240, 1.00)])
    case("tso_min_tie_latest", [(60, -2.00), (120, 4.00), (180, -2.00),
                                (240, 0.00)])
    case("tso_all_equal", [(60, 7.00), (120, 7.00), (180, 7.00)])
    case("tso_spike_then_fall", [(60, 1.00), (120, 9.50), (180, 0.50)])
    case("tso_all_negative", [(60, -5.00), (120, -1.25), (180, -9.00)])
    case("tso_extremes_at_ends", [(60, 9.00), (120, 5.00), (180, 0.25)])
    for c in C:
        s = c["samples"]
        mx = max(v for _, v in s)
        mn = min(v for _, v in s)
        c["expected_ts_of_max_us"] = int(max(t for t, v in s if v == mx) * 1e6)
        c["expected_ts_of_min_us"] = int(max(t for t, v in s if v == mn) * 1e6)
        c["expected_ts_of_last_us"] = int(max(t for t, _ in s) * 1e6)
    return C


def count_values_cases():
    """count_values("v", m): occurrences per distinct sample value."""
    shapes = [
        ("all_distinct", [1.00, 2.00, 3.00]),
        ("all_equal", [7.25, 7.25, 7.25, 7.25]),
        ("mixed", [1.00, 2.00, 1.00, 3.00, 1.00, 2.00]),
        ("negative_and_zero", [-1.50, 0.00, -1.50, 0.00, 2.00]),
        # no value may sit AT a .5-cent boundary: python round() is
        # banker's, Spark's is HALF_UP — fixture values stay clear of
        # the tie so both engines round identically
        ("sub_cent_rounding", [1.004, 1.0049, 0.994, 1.006]),
    ]
    C = []
    for name, vals in shapes:
        counts = {}
        for v in vals:
            c = int(round(v * 100))
            counts[c] = counts.get(c, 0) + 1
        C.append({"name": "cv_" + name,
                  "samples": [[1.0, float(i), v]
                              for i, v in enumerate(vals)],
                  "expected": sorted([[float(c), float(n)]
                                      for c, n in counts.items()])})
    return C


def round_cases():
    """round(v, to): Prometheus funcRound = floor(v*inv + 0.5)/inv with
    inv = 1/to — ties round UP (toward +inf). Granularities mirror
    q_promql_round: to = 0.01 / 0.5 / 1.0 (cents t = 1 / 50 / 100).
    Fixture values are exact 2-decimal numbers so the operator's cent
    quantization is lossless; expected outputs are computed with exact
    rational arithmetic and emitted as cents integers."""
    from fractions import Fraction
    tos = [Fraction(1, 100), Fraction(1, 2), Fraction(1, 1)]
    vals = [0.00, 0.25, 0.49, 0.50, 0.75, 1.49, 1.50, 2.37, 7.25]
    C = []
    for v in vals:
        fv = Fraction(int(round(v * 100)), 100)
        exp = []
        for to in tos:
            import math
            q = fv / to + Fraction(1, 2)
            r = math.floor(q) * to
            exp.append(float(r * 100))  # cents
        C.append({"name": ("round_%.2f" % v).replace(".", "_"),
                  "samples": [[1705320000.0, v]],
                  "expected": exp})
    return C


def nh_index(pos, schema):
    """Sparse exponential (native) histogram bucket index for |cents|
    = pos >= 0 at ANY schema -4..8: ceil(2^s * log2(pos)), EXACT via
    Python bignums — for s > 0, ceil(2^s*log2 v) = bit_length of
    v^(2^s) - 1 (the 256-bit-exponent power the Scala side cannot form
    in int64, which is exactly why its boundary-table device needs an
    independent exact twin); for s <= 0, ceil(ceil(log2 v)/2^-s) by the
    nested-ceiling identity. Independent twin of NativeHistogram's
    conv/bin bit-length + boundary-table devices."""
    if pos <= 1:
        return 0
    if schema <= 0:
        i0 = (pos - 1).bit_length()
        d = 1 << (-schema)
        return (i0 + d - 1) // d
    if schema <= 8:
        return (pos ** (1 << schema) - 1).bit_length()
    raise ValueError(schema)


def nh_buckets(cents, schema):
    """{(sgn, idx): count} over signed integer cents."""
    c = {}
    for v in cents:
        sgn = (v > 0) - (v < 0)
        idx = 0 if sgn == 0 else nh_index(abs(v), schema)
        c[(sgn, idx)] = c.get((sgn, idx), 0) + 1
    return c


def nh_quantile(phi_x100, cents):
    """histogram_quantile over schema-0 native buckets: value-ordered
    cumulative crossing (ord = sgn*(idx+1)), EXPONENTIAL interpolation
    within halfcent bounds (1<<idx, 1<<(idx+1)) per Prometheus 3.0
    (PR #14677): positive lo*2^frac, negative -up*2^(-frac); zero
    bucket -> 0. Returns value units (halfcents / 200)."""
    b = nh_buckets(cents, 0)
    items = sorted(b.items(), key=lambda kv: kv[0][0] * (kv[0][1] + 1))
    rank = (len(cents) * phi_x100) / 100.0
    cum = 0
    for (sgn, idx), cnt in items:
        prev = cum
        cum += cnt
        if cum >= rank:
            if sgn == 0:
                return 0.0
            lo, up = 1 << idx, 1 << (idx + 1)
            frac = (rank - prev) / cnt
            if sgn == 1:
                return lo * 2.0 ** frac / 200.0
            return -up * 2.0 ** (-frac) / 200.0
    raise AssertionError("rank beyond total")


def nh_fraction(bound_cents, cents):
    """histogram_fraction(-Inf, bound): negatives/zero count fully, a
    positive bucket fully below the bound, the single straddler
    interpolates EXPONENTIALLY (Prometheus 3.0 PR #14677): its
    contribution is cnt*log2(bound/lo) -- the log-space position in a
    bucket of log-width exactly 1."""
    import math
    bh = bound_cents * 2
    full, partial = 0, 0.0
    for (sgn, idx), cnt in nh_buckets(cents, 0).items():
        lo, up = 1 << idx, 1 << (idx + 1)
        if sgn < 1 or up <= bh:
            full += cnt
        elif lo < bh < up:
            partial += cnt * math.log2(bh / lo)
    return (full + partial) / len(cents)


def nhcb_buckets(cents, bounds):
    """NHCB (custom-bucket native histogram, 'schema -53') layout:
    bucket index = #bounds strictly below the SIGNED cents value
    (bucket 0 = (-inf, b0], bucket i = (b_{i-1}, b_i], overflow above
    the last bound). Returns {idx: count}."""
    c = {}
    for v in cents:
        idx = sum(1 for b in bounds if b < v)
        c[idx] = c.get(idx, 0) + 1
    return c


def nhcb_quantile(phi_x100, cents, bounds):
    """histogram_quantile over an NHCB layout: classic LINEAR
    bucketQuantile (custom bounds carry no exponential base) with the
    classic conventions -- lowest bucket interpolates from 0, a rank in
    the overflow bucket returns the highest finite bound. Returns value
    units (cents / 100)."""
    b = nhcb_buckets(cents, bounds)
    rank = (len(cents) * phi_x100) / 100.0
    cum = 0
    for idx in sorted(b):
        prev = cum
        cum += b[idx]
        if cum >= rank:
            if idx >= len(bounds):
                return bounds[-1] / 100.0
            lo = 0 if idx == 0 else bounds[idx - 1]
            hi = bounds[idx]
            return (lo + (hi - lo) * (rank - prev) / b[idx]) / 100.0
    raise AssertionError("rank beyond total")


def native_histogram_cases():
    """Edge cases for the native-histogram family: values exactly ON
    power-of-two bucket uppers (2^k is the LAST value of bucket k), the
    idx-0 bucket (0.5, 1], zeros (zero bucket), negatives (mirrored
    buckets), rank landing exactly on a cumulative boundary, a single
    observation, and a 6-decade spread."""
    shapes = {
        "nh_pow2_uppers": [1, 2, 4, 8, 16],
        "nh_idx0": [1, 1, 1],
        "nh_zeros_mixed": [0, 0, 3, 12, 700],
        "nh_negatives": [-8, -3, 0, 5, 900],
        "nh_rank_boundary": [1, 1, 2, 2, 300, 300, 300, 300],
        "nh_single": [737],
        "nh_spread": [1, 9, 83, 640, 5000, 48000, 390000, 1000000],
        "nh_all_zero": [0, 0, 0],
        "nh_all_negative": [-1, -4, -900],
    }
    W = 1704067200  # divisible by 3600
    C = []
    for name, cents in shapes.items():
        samples = [[float(W + 30 + 60 * i), c / 100.0]
                   for i, c in enumerate(cents)]
        buckets = []
        for schema in (-1, 0, 1):
            for (sgn, idx), cnt in sorted(nh_buckets(cents, schema).items()):
                buckets.append([schema, sgn, idx, cnt])
        C.append({
            "name": name,
            "samples": samples,
            "expected_buckets": buckets,
            "expected_q50": nh_quantile(50, cents),
            "expected_q90": nh_quantile(90, cents),
            "expected_frac_500": nh_fraction(500, cents),
            "expected_frac_5000": nh_fraction(5000, cents),
        })
    return C


def nh_wide_cases():
    """Wide-schema index fixtures (schemas -4/-2/+2/+4/+8 -- the span
    the Scala boundary-table device serves): adversarial positions --
    exact powers of two (octave starts, where ceil is exact and the
    sub-index must be 0), their +/-1 neighbors (the tightest mantissa
    boundaries), primes, a dense 1..32 run (every sub-octave path), a
    6-decade spread, and negatives/zeros (mirror + zero bucket).
    Expected indexes from EXACT bignum math (v^(2^s) materialized --
    the computation the engine's int64 device must reproduce)."""
    shapes = {
        "nhw_pow2": [1, 2, 4, 8, 1024, 65536],
        "nhw_pow2_pm1": [3, 5, 7, 9, 1023, 1025, 65535, 65537],
        "nhw_primes": [2, 3, 7, 31, 127, 8191],
        "nhw_dense": list(range(1, 33)),
        "nhw_spread": [1, 9, 83, 640, 5000, 48000, 390000, 1000000],
        "nhw_negatives": [-3, -1024, -48000, 0, 17],
    }
    schemas = [-4, -2, 2, 4, 8]
    W2 = 1704067200
    C = []
    for name, cents in shapes.items():
        samples = [[float(W2 + 30 + 60 * i), c / 100.0]
                   for i, c in enumerate(cents)]
        buckets = []
        for schema in schemas:
            for (sgn, idx), cnt in sorted(nh_buckets(cents, schema).items()):
                buckets.append([schema, sgn, idx, cnt])
        C.append({"name": name, "samples": samples,
                  "expected_buckets": buckets})
    return C


NHCB_BOUNDS = [500, 2000, 8000, 20000]  # == NativeHistogram.CustomBounds


def nhcb_cases():
    """Custom-bucket (NHCB) fixtures: values exactly ON bounds (a bound
    is the LAST value of its bucket), all-below-first, all-overflow,
    negatives (bucket 0), a single observation, and a spread; expected
    layout + classic linear quantiles at phi 50/90."""
    shapes = {
        "nhcb_on_bounds": [500, 500, 2000, 8000, 20000],
        "nhcb_low": [1, 2, 499],
        "nhcb_overflow": [20001, 50000, 100000],
        "nhcb_mixed": [-100, 0, 700, 2500, 9000, 21000],
        "nhcb_single": [737],
        "nhcb_spread": [100, 600, 2100, 8100, 20100, 300, 700],
    }
    W2 = 1704067200
    C = []
    for name, cents in shapes.items():
        samples = [[float(W2 + 30 + 60 * i), c / 100.0]
                   for i, c in enumerate(cents)]
        buckets = [[idx,
                    NHCB_BOUNDS[idx] if idx < len(NHCB_BOUNDS) else -1,
                    cnt]
                   for idx, cnt in sorted(
                       nhcb_buckets(cents, NHCB_BOUNDS).items())]
        C.append({
            "name": name, "samples": samples,
            "bounds": NHCB_BOUNDS,
            "expected_buckets": buckets,
            "expected_q50": nhcb_quantile(50, cents, NHCB_BOUNDS),
            "expected_q90": nhcb_quantile(90, cents, NHCB_BOUNDS),
        })
    return C


if __name__ == "__main__":
    fixtures = {
        "nh_wide": nh_wide_cases(),
        "nhcb": nhcb_cases(),
        "rate": rate_cases(),
        "increase": increase_cases(),
        "histogram_quantile": hq_cases(),
        "holt_winters": hw_cases(),
        "irate": irate_cases(),
        "resets": resets_cases(),
        "changes": changes_cases(),
        "idelta": idelta_cases(),
        "delta": delta_cases(),
        "deriv": deriv_cases(),
        "predict_linear": predict_linear_cases(),
        "histogram_fraction": hf_cases(),
        "quantile_over_time": qot_cases(),
        "mad_over_time": mad_cases(),
        "stdvar_over_time": stdvar_cases(),
        "topk_bottomk": topk_bottomk_cases(),
        "quantile_agg": quantile_agg_cases(),
        "stddev_agg": stddev_agg_cases(),
        "count_values": count_values_cases(),
        "over_time": over_time_cases(),
        "ts_of": ts_of_cases(),
        "round": round_cases(),
        "native_histogram": native_histogram_cases(),
    }
    n = sum(len(v) for v in fixtures.values())
    out = os.path.join(os.path.dirname(__file__), "..",
                       "src", "test", "resources", "promql_fixtures.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(fixtures, f, indent=1, sort_keys=True)
    print(f"{n} cases written to {out}")
    for op, cases in fixtures.items():
        print(f"  {op}: {len(cases)}")
