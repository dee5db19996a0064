"""Independent Python replications of the round-12 session-4
nonparametric batch (statsnonparam_queries): Friedman, Brown-Forsythe,
Mood's median, Wilcoxon signed-rank, Brunner-Munzel, runs test,
Ljung-Box panel, Durbin-Watson — each recomputed from the raw parquet
with plain Python (textbook formulas, brute-force midranks) and
compared exactly on integer components / to 1e-6 relative on the fixed
double expressions (the test_round12_queries discipline: a cross-engine
hash match cannot catch a formula error present in BOTH engines)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import numpy as np
import pytest

from wikipedia_data_pipeline_spark import registry

US_PER_DAY = 86_400_000_000
US_PER_HOUR = 3_600_000_000


@pytest.fixture(scope="module")
def queries():
    return registry.spark_queries()


def _events(sf_dir):
    return duckdb.sql(
        "SELECT event_id, user_id, event_type, value, epoch_us(ts) AS t_us"
        f" FROM read_parquet('{sf_dir}/events.parquet') ORDER BY event_id"
    ).fetchall()


def _approx(a, b, rel=1e-6):
    assert a == pytest.approx(b, rel=rel), (a, b)


def _midranks(values):
    """value -> tie-averaged (mid) rank, 1-based, over the multiset."""
    c = Counter(values)
    out = {}
    cum = 0
    for v in sorted(c):
        t = c[v]
        out[v] = cum + (t + 1) / 2.0
        cum += t
    return out


def test_friedman_matches_bruteforce(spark, sf_dir, queries):
    rows = _events(sf_dir)
    cells = Counter(
        (t_us // US_PER_DAY, g) for _, _, g, _, t_us in rows
    )
    types = sorted({g for _, _, g, _, _ in rows})
    k = len(types)
    days = sorted({d for d, _ in cells})
    full = [d for d in days if all((d, g) in cells for g in types)]
    n = len(full)
    rank_sum = defaultdict(float)
    sum_r_sq = 0.0
    for d in full:
        obs = {g: cells[(d, g)] for g in types}
        mr = _midranks(list(obs.values()))
        for g in types:
            r = mr[obs[g]]
            rank_sum[g] += r
            sum_r_sq += r * r
    num = (k - 1) * sum(
        (rank_sum[g] - n * (k + 1) / 2.0) ** 2 for g in types
    )
    den = sum_r_sq - n * k * (k + 1) ** 2 / 4.0
    q_expect = num / den
    got = {
        r["event_type"]: r
        for r in queries["stats_friedman_test"](spark, sf_dir).collect()
    }
    assert set(got) == set(types)
    for g in types:
        assert got[g]["n_blocks"] == n
        assert got[g]["k_treatments"] == k
        # s2_sum is the DOUBLED rank sum
        _approx(got[g]["s2_sum"], 2.0 * rank_sum[g], rel=1e-12)
        _approx(got[g]["q_stat"], q_expect)


def _round_half_away(x):
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_brown_forsythe_matches_bruteforce(spark, sf_dir, queries):
    rows = _events(sf_dir)
    by_g = defaultdict(list)
    for _, _, g, v, _ in rows:
        by_g[g].append(v)
    meds = {g: float(np.percentile(xs, 50)) for g, xs in by_g.items()}
    # replicate the row-level micro quantization (exactness contract)
    z = {
        g: [_round_half_away(abs(v - meds[g]) * 1e6) / 1e6 for v in xs]
        for g, xs in by_g.items()
    }
    k = len(z)
    n = sum(len(xs) for xs in z.values())
    zbar = sum(sum(xs) for xs in z.values()) / n
    between = sum(
        len(xs) * (sum(xs) / len(xs) - zbar) ** 2 for xs in z.values()
    )
    within = sum(
        sum((x - sum(xs) / len(xs)) ** 2 for x in xs)
        for xs in z.values()
    )
    f_expect = (n - k) / (k - 1) * between / within
    got = {
        r["event_type"]: r
        for r in queries["stats_brown_forsythe"](spark, sf_dir).collect()
    }
    for g in by_g:
        assert got[g]["n_g"] == len(by_g[g])
        _approx(got[g]["med_g"], meds[g], rel=1e-12)
        _approx(got[g]["zbar_g"], sum(z[g]) / len(z[g]))
        _approx(got[g]["f_stat"], f_expect)


def test_mood_median_matches_bruteforce(spark, sf_dir, queries):
    rows = _events(sf_dir)
    vals = [v for _, _, _, v, _ in rows]
    m = float(np.percentile(vals, 50))
    by_g = defaultdict(lambda: [0, 0])  # [n_g, a_g]
    for _, _, g, v, _ in rows:
        by_g[g][0] += 1
        by_g[g][1] += 1 if v > m else 0
    n = sum(c[0] for c in by_g.values())
    a = sum(c[1] for c in by_g.values())
    chi2 = 0.0
    for n_g, a_g in by_g.values():
        e = n_g * a / n
        f = n_g * (n - a) / n
        chi2 += (a_g - e) ** 2 / e + ((n_g - a_g) - f) ** 2 / f
    got = {
        r["event_type"]: r
        for r in queries["stats_mood_median_test"](spark, sf_dir).collect()
    }
    for g, (n_g, a_g) in by_g.items():
        assert got[g]["n_g"] == n_g
        assert got[g]["a_g"] == a_g
        _approx(got[g]["chi2_stat"], chi2)


def test_wilcoxon_signed_rank_matches_bruteforce(spark, sf_dir, queries):
    rows = _events(sf_dir)
    per_user = defaultdict(lambda: [0, 0])
    for _, u, g, _, _ in rows:
        if g == "view":
            per_user[u][0] += 1
        elif g == "click":
            per_user[u][1] += 1
    d = [v - c for v, c in per_user.values() if v != c]
    n = len(d)
    mr = _midranks([abs(x) for x in d])
    w_plus = sum(mr[abs(x)] for x in d if x > 0)
    t_runs = Counter(abs(x) for x in d)
    tie3 = sum(t**3 - t for t in t_runs.values())
    z = (w_plus - n * (n + 1) / 4.0) / math.sqrt(
        n * (n + 1) * (2 * n + 1) / 24.0 - tie3 / 48.0
    )
    got = queries["stats_wilcoxon_signed_rank"](spark, sf_dir).collect()[0]
    assert got["n"] == n
    _approx(got["w2_plus"], 2.0 * w_plus, rel=1e-12)
    assert got["tie3"] == tie3
    _approx(got["z_stat"], z)


def test_brunner_munzel_matches_bruteforce(spark, sf_dir, queries):
    rows = _events(sf_dir)
    x1 = [v for _, _, g, v, _ in rows if g == "view"]
    x2 = [v for _, _, g, v, _ in rows if g == "click"]
    pooled_mr = _midranks(x1 + x2)
    mr1, mr2 = _midranks(x1), _midranks(x2)
    p1 = [pooled_mr[v] - mr1[v] for v in x1]
    p2 = [pooled_mr[v] - mr2[v] for v in x2]
    n1, n2 = len(x1), len(x2)
    pbar1, pbar2 = sum(p1) / n1, sum(p2) / n2
    s1_sq = sum((p - pbar1) ** 2 for p in p1) / (n1 - 1)
    s2_sq = sum((p - pbar2) ** 2 for p in p2) / (n2 - 1)
    p_hat = pbar2 / n1
    w = (p_hat - 0.5) / math.sqrt(
        s1_sq / (n1 * n2 * n2) + s2_sq / (n2 * n1 * n1)
    )
    got = queries["stats_brunner_munzel"](spark, sf_dir).collect()[0]
    assert (got["n1"], got["n2"]) == (n1, n2)
    _approx(got["p_hat"], p_hat)
    _approx(got["s1_sq"], s1_sq)
    _approx(got["s2_sq"], s2_sq)
    _approx(got["w_bm"], w)


def _hourly_counts_py(rows):
    hc = Counter(t_us // US_PER_HOUR for _, _, _, _, t_us in rows)
    return [hc[h] for h in sorted(hc)], sorted(hc)


def test_runs_test_matches_bruteforce(spark, sf_dir, queries):
    rows = _events(sf_dir)
    xs, _ = _hourly_counts_py(rows)
    m = float(np.percentile([float(x) for x in xs], 50))
    signs = [1 if x > m else 0 for x in xs if x != m]
    n1 = sum(signs)
    n2 = len(signs) - n1
    runs = 1 + sum(
        1 for a, b in zip(signs, signs[1:]) if a != b
    ) if signs else 0
    nt = n1 + n2
    mu = 2.0 * n1 * n2 / nt + 1.0
    sig = math.sqrt(
        2.0 * n1 * n2 * (2.0 * n1 * n2 - nt) / (nt * nt * (nt - 1.0))
    )
    got = queries["stats_runs_test"](spark, sf_dir).collect()[0]
    assert (got["n1"], got["n2"], got["n_runs"]) == (n1, n2, runs)
    _approx(got["z_stat"], (runs - mu) / sig)


def test_ljung_box_matches_bruteforce(spark, sf_dir, queries):
    rows = _events(sf_dir)
    hc = Counter(t_us // US_PER_HOUR for _, _, _, _, t_us in rows)
    n = len(hc)
    xbar = sum(hc.values()) / n
    den = sum((x - xbar) ** 2 for x in hc.values())
    got = sorted(
        queries["stats_ljung_box"](spark, sf_dir).collect(),
        key=lambda r: r["lag"],
    )
    q = 0.0
    for k in range(1, 7):
        pairs = [
            (hc[h], hc[h - k]) for h in hc if (h - k) in hc
        ]
        num = sum((a - xbar) * (b - xbar) for a, b in pairs)
        rho = num / den
        q += n * (n + 2) * rho * rho / (n - k)
        r = got[k - 1]
        assert r["lag"] == k
        assert r["n_pairs"] == len(pairs)
        _approx(r["rho"], rho)
        _approx(r["q_lb"], q)


def test_durbin_watson_matches_bruteforce(spark, sf_dir, queries):
    rows = _events(sf_dir)
    hv = defaultdict(int)
    for _, _, _, v, t_us in rows:
        hv[t_us // US_PER_HOUR] += _round_half_away(v * 1e6)
    vs = [hv[h] / 1e6 for h in sorted(hv)]
    n = len(vs)
    ts = list(range(1, n + 1))
    tbar, vbar = sum(ts) / n, sum(vs) / n
    b = sum((t - tbar) * (v - vbar) for t, v in zip(ts, vs)) / sum(
        (t - tbar) ** 2 for t in ts
    )
    a = vbar - b * tbar
    e = [v - a - b * t for t, v in zip(ts, vs)]
    dw = sum((x - y) ** 2 for x, y in zip(e[1:], e)) / sum(
        x * x for x in e
    )
    got = queries["stats_durbin_watson"](spark, sf_dir).collect()[0]
    assert got["n_hours"] == n
    _approx(got["slope_per_hour"], b)
    # the engine milli-quantizes residuals (exactness contract);
    # quantization error on |e|~1e2-1e4 is ~1e-7 relative
    _approx(got["dw_stat"], dw, rel=1e-4)


def test_anderson_darling_2s_matches_bruteforce(spark, sf_dir, queries):
    rows = _events(sf_dir)
    xa = sorted(v for _, u, _, v, _ in rows if u % 2 == 0)
    xb = sorted(v for _, u, _, v, _ in rows if u % 2 == 1)
    n1, n2 = len(xa), len(xb)
    n = n1 + n2
    ca, ct = Counter(xa), Counter(xa + xb)
    cum_a = cum_t = 0
    total = 0.0
    n_terms = 0
    for v in sorted(ct):
        t = ct[v]
        ma = ca.get(v, 0)
        cum_a += ma
        cum_t += t
        b2 = 2 * cum_t - t
        m2a = 2 * cum_a - ma
        m2b = 2 * (cum_t - cum_a) - (t - ma)
        den4 = b2 * (2 * n - b2) - n * t
        if den4 <= 0:
            continue
        n_terms += 1
        da, db = n * m2a - n1 * b2, n * m2b - n2 * b2
        total += _round_half_away(
            1e9 * t * (
                float(da) * da / (n1 * den4) + float(db) * db / (n2 * den4)
            )
        )
    a2 = (n - 1) / (n * n) * total / 1e9
    got = queries["stats_anderson_darling_2s"](spark, sf_dir).collect()[0]
    assert (got["n_a"], got["n_b"], got["n_terms"]) == (n1, n2, n_terms)
    _approx(got["a2_akn"], a2)
    # H0 sanity: the A/B split is a null comparison, E[A2_akN] ~ 1
    assert -2.0 < got["a2_akn"] < 10.0


def test_page_trend_matches_bruteforce(spark, sf_dir, queries):
    rows = _events(sf_dir)
    stages = {"view": 1, "click": 2, "signup": 3, "purchase": 4}
    cells = Counter(
        (t_us // US_PER_DAY, g)
        for _, _, g, _, t_us in rows
        if g in stages
    )
    days = sorted({d for d, _ in cells})
    full = [d for d in days if all((d, g) in cells for g in stages)]
    L = 0.0
    for d in full:
        obs = {g: cells[(d, g)] for g in stages}
        mr = _midranks(list(obs.values()))
        L += sum(stages[g] * mr[obs[g]] for g in stages)
    n = len(full)
    mu = n * 4 * 25 / 4.0
    sig = math.sqrt(n * 16 * 25 * 3 / 144.0)
    got = queries["stats_page_trend"](spark, sf_dir).collect()[0]
    assert got["n"] == n
    _approx(got["l2"], 2.0 * L, rel=1e-12)
    _approx(got["z_stat"], (L - mu) / sig)


def test_ansari_bradley_matches_bruteforce(spark, sf_dir, queries):
    rows = _events(sf_dir)
    x1 = [v for _, _, g, v, _ in rows if g == "view"]
    x2 = [v for _, _, g, v, _ in rows if g == "click"]
    n1, n2 = len(x1), len(x2)
    n = n1 + n2
    mr = _midranks(x1 + x2)
    score = {v: min(r, n + 1 - r) for v, r in mr.items()}
    ab = sum(score[v] for v in x1)
    sa = sum(score[v] for v in x1 + x2)
    saa = sum(score[v] ** 2 for v in x1 + x2)
    mu = n1 * sa / n
    var = n1 * n2 * (n * saa - sa * sa) / (n * n * (n - 1))
    got = queries["stats_ansari_bradley"](spark, sf_dir).collect()[0]
    assert (got["n1"], got["n2"]) == (n1, n2)
    _approx(got["ab2"], 2.0 * ab, rel=1e-12)
    _approx(got["z_stat"], (ab - mu) / math.sqrt(var))


def test_hodges_lehmann_matches_bruteforce(spark, sf_dir, queries):
    rows = _events(sf_dir)
    cx = sorted(
        _round_half_away(v * 100) for _, _, g, v, _ in rows if g == "view"
    )
    cy = sorted(
        _round_half_away(v * 100) for _, _, g, v, _ in rows if g == "click"
    )
    diffs = sorted(a - b for a in cx for b in cy)
    t = len(diffs)
    d_lo = diffs[(t + 1) // 2 - 1]
    d_hi = diffs[t // 2]
    got = queries["stats_hodges_lehmann"](spark, sf_dir).collect()[0]
    assert (got["n1"], got["n2"], got["t_pairs"]) == (len(cx), len(cy), t)
    assert got["hl_cents2"] == d_lo + d_hi
    _approx(got["hl_shift"], (d_lo + d_hi) / 200.0, rel=1e-12)
