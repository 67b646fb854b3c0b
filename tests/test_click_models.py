"""PBM click model: parity with a pure-Python EM reference (same
rounding, same fold order), hand-checkable first-iteration values, and
the position-bias recovery property the synthetic log is built for."""

from __future__ import annotations

import random

import pytest

from obp_search_engine_spark.operators.click_models import (
    pbm_attractiveness,
    pbm_em,
    pbm_examination,
)

_EPS = 1e-12


def _py_pbm(imps, iters):
    """Reference EM: imps = [(imp_id, q, d, p, c)]; folds in imp_id
    order, rounds to 6dp per M-step — the documented recipe."""
    imps = sorted(imps)
    a = {(q, d): 0.5 for _, q, d, _, _ in imps}
    g = {p: 0.5 for _, _, _, p, _ in imps}
    for _ in range(iters):
        av, gv = {}, {}
        for i, q, d, p, c in imps:
            if c == 1:
                av[i] = gv[i] = 1.0
            else:
                den = max(1.0 - a[(q, d)] * g[p], _EPS)
                av[i] = a[(q, d)] * (1.0 - g[p]) / den
                gv[i] = g[p] * (1.0 - a[(q, d)]) / den
        na, ng = {}, {}
        for i, q, d, p, c in imps:
            na.setdefault((q, d), []).append(av[i])
            ng.setdefault(p, []).append(gv[i])
        a = {k: round(sum_strict(v) / len(v), 6) for k, v in na.items()}
        g = {k: round(sum_strict(v) / len(v), 6) for k, v in ng.items()}
    return a, g


def sum_strict(xs):
    acc = 0.0
    for x in xs:
        acc = acc + x
    return acc


def _df(spark, imps):
    return spark.createDataFrame(
        imps, "imp_id long, q long, d long, p long, c long"
    )


def test_pbm_hand_case_one_iter(spark):
    # (q0,d0)@p1: clicked + unclicked; (q0,d1)@p2: unclicked.
    # init 0.5/0.5 -> unclicked contribution 0.25/0.75 = 1/3:
    # alpha(0,0)=mean(1,1/3)=0.666667, alpha(0,1)=0.333333,
    # gamma(1)=0.666667, gamma(2)=0.333333
    imps = [(1, 0, 0, 1, 1), (2, 0, 0, 1, 0), (3, 0, 1, 2, 0)]
    alphas, gammas = pbm_em(_df(spark, imps), iters=1)
    assert {(r.q, r.d): (r.alpha, r.n) for r in alphas.collect()} == {
        (0, 0): (0.666667, 2),
        (0, 1): (0.333333, 1),
    }
    assert {r.p: (r.gamma, r.n) for r in gammas.collect()} == {
        1: (0.666667, 2),
        2: (0.333333, 1),
    }


@pytest.mark.parametrize("iters", [1, 2, 3])
def test_pbm_matches_python_reference(spark, iters):
    rng = random.Random(11)
    imps = [
        (
            i,
            rng.randrange(4),
            rng.randrange(6),
            rng.randrange(1, 6),
            1 if rng.random() < 0.8 / (1 + 0.4 * (i % 5)) else 0,
        )
        for i in range(200)
    ]
    want_a, want_g = _py_pbm(imps, iters)
    alphas, gammas = pbm_em(_df(spark, imps), iters=iters)
    assert {(r.q, r.d): r.alpha for r in alphas.collect()} == want_a
    assert {r.p: r.gamma for r in gammas.collect()} == want_g


def test_pbm_partitioning_invariant(spark):
    imps = [
        (i, i % 3, i % 5, i % 4 + 1, 1 if i % (i % 4 + 3) == 0 else 0)
        for i in range(120)
    ]
    a1 = sorted(map(tuple, pbm_attractiveness(_df(spark, imps), 2).collect()))
    a2 = sorted(
        map(
            tuple,
            pbm_attractiveness(_df(spark, imps).repartition(13), 2).collect(),
        )
    )
    assert a1 == a2


def test_pbm_recovers_position_decay(spark):
    # clicks generated as alpha-free pure position decay with EXACT
    # realized rates (no sampling noise): 100 impressions per position,
    # click iff j % (p + 1) == 0, so CTR falls strictly with p and the
    # learned gamma curve must be strictly decreasing
    imps = [
        (p * 100 + j, j % 5, j % 8, p, 1 if j % (p + 1) == 0 else 0)
        for p in range(1, 7)
        for j in range(100)
    ]
    gammas = {r.p: r.gamma for r in pbm_examination(_df(spark, imps), 2).collect()}
    curve = [gammas[p] for p in sorted(gammas)]
    assert all(a > b for a, b in zip(curve, curve[1:]))


def test_pbm_all_clicked_cell_saturates(spark):
    # every impression of (q0,d0) clicked -> alpha pins to 1.0; the
    # 1e-12 denominator floor keeps the unclicked impression of the
    # OTHER pair finite even as its position's gamma rides high
    imps = [(1, 0, 0, 1, 1), (2, 0, 0, 1, 1), (3, 0, 1, 1, 0)]
    alphas, gammas = pbm_em(_df(spark, imps), iters=3)
    a = {(r.q, r.d): r.alpha for r in alphas.collect()}
    assert a[(0, 0)] == 1.0
    assert 0.0 <= a[(0, 1)] < 1.0
    assert all(r.gamma <= 1.0 for r in gammas.collect())


def test_pbm_iters_zero_rejected(spark):
    with pytest.raises(ValueError):
        pbm_em(_df(spark, [(1, 0, 0, 1, 1)]), iters=0)


# ---------------------------------------------------------------------------
# cascade model
# ---------------------------------------------------------------------------


def _sess_df(spark, rows):
    return spark.createDataFrame(
        rows, "s long, q long, d long, p long, c long"
    )


def test_cascade_hand_case(spark):
    from obp_search_engine_spark.operators.click_models import cascade_mle

    rows = [
        # session 0: click at p=2 -> p1,p2 examined, p3 not
        (0, 0, 10, 1, 0),
        (0, 0, 11, 2, 1),
        (0, 0, 12, 3, 0),
        # session 1: no click -> everything examined
        (1, 0, 10, 1, 0),
        (1, 0, 12, 2, 0),
        # session 2: clicks at p=1 AND p=3 -> only first counts;
        # p3's doc is NOT examined despite its raw c=1
        (2, 0, 11, 1, 1),
        (2, 0, 10, 2, 0),
        (2, 0, 12, 3, 1),
    ]
    got = {
        (r.q, r.d): (r.alpha, r.examined, r.clicks)
        for r in cascade_mle(_sess_df(spark, rows)).collect()
    }
    assert got == {
        # examined s0p1 + s1p1 (s2p2 sits behind s2's first click at p1)
        (0, 10): (0.0, 2, 0),
        # examined s0p2 + s2p1, first-clicked both times
        (0, 11): (1.0, 2, 2),
        # only s1p2 (no-click session examines everything); s0p3 and
        # s2p3 sit behind their sessions' first clicks — s2p3's raw
        # c=1 is ignored under the cascade
        (0, 12): (0.0, 1, 0),
    }


def test_cascade_never_examined_dropped(spark):
    from obp_search_engine_spark.operators.click_models import cascade_mle

    rows = [
        (0, 0, 1, 1, 1),   # click at p1
        (0, 0, 2, 2, 0),   # behind the click -> never examined
    ]
    got = cascade_mle(_sess_df(spark, rows)).collect()
    assert {(r.q, r.d) for r in got} == {(0, 1)}


# ---------------------------------------------------------------------------
# DCM (dependent click model)
# ---------------------------------------------------------------------------


def _py_dcm(rows):
    """Reference DCM MLE: rows = [(s, q, d, p, c)]. Examined prefix runs
    to the session's last click (whole list if none); alpha = clicks /
    examinations per (q, d); lambda_p = 1 - last-clicks/clicks."""
    lcp, np_ = {}, {}
    for s, q, d, p, c in rows:
        np_[s] = max(np_.get(s, 0), p)
        if c == 1:
            lcp[s] = max(lcp.get(s, 0), p)
    ex, ck = {}, {}
    lam_clicks, lam_last = {}, {}
    for s, q, d, p, c in rows:
        if p <= lcp.get(s, np_[s]):
            ex[(q, d)] = ex.get((q, d), 0) + 1
        ck[(q, d)] = ck.get((q, d), 0) + c
        if c == 1:
            lam_clicks[p] = lam_clicks.get(p, 0) + 1
            if p == lcp[s]:
                lam_last[p] = lam_last.get(p, 0) + 1
    alphas = {
        k: (round(ck.get(k, 0) / ex[k], 6), ex[k], ck.get(k, 0))
        for k in ex
    }
    lambdas = {
        p: (
            round(1.0 - lam_last.get(p, 0) / n, 6),
            n,
            lam_last.get(p, 0),
        )
        for p, n in lam_clicks.items()
    }
    return alphas, lambdas


def test_dcm_hand_case(spark):
    from obp_search_engine_spark.operators.click_models import dcm_mle

    rows = [
        # session 0: clicks at p=1 and p=3 -> prefix 1..3 all examined,
        # BOTH clicks count (the multi-click behaviour cascade drops)
        (0, 0, 10, 1, 1),
        (0, 0, 11, 2, 0),
        (0, 0, 12, 3, 1),
        (0, 0, 13, 4, 0),   # behind the last click -> unexamined
        # session 1: no click -> whole list examined
        (1, 0, 10, 1, 0),
        (1, 0, 13, 2, 0),
    ]
    alphas, lambdas = dcm_mle(_sess_df(spark, rows))
    got_a = {
        (r.q, r.d): (r.alpha, r.examined, r.clicks)
        for r in alphas.collect()
    }
    assert got_a == {
        (0, 10): (0.5, 2, 1),
        (0, 11): (0.0, 1, 0),
        (0, 12): (1.0, 1, 1),
        (0, 13): (0.0, 1, 0),   # s0p4 unexamined; only s1p2 counts
    }
    got_l = {
        r.p: (r.lam, r.clicks, r.last_clicks) for r in lambdas.collect()
    }
    # p=1 clicked once, not the session's last click -> lambda 1.0;
    # p=3 clicked once, IS the last click -> lambda 0.0
    assert got_l == {1: (1.0, 1, 0), 3: (0.0, 1, 1)}


def test_dcm_matches_python_reference(spark):
    rng = random.Random(23)
    rows = []
    for s in range(60):
        q = rng.randrange(4)
        for p in range(1, rng.randrange(3, 8)):
            rows.append(
                (s, q, rng.randrange(9), p, 1 if rng.random() < 0.3 else 0)
            )
    want_a, want_l = _py_dcm(rows)
    alphas, lambdas = __import__(
        "obp_search_engine_spark.operators.click_models",
        fromlist=["dcm_mle"],
    ).dcm_mle(_sess_df(spark, rows))
    got_a = {
        (r.q, r.d): (r.alpha, r.examined, r.clicks)
        for r in alphas.collect()
    }
    got_l = {
        r.p: (r.lam, r.clicks, r.last_clicks) for r in lambdas.collect()
    }
    assert got_a == want_a
    assert got_l == want_l


def test_dcm_partitioning_invariant(spark):
    from obp_search_engine_spark.operators.click_models import dcm_mle

    rows = [
        (i // 5, i % 3, i % 7, i % 5 + 1, 1 if i % 4 == 0 else 0)
        for i in range(200)
    ]
    a1, l1 = dcm_mle(_sess_df(spark, rows))
    a2, l2 = dcm_mle(_sess_df(spark, rows).repartition(13))
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))
    assert sorted(map(tuple, l1.collect())) == sorted(map(tuple, l2.collect()))


def test_dcm_examines_at_least_cascade(spark):
    # DCM's examined prefix (to the LAST click) always contains the
    # cascade's (to the FIRST click), so per-(q,d) examination counts
    # dominate and every cascade-examined pair is DCM-examined
    from obp_search_engine_spark.operators.click_models import (
        cascade_mle,
        dcm_mle,
    )

    rows = [
        (i // 6, (i // 6) % 3, i % 11, i % 6 + 1, 1 if i % 3 == 0 else 0)
        for i in range(240)
    ]
    df = _sess_df(spark, rows)
    casc = {(r.q, r.d): r.examined for r in cascade_mle(df).collect()}
    dcm = {(r.q, r.d): r.examined for r in dcm_mle(df)[0].collect()}
    assert set(casc) <= set(dcm)
    assert all(dcm[k] >= casc[k] for k in casc)


# ---------------------------------------------------------------------------
# sDBN satisfaction
# ---------------------------------------------------------------------------


def test_sdbn_hand_case(spark):
    from obp_search_engine_spark.operators.click_models import (
        sdbn_satisfaction,
    )

    rows = [
        # session 0: clicks at p=1 (d=10) and p=3 (d=12) -> d12's click
        # is the last (satisfied), d10's is not
        (0, 0, 10, 1, 1),
        (0, 0, 11, 2, 0),
        (0, 0, 12, 3, 1),
        # session 1: single click on d10 -> last click (satisfied)
        (1, 0, 10, 1, 1),
        (1, 0, 12, 2, 0),
    ]
    got = {
        (r.q, r.d): (r.sat, r.clicks, r.last_clicks)
        for r in sdbn_satisfaction(_sess_df(spark, rows)).collect()
    }
    assert got == {
        (0, 10): (0.5, 2, 1),   # clicked twice, satisfied once
        (0, 12): (1.0, 1, 1),
    }
    # d=11 never clicked -> no evidence -> dropped
    assert (0, 11) not in got


def test_sdbn_matches_python_reference(spark):
    from obp_search_engine_spark.operators.click_models import (
        sdbn_satisfaction,
    )

    rng = random.Random(41)
    rows = []
    for s in range(80):
        q = rng.randrange(4)
        for p in range(1, rng.randrange(3, 8)):
            rows.append(
                (s, q, rng.randrange(9), p, 1 if rng.random() < 0.35 else 0)
            )
    lcp = {}
    for s, q, d, p, c in rows:
        if c == 1:
            lcp[s] = max(lcp.get(s, 0), p)
    want = {}
    for s, q, d, p, c in rows:
        if c == 1:
            ck, last = want.get((q, d), (0, 0))
            want[(q, d)] = (ck + 1, last + (1 if p == lcp[s] else 0))
    want = {
        k: (round(last / ck, 6), ck, last) for k, (ck, last) in want.items()
    }
    got = {
        (r.q, r.d): (r.sat, r.clicks, r.last_clicks)
        for r in sdbn_satisfaction(_sess_df(spark, rows)).collect()
    }
    assert got == want


# ---------------------------------------------------------------- UBM


from obp_search_engine_spark.operators.click_models import (  # noqa: E402
    ubm_attractiveness,
    ubm_em,
    ubm_examination,
    ubm_impressions,
)


def _py_ubm(sessions, iters):
    """Reference UBM EM over [(s, q, d, p, c)]: r = nearest click above
    p in s (0 if none); folds in imp_id = s*1024+p order, 6dp per
    M-step — the documented recipe."""
    imps = []
    by_s = {}
    for s, q, d, p, c in sessions:
        by_s.setdefault(s, []).append((p, c))
    for s, q, d, p, c in sessions:
        r = max((pp for pp, cc in by_s[s] if cc == 1 and pp < p), default=0)
        imps.append((s * 1024 + p, q, d, p, r, c))
    imps.sort()
    a = {(q, d): 0.5 for _, q, d, _, _, _ in imps}
    g = {(p, r): 0.5 for _, _, _, p, r, _ in imps}
    for _ in range(iters):
        av, gv = {}, {}
        for i, q, d, p, r, c in imps:
            if c == 1:
                av[i] = gv[i] = 1.0
            else:
                den = max(1.0 - a[(q, d)] * g[(p, r)], _EPS)
                av[i] = a[(q, d)] * (1.0 - g[(p, r)]) / den
                gv[i] = g[(p, r)] * (1.0 - a[(q, d)]) / den
        na, ng = {}, {}
        for i, q, d, p, r, c in imps:
            na.setdefault((q, d), []).append(av[i])
            ng.setdefault((p, r), []).append(gv[i])
        a = {k: round(sum_strict(v) / len(v), 6) for k, v in na.items()}
        g = {k: round(sum_strict(v) / len(v), 6) for k, v in ng.items()}
    return a, g


def _sess_df(spark, rows):
    return spark.createDataFrame(
        rows, "s long, q long, d long, p long, c long"
    )


def test_ubm_r_column(spark):
    # session 7: clicks at p=2 and p=4 -> r = 0,0,2,2,4 for p=1..5
    rows = [(7, 0, d, p, 1 if p in (2, 4) else 0) for p, d in enumerate(
        range(5), start=1)]
    got = {
        r.p: r.r
        for r in ubm_impressions(_sess_df(spark, rows)).collect()
    }
    assert got == {1: 0, 2: 0, 3: 2, 4: 2, 5: 4}


@pytest.mark.parametrize("iters", [1, 2])
def test_ubm_matches_python_reference(spark, iters):
    rng = random.Random(23)
    rows = []
    for s in range(12):
        for p in range(1, 6):
            rows.append(
                (s, s % 3, rng.randrange(6), p, int(rng.random() < 0.3))
            )
    alphas, gammas = ubm_em(_sess_df(spark, rows), iters=iters)
    ref_a, ref_g = _py_ubm(rows, iters)
    assert {(r.q, r.d): r.alpha for r in alphas.collect()} == ref_a
    assert {(r.p, r.r): r.gamma for r in gammas.collect()} == ref_g


def test_ubm_partitioning_invariant(spark):
    rng = random.Random(5)
    rows = [
        (s, s % 2, rng.randrange(4), p, int(rng.random() < 0.4))
        for s in range(10)
        for p in range(1, 5)
    ]
    df = _sess_df(spark, rows)
    one = {
        (r.q, r.d): r.alpha
        for r in ubm_attractiveness(df.coalesce(1), iters=2).collect()
    }
    many = {
        (r.q, r.d): r.alpha
        for r in ubm_attractiveness(df.repartition(13), iters=2).collect()
    }
    assert one == many


def test_ubm_examination_gap_decay(spark):
    # after a click at p-1 (r = p-1, gap 1) docs are examined (clicked)
    # far more often than at gap 4 — UBM must rank gamma(gap 1) above
    # gamma(gap 4) where PBM would average them away
    rng = random.Random(41)
    rows = []
    for s in range(300):
        clicked_first = True  # click at p=1 always
        for p in range(1, 7):
            if p == 1:
                c = 1
            else:
                gap = p - 1  # last click stays at 1 unless re-clicked
                c = int(rng.random() < (0.8 / gap))
            rows.append((s, 0, p, p, c))
    gam = {
        (r.p, r.r): r.gamma
        for r in ubm_examination(_sess_df(spark, rows), iters=2).collect()
    }
    assert gam[(2, 1)] > gam[(6, 1)]


def test_ubm_iters_zero_rejected(spark):
    with pytest.raises(ValueError):
        ubm_em(_sess_df(spark, [(1, 0, 0, 1, 1)]), iters=0)
