"""Loguniform varying-maxExp sweep — pytest analog of the reference's
LoguniformWithVaryingMaxExpGenerator
(core/src/test/java/com/tdunning/math/stats/
LoguniformWithVaryingMaxExpGenerator.java:199-260, generateItem :339-354,
config core/resources/LoguniformWithVaryingMaxExpGenerator.conf).

The experiment: items are 10^((U-0.5)*2*maxExp) (loguniform) or
10^((U^2-0.5)*2*maxExp) (loguniform2), negated with probability 1/2, with
maxExp swept up to log10(DoubleMax/N) ~ 290 — i.e. the data spans up to
~580 DECADES. The digest's merge decisions depend only on ranks, so the
additive rank error of cdf() at probe points must stay BOUNDED as maxExp
grows (scale invariance); a digest whose interpolation leaked value
magnitudes into its error would diverge here. The reference plots this
curve; we assert its two properties: a flat absolute ceiling across the
sweep, and bounded growth relative to the smallest maxExp.

Error metric is the reference's own: rEst = cdf(item)*N + 0.5 probed at
equi-spaced true ranks, with ties widening the true rank to an interval
[rTrueMin, rTrueMax] and only the distance OUTSIDE the interval counting
(LoguniformWithVaryingMaxExpGenerator.java:222-247).
"""

import numpy as np
import pytest

from t_digest_spark.core import TDigest

N = 1 << 16
PROBES = 101
MAX_EXPS = (4, 40, 120, 200, 290)   # 290 ~ log10(DoubleMax / N)
DELTA = 500.0                        # conf: Compression=500


def _gen(dist: str, max_exp: int, rng) -> np.ndarray:
    u = rng.uniform(0, 1, N)
    if dist == "loguniform":
        x = 10.0 ** ((u - 0.5) * 2 * max_exp)
    elif dist == "loguniform2":
        x = 10.0 ** ((u ** 2 - 0.5) * 2 * max_exp)
    else:
        raise ValueError(dist)
    # NegativeNumbers=true: each sample negated with probability 1/2
    return x * np.where(rng.uniform(0, 1, N) < 0.5, -1.0, 1.0)


def _max_additive_rank_error(d: TDigest, srt: np.ndarray) -> float:
    worst = 0.0
    for t in range(PROBES + 1):
        r_true = min(int(np.ceil(t / PROBES * N)) + 1, N)
        item = srt[r_true - 1]
        rmin = np.searchsorted(srt, item, side="left") + 1
        rmax = np.searchsorted(srt, item, side="right") + 1
        r_est = d.cdf(item) * N + 0.5
        if r_est < rmin:
            worst = max(worst, (rmin - r_est) / N)
        elif r_est > rmax:
            worst = max(worst, (r_est - rmax) / N)
    return worst


@pytest.mark.parametrize("dist", ["loguniform", "loguniform2"])
@pytest.mark.parametrize("scale", ["k2", "k2_glued"])
def test_rank_error_bounded_across_maxexp(dist, scale):
    errs = {}
    for max_exp in MAX_EXPS:
        rng = np.random.default_rng(42)
        data = _gen(dist, max_exp, rng)
        srt = np.sort(data)
        d = TDigest.from_values(data, delta=DELTA, scale=scale)
        d.compress()
        errs[max_exp] = _max_additive_rank_error(d, srt)

    # flat ceiling: even at 580 decades of spread the max additive rank
    # error stays in the delta=500 envelope (measured 0.008-0.028 across
    # the sweep; 0.04 = headroom over the worst observed point)
    assert max(errs.values()) <= 0.04, errs

    # bounded growth: widening the exponent range by 72x costs less than
    # 6x in rank error (the reference curve saturates, it does not diverge)
    assert errs[MAX_EXPS[-1]] <= 6.0 * max(errs[MAX_EXPS[0]], 1.0 / PROBES), errs
