"""From-scratch derivations of every shared quantile-family constant
(VERDICT r11 item 5 — the KDE bug class).

A numeric literal that appears in BOTH a key's Spark source and its
DuckDB oracle is replicated, not verified: hash parity stays green
even if the constant is wrong.  These tests break the circle by
re-deriving each constant from first principles — normal quantiles by
bisection on ``math.erf``, chi-square quantiles from the even-dof
closed-form CDF, the Kolmogorov 5% point from the theta-series, the
MAD consistency factor as 1/Phi^-1(3/4), the XmR chart constant as
3/d2 with d2 = E|X1 - X2| = 2/sqrt(pi), Silverman's 1.06 as
(4/3)^(1/5) — and then EXTRACTING the literal the engine actually
ships (from the build source / oracle SQL via the same regex
tools/constants_audit.py uses) and asserting it is the correct
rounding of the derived value at its printed precision.

No target literal is spelled anywhere in this file, so the test
cannot share a wrong constant with the engine — which is the whole
point (tools/constants_audit.py counts these chunks as independent
evidence precisely because the literals are absent).
"""

from __future__ import annotations

import inspect
import math
import re

import pytest

from etl_cnc_spark.registry import load_all

REGISTRY = load_all()

_NUM_RE = re.compile(
    r"(?<![\w.])(\d+\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+|\d+)(?![\w.])"
)


def _engine_literals(key: str) -> list[str]:
    """Every numeric literal the key ships, as SOURCE STRINGS (build
    function source + module constants + oracle SQL), so the printed
    precision is observable."""
    q = REGISTRY[key]
    texts = [q.oracle or ""]
    try:
        src = inspect.getsource(q.build)
        texts.append(src)
        # hoisted module-level constants referenced by name
        texts.append(inspect.getsource(inspect.getmodule(q.build)))
    except (OSError, TypeError):
        pass
    out: list[str] = []
    for t in texts[:2]:  # build src + oracle: the shipping surfaces
        out.extend(_NUM_RE.findall(t))
    # module source only as fallback when the first two miss
    if len(texts) > 2:
        out.extend(_NUM_RE.findall(texts[2]))
    return out


def _candidates(key: str) -> list[tuple[float, int, str]]:
    """(value, effective_decimals, spelled) for every literal, plus
    power-of-ten DESCALINGS of integer literals — the fixed-point
    discipline ships quantile constants as z*1e4-style scaled
    integers (orders_safety_stock), and a scaled copy of a wrong
    constant is exactly as dangerous."""
    out: list[tuple[float, int, str]] = []
    for s in _engine_literals(key):
        v = float(s)
        mantissa, _, exp = s.replace("E", "e").partition("e")
        frac = len(mantissa.split(".")[1]) if "." in mantissa else 0
        decimals = max(0, frac - int(exp or 0))  # 12321e-4 → 4 decimals
        out.append((v, decimals, s))
        if decimals == 0 and not exp:
            for k in range(1, 7):
                out.append((v / 10.0**k, k, f"{s}e-{k}"))
    return out


def _own_decimal_literals(key: str) -> list[tuple[float, int, str]]:
    """Decimal-spelled literals (a '.' or an exponent — bare integers
    are query parameters/years, not formula coefficients) from the
    key's OWN shipping surface only: build source + oracle SQL, no
    module fallback."""
    q = REGISTRY[key]
    texts = [q.oracle or ""]
    try:
        texts.append(inspect.getsource(q.build))
    except (OSError, TypeError):
        pass
    out: list[tuple[float, int, str]] = []
    for t in texts:
        for s in _NUM_RE.findall(t):
            if "." not in s and "e" not in s and "E" not in s:
                continue
            mantissa, _, exp = s.replace("E", "e").partition("e")
            frac = len(mantissa.split(".")[1]) if "." in mantissa else 0
            decimals = max(0, frac - int(exp or 0))
            out.append((float(s), decimals, s))
    return out


def _assert_ships_rounding_of(
    key: str, derived: float, siblings: tuple = ()
) -> None:
    """Two tiers (ADVICE r12 — the previous global argmin could latch
    onto a coincidental nearby literal and mask a wrong shipped
    constant):

    1. EXISTENCE: some literal on the key's surfaces (build source +
       oracle, module-constant fallback, power-of-ten descalings of
       integers) is ``derived`` correctly rounded at >= 2 effective
       decimals.
    2. CLEAN NEIGHBORHOOD: on the key's OWN surface (build source +
       oracle only — module-wide literals belong to other keys'
       formulas), every decimal-spelled literal within 2% of
       ``derived`` must be a correct rounding of ``derived`` or of a
       declared SIBLING derivation (itself computed from scratch,
       e.g. Wilson's conventional-z family z^2 and z^2/2).  A wrong
       constant near the right value — the dangerous class — now
       trips the assert no matter what else the source contains."""
    cands = _candidates(key)
    assert cands, f"{key}: no numeric literals found"
    exact = [
        (v, decimals, spelled)
        for v, decimals, spelled in cands
        if decimals >= 2 and abs(v - derived) <= 0.5 * 10.0 ** (-decimals) + 1e-12
    ]
    assert exact, (
        f"{key}: no literal (>=2 effective decimals) is the correct "
        f"rounding of the from-scratch derivation {derived:.8f}"
    )
    targets = [derived] + [fn() for fn in siblings]
    for v, decimals, spelled in _own_decimal_literals(key):
        if decimals < 2 or abs(v - derived) > 0.02 * abs(derived):
            continue
        tol = 0.5 * 10.0 ** (-decimals)
        assert any(abs(v - t) <= tol + 1e-12 for t in targets), (
            f"{key}: own-surface literal {spelled} sits within 2% of "
            f"the derivation {derived:.8f} but is a correct rounding "
            f"of neither it nor any declared sibling "
            f"({[f'{t:.6f}' for t in targets]})"
        )


# --- first-principles machinery (math stdlib only) -------------------

def _phi(x: float) -> float:
    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


def _z(p: float) -> float:
    lo, hi = 0.0, 10.0
    for _ in range(200):
        mid = (lo + hi) / 2.0
        if _phi(mid) < p:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


def _chi2_cdf_even(x: float, k: int) -> float:
    assert k % 2 == 0
    m = k // 2
    s = sum((x / 2.0) ** j / math.factorial(j) for j in range(m))
    return 1.0 - math.exp(-x / 2.0) * s


def _chi2_q(p: float, k: int) -> float:
    lo, hi = 0.0, 200.0
    for _ in range(200):
        mid = (lo + hi) / 2.0
        if _chi2_cdf_even(mid, k) < p:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


def _kolmogorov_cdf(x: float) -> float:
    return 1.0 - 2.0 * sum(
        (-1.0) ** (j - 1) * math.exp(-2.0 * j * j * x * x) for j in range(1, 200)
    )


def _kolmogorov_q(p: float) -> float:
    lo, hi = 0.01, 5.0
    for _ in range(200):
        mid = (lo + hi) / 2.0
        if _kolmogorov_cdf(mid) < p:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


# --- machinery self-checks (identities, not table lookups) ----------

def test_normal_quantile_machinery():
    # Phi(z(p)) round-trips, symmetry, and the chi2(1) = z^2 identity
    for p in (0.75, 0.95, 0.975, 0.9975):
        assert abs(_phi(_z(p)) - p) < 1e-9
    # chi2(1) = z^2 for real (ADVICE r12 — the old assertion was
    # identically zero): the chi2 machinery here is even-dof only, so
    # check P(chi2_1 <= z_{0.975}^2) = 2*Phi(z_{0.975}) - 1 = 0.95
    # through the erf-based Phi, a genuinely different route
    v = _z(0.975) ** 2
    assert abs((2.0 * _phi(math.sqrt(v)) - 1.0) - 0.95) < 1e-9
    # chi2(2) quantile has the Exp(1/2) closed form -2 ln(1-p)
    for p in (0.5, 0.9, 0.95, 0.99):
        assert abs(_chi2_q(p, 2) - (-2.0 * math.log(1.0 - p))) < 1e-7
    # quantile/CDF round-trip at an even dof the engine actually uses
    assert abs(_chi2_cdf_even(_chi2_q(0.95, 4), 4) - 0.95) < 1e-9
    # median is zero
    assert abs(_z(0.5)) < 1e-9


def test_chi2_even_cdf_machinery():
    # chi2(2) is Exp(1/2): CDF = 1 - e^{-x/2}
    for x in (0.5, 1.0, 3.0, 7.0):
        assert abs(_chi2_cdf_even(x, 2) - (1.0 - math.exp(-x / 2.0))) < 1e-12
    # monotone in dof: bigger k shifts mass right
    assert _chi2_q(0.95, 4) > _chi2_q(0.95, 2)


def test_kolmogorov_cdf_machinery():
    # K is a CDF: increasing, K(small)~0, K(large)~1
    assert _kolmogorov_cdf(0.2) < 0.01
    assert _kolmogorov_cdf(3.0) > 0.9999
    assert _kolmogorov_cdf(1.5) > _kolmogorov_cdf(1.0)


# --- the engine constants, derived then extracted --------------------

Z975 = ("two-sided 5% normal quantile", lambda: _z(0.975))

DERIVATIONS: list[tuple[str, str, object]] = [
    # key, what the constant is, derivation
    ("ml_auc_delong_ci", *Z975),
    ("orders_bland_altman", *Z975),
    ("stat_mann_kendall", *Z975),
    ("stat_odds_ratio", *Z975),
    ("stat_sign_test", *Z975),
    ("stat_mann_whitney", *Z975),
    ("events_gehan_wilcoxon", *Z975),
    ("events_km_greenwood", *Z975),
    ("stat_wilson_ci", *Z975),
    ("orders_safety_stock", "one-sided 5% normal quantile", lambda: _z(0.95)),
    ("ml_chi2_select", "chi2(1) upper 5% = z_{0.975}^2", lambda: _z(0.975) ** 2),
    ("stat_mcnemar", "chi2(1) upper 5% = z_{0.975}^2", lambda: _z(0.975) ** 2),
    ("stat_bartlett", "chi2(4) upper 5%", lambda: _chi2_q(0.95, 4)),
    ("stat_levene", "F(4, inf) upper 5% = chi2(4)/4", lambda: _chi2_q(0.95, 4) / 4.0),
    ("stat_quade_test", "F(4, inf) upper 5% = chi2(4)/4", lambda: _chi2_q(0.95, 4) / 4.0),
    (
        "stat_dunn_posthoc",
        "Bonferroni z: two-sided 5% over C(5,2)=10 pairs",
        lambda: _z(1.0 - 0.05 / (2 * 10)),
    ),
    ("events_anomaly_mad", "MAD consistency 1/Phi^-1(3/4)", lambda: 1.0 / _z(0.75)),
    ("stat_mad_robust_scale", "MAD consistency 1/Phi^-1(3/4)", lambda: 1.0 / _z(0.75)),
    (
        "events_xmr_chart",
        "XmR constant 3/d2, d2 = E|X1-X2| = 2/sqrt(pi)",
        lambda: 3.0 / (2.0 / math.sqrt(math.pi)),
    ),
    ("stat_ks_test", "Kolmogorov 5% point", lambda: _kolmogorov_q(0.95)),
    (
        "stat_kde_gaussian",
        "Silverman rule-of-thumb (4/3)^(1/5)",
        lambda: (4.0 / 3.0) ** 0.2,
    ),
]


# Sibling constants: OTHER from-scratch-derived values a key's own
# surface legitimately ships near the primary derivation.  Wilson's
# score interval is SPECIFIED on the conventional two-decimal z and
# carries its square and half-square — derived here by rounding the
# bisection z to the spec's two decimals, never by spelling any
# target literal (this file's discipline).
SIBLINGS: dict[str, tuple] = {
    "stat_wilson_ci": (
        lambda: round(_z(0.975), 2) ** 2,
        lambda: round(_z(0.975), 2) ** 2 / 2.0,
    ),
}


@pytest.mark.parametrize(
    "key,what,derive", DERIVATIONS, ids=[k for k, _, _ in DERIVATIONS]
)
def test_shared_constant_is_correct_rounding(key, what, derive):
    assert key in REGISTRY, key
    _assert_ships_rounding_of(key, derive(), SIBLINGS.get(key, ()))
