"""Exact-enough classical statistics utilities with NO scipy dependency.

Student-t quantiles for the Generalized ESD test (Rosner,
Technometrics 1983). The t CDF is evaluated through the regularized
incomplete beta function I_x(a, b) (DLMF §8.17 relation
P(T<=t) = 1 - I_{nu/(nu+t^2)}(nu/2, 1/2) / 2 for t >= 0), with I_x
computed by the standard Lentz continued-fraction expansion (public
algorithm — DLMF 8.17.22 / Numerical Recipes §6.4 form), and the
quantile recovered by bisection to ~1e-13. Everything here is pure
deterministic float64 arithmetic: the same inputs produce the same
bits on every run and host, which is what lets GESD critical values be
inlined as literals into BOTH the Spark plan and the DuckDB oracle.
"""

from __future__ import annotations

import math

__all__ = ["betainc_reg", "student_t_cdf", "student_t_ppf", "gesd_lambdas"]


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta (Lentz's method)."""
    MAXIT, EPS, FPMIN = 200, 3e-16, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < EPS:
            return h
    raise ArithmeticError("betacf did not converge (a,b,x too extreme)")


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b), 0 <= x <= 1."""
    if not 0.0 <= x <= 1.0:
        raise ValueError(f"x={x} outside [0, 1]")
    if x == 0.0 or x == 1.0:
        return x
    ln_bt = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log1p(-x)
    )
    bt = math.exp(ln_bt)
    # use the continued fraction directly where it converges fast,
    # else via the symmetry relation
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def student_t_cdf(t: float, nu: float) -> float:
    """P(T <= t) for T ~ Student-t with nu degrees of freedom."""
    if nu <= 0:
        raise ValueError("nu must be positive")
    if t == 0.0:
        return 0.5
    ib = betainc_reg(nu / 2.0, 0.5, nu / (nu + t * t))
    return 1.0 - 0.5 * ib if t > 0 else 0.5 * ib


def student_t_ppf(p: float, nu: float) -> float:
    """Quantile of the Student-t distribution by bisection (monotone CDF;
    ~60 halvings to ~1e-13 relative — deterministic, no seed, no scipy)."""
    if not 0.0 < p < 1.0:
        raise ValueError(f"p={p} outside (0, 1)")
    if p == 0.5:
        return 0.0
    if p < 0.5:
        return -student_t_ppf(1.0 - p, nu)
    lo, hi = 0.0, 2.0
    while student_t_cdf(hi, nu) < p:
        hi *= 2.0
        if hi > 1e12:
            raise ArithmeticError("t quantile out of range")
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if mid == lo or mid == hi:
            break
        if student_t_cdf(mid, nu) < p:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def gesd_lambdas(n: int, max_k: int, alpha: float = 0.05) -> list[float]:
    """Critical values lambda_i, i = 1..max_k, of the Generalized ESD
    test at sample size n (Rosner 1983): with p = 1 - alpha/(2(n-i+1))
    and t = t_{p, n-i-1},

        lambda_i = (n - i) * t / sqrt((n - i - 1 + t^2) * (n - i + 1))

    Requires n - max_k - 1 >= 1 (a std is still defined in the last
    round). Deterministic float64 — safe to inline as plan literals."""
    if n - max_k - 1 < 1:
        raise ValueError(f"n={n} too small for max_k={max_k}")
    out = []
    for i in range(1, max_k + 1):
        p = 1.0 - alpha / (2.0 * (n - i + 1))
        t = student_t_ppf(p, n - i - 1)
        lam = (n - i) * t / math.sqrt((n - i - 1 + t * t) * (n - i + 1))
        out.append(lam)
    return out
