"""Hand-fused (value, gradient, Hessian) for every T2 fit objective.

These are the per-iteration inner loops of the fused Pallas kernels: each
function takes parameter arrays of ANY shape (VPU tiles in the kernel,
scalars in tests) plus the per-TE signal arrays, unrolls the echo axis in
Python (T = 3..8, static), and returns (f, g, H) with g/H as tuples — pure
elementwise jnp ops, no stacking, no autodiff machinery.

Why not ``jax.hessian``: the forward-over-reverse Hessian re-evaluates the
primal in every sweep (~4-6x the transcendental count), and transcendentals
dominate the fit's runtime. The algebra here is verified against autodiff of
models.signal's objectives in tests/test_fgh.py.

Objectives (numerically identical to reference run_t2mapping.py:129-177):
- gaussian:        f = mean_t (s - k e)^2,           e = exp(-te/t2)
- gaussian_rician: f = mean_t (s - sqrt(k^2 e^2 + sigma^2))^2
- rician:          f = -sum_t [log s - log sigma^2 - (|s|-|m|)^2/(2 sigma^2)
                              + log i0e(x)],         x = m s / sigma^2, m = k e

The rician form is the algebraic identity -(s^2+m^2)/(2 sg^2) + |x| =
-(|s|-|m|)^2/(2 sg^2) applied to the reference's expression
(run_t2mapping.py:157-177, which evaluates the two huge terms separately).
At a pinned-sigma corner the separate terms reach ~1e10 while their
difference is O(1), so the reference order loses ALL fp32 significance and
its value depends on codegen fma fusion (measured: interpret-vs-Mosaic
objective diff of 2.5 at identical parameters). The squared-difference form
is exact in the same algebra and fp32-stable for every x.
"""

from __future__ import annotations

import jax.numpy as jnp

# ---------------------------------------------------------------- Bessel
# Abramowitz & Stegun 9.8.1-9.8.4 polynomial approximations (|eps|<2e-7),
# expressed on the exponentially-scaled functions so large x never overflows.

_I0_SMALL = (1.0, 3.5156229, 3.0899424, 1.2067492, 0.2659732, 0.0360768, 0.0045813)
_I0_LARGE = (0.39894228, 0.01328592, 0.00225319, -0.00157565, 0.00916281,
             -0.02057706, 0.02635537, -0.01647633, 0.00392377)
_I1_SMALL = (0.5, 0.87890594, 0.51498869, 0.15084934, 0.02658733, 0.00301532,
             0.00032411)
_I1_LARGE = (0.39894228, -0.03988024, -0.00362018, 0.00163801, -0.01031555,
             0.02282967, -0.02895312, 0.01787654, -0.00420059)


def _poly(coeffs, z):
    acc = jnp.full_like(z, coeffs[-1])
    for c in reversed(coeffs[:-1]):
        acc = acc * z + c
    return acc


def i0e(x):
    """exp(-|x|) * I0(x), elementwise, fp32-safe for all x >= 0."""
    x = jnp.abs(x)
    small = _poly(_I0_SMALL, jnp.square(x / 3.75)) * jnp.exp(-x)
    r = 3.75 / jnp.maximum(x, 3.75)
    large = _poly(_I0_LARGE, r) / jnp.sqrt(jnp.maximum(x, 3.75))
    return jnp.where(x < 3.75, small, large)


def i1e(x):
    """exp(-|x|) * I1(x) for x >= 0 (odd part folded into caller)."""
    x = jnp.abs(x)
    small = _poly(_I1_SMALL, jnp.square(x / 3.75)) * x * jnp.exp(-x)
    r = 3.75 / jnp.maximum(x, 3.75)
    large = _poly(_I1_LARGE, r) / jnp.sqrt(jnp.maximum(x, 3.75))
    return jnp.where(x < 3.75, small, large)


def bessel_ratio(x):
    """R(x) = I1(x)/I0(x), the score of the Rician log-likelihood."""
    return i1e(x) / jnp.maximum(i0e(x), 1e-30)


# -------------------------------------------------------------- gaussian
def gaussian_fgh(params, s, te):
    """(f, (g_k, g_t2), ((h_kk, h_kt), (h_kt, h_tt))) for the mean-SSE
    mono-exponential objective. params = (k, t2) arrays of any shape;
    s = list of per-TE signal arrays; te = static float tuple."""
    k, t2 = params
    inv_t = 1.0 / len(te)
    u_inv = -1.0 / t2
    e = [jnp.exp(t * u_inv) for t in te]
    m = [k * et for et in e]
    r = [st - mt for st, mt in zip(s, m)]
    u = [t / (t2 * t2) for t in te]
    dm_t = [mt * ut for mt, ut in zip(m, u)]

    f = sum(rt * rt for rt in r) * inv_t
    g_k = -2.0 * inv_t * sum(rt * et for rt, et in zip(r, e))
    g_t = -2.0 * inv_t * sum(rt * dt for rt, dt in zip(r, dm_t))
    h_kk = 2.0 * inv_t * sum(et * et for et in e)
    h_kt = 2.0 * inv_t * sum(et * ut * (mt - rt)
                             for et, ut, mt, rt in zip(e, u, m, r))
    d2m_tt = [dt * ut - 2.0 * mt * ut / t2 for dt, ut, mt in zip(dm_t, u, m)]
    h_tt = 2.0 * inv_t * sum(dt * dt - rt * d2
                             for dt, rt, d2 in zip(dm_t, r, d2m_tt))
    return f, (g_k, g_t), ((h_kk, h_kt), (h_kt, h_tt))


def gaussian_value(params, s, te):
    k, t2 = params
    u_inv = -1.0 / t2
    r = [st - k * jnp.exp(t * u_inv) for st, t in zip(s, te)]
    return sum(rt * rt for rt in r) / len(te)


# ------------------------------------------------------- gaussian_rician
def gaussian_rician_fgh(params, s, te, e_list=None):
    """Full-Newton (f, g, H) of the first-moment Rician-corrected mean-SSE.

    Model M = sqrt(q), q = a^2 + sigma^2, a = k exp(-te/t2). Second
    derivatives via d2M = d2q/(2M) - dq_x dq_y/(4 M^3).

    e_list: optional precomputed [exp(-te_i/t2)] at ``params`` (the fused
    kernels carry it across iterations, making this pass exp-free)."""
    k, t2, sg = params
    inv_t = 1.0 / len(te)
    u_inv = -1.0 / t2
    f = jnp.zeros_like(k)
    g = [jnp.zeros_like(k) for _ in range(3)]
    h = [[jnp.zeros_like(k) for _ in range(3)] for _ in range(3)]
    sg2 = sg * sg
    for i_te, (st, t) in enumerate(zip(s, te)):
        e = jnp.exp(t * u_inv) if e_list is None else e_list[i_te]
        a = k * e
        u = t / (t2 * t2)
        a2 = a * a
        q = a2 + sg2
        M = jnp.sqrt(jnp.maximum(q, 1e-30))
        r = st - M
        inv_m = 1.0 / M
        # dq/dtheta
        qk = 2.0 * k * e * e
        qt = 2.0 * a2 * u
        qs = 2.0 * sg
        # dM/dtheta = dq/(2M)
        mk = 0.5 * qk * inv_m
        mt = 0.5 * qt * inv_m
        ms = 0.5 * qs * inv_m
        # d2q/dtheta2
        qkk = 2.0 * e * e
        qkt = 4.0 * k * e * e * u
        qtt = 4.0 * a2 * u * (u - 1.0 / t2)
        qss = 2.0 * jnp.ones_like(k)
        inv_m3 = inv_m * inv_m * inv_m

        def d2m(qxy, qx, qy):
            return 0.5 * qxy * inv_m - 0.25 * qx * qy * inv_m3

        mkk = d2m(qkk, qk, qk)
        mkt = d2m(qkt, qk, qt)
        mtt = d2m(qtt, qt, qt)
        mss = d2m(qss, qs, qs)
        mks = d2m(0.0, qk, qs)
        mts = d2m(0.0, qt, qs)

        f = f + r * r * inv_t
        dm = (mk, mt, ms)
        d2 = ((mkk, mkt, mks), (mkt, mtt, mts), (mks, mts, mss))
        for i in range(3):
            g[i] = g[i] - 2.0 * inv_t * r * dm[i]
            for j in range(i, 3):
                h[i][j] = h[i][j] + 2.0 * inv_t * (dm[i] * dm[j] - r * d2[i][j])
    for i in range(3):
        for j in range(i):
            h[i][j] = h[j][i]
    return f, tuple(g), tuple(tuple(row) for row in h)


def gaussian_rician_value(params, s, te):
    return gaussian_rician_value_e(params, s, te)[0]


def gaussian_rician_value_e(params, s, te):
    """(objective, [exp(-te/t2)]) — the exponentials feed the next fgh call."""
    k, t2, sg = params
    u_inv = -1.0 / t2
    f = jnp.zeros_like(k)
    es = []
    for st, t in zip(s, te):
        e = jnp.exp(t * u_inv)
        es.append(e)
        a = k * e
        r = st - jnp.sqrt(a * a + sg * sg)
        f = f + r * r
    return f / len(te), es


# ---------------------------------------------------------------- rician
_LOG_EPS = 1e-20


def rician_fgh(params, s, te, e_list=None):
    """Full-Newton (f, g, H) of the negative Rician log-likelihood.

    Per echo: L = log s - log sg^2 - (|s|-|m|)^2/(2 sg^2) + log i0e(x),
    x = m s / sg^2, m = k exp(-te/t2); f = -sum L — the fp32-stable
    identity form of the reference objective (run_t2mapping.py:157-177;
    see the module docstring). Uses R = I1/I0 and R' = 1 - R/x - R^2;
    the x->0 limit of R/x is 1/2 (guarded).

    e_list: optional precomputed [exp(-te_i/t2)] at ``params``."""
    k, t2, sg = params
    u_inv = -1.0 / t2
    sg2 = sg * sg
    inv_s2 = 1.0 / sg2
    inv_s3 = inv_s2 / sg
    f = jnp.zeros_like(k)
    g = [jnp.zeros_like(k) for _ in range(3)]
    h = [[jnp.zeros_like(k) for _ in range(3)] for _ in range(3)]
    for i_te, (st, t) in enumerate(zip(s, te)):
        e = jnp.exp(t * u_inv) if e_list is None else e_list[i_te]
        m = k * e
        u = t / (t2 * t2)
        x = m * st * inv_s2
        R = bessel_ratio(x)
        # R/x -> 1/2 as x -> 0; switch to the series below the fp32 knee
        r_over_x = jnp.where(x > 1e-4, R / jnp.maximum(x, 1e-30),
                             0.5 - jnp.square(x) / 16.0)
        Rp = 1.0 - r_over_x - R * R

        # -(s^2+m^2)/(2sg^2) + |x| == -(|s|-|m|)^2/(2sg^2): the reference's
        # two-term order cancels ~1e10-magnitude fp32 values at a
        # pinned-sigma corner; this form is exact and codegen-stable
        d_sm = jnp.abs(st) - jnp.abs(m)
        L = (jnp.log(jnp.maximum(st, _LOG_EPS)) - jnp.log(sg2)
             - d_sm * d_sm * 0.5 * inv_s2
             + jnp.log(jnp.maximum(i0e(x), 1e-30)))
        f = f - L

        # dL/dm = (-m + R s)/sg^2 ; chain through m_k = e, m_t = m u
        core = (-m + R * st) * inv_s2
        gk = e * core
        gt = m * u * core
        gs = (-2.0 * sg2 + st * st + m * m - 2.0 * R * m * st) * inv_s3
        g[0] = g[0] - gk
        g[1] = g[1] - gt
        g[2] = g[2] - gs

        # shared: W = R' s^2/sg^2 - 1
        W = Rp * st * st * inv_s2 - 1.0
        hkk = e * e * inv_s2 * W
        hkt = e * u * (core * sg2 + m * W) * inv_s2
        htt = (m * u * (u - 2.0 / t2) * core
               + m * m * u * u * inv_s2 * W)
        hks = -2.0 * e * inv_s3 * (m * W + R * st)
        hts = -2.0 * m * u * inv_s3 * (m * W + R * st)
        dN = -4.0 * sg + 4.0 * Rp * m * m * st * st * inv_s3
        N = -2.0 * sg2 + st * st + m * m - 2.0 * R * m * st
        hss = dN * inv_s3 - 3.0 * N * inv_s3 / sg
        h[0][0] = h[0][0] - hkk
        h[0][1] = h[0][1] - hkt
        h[1][1] = h[1][1] - htt
        h[0][2] = h[0][2] - hks
        h[1][2] = h[1][2] - hts
        h[2][2] = h[2][2] - hss
    h[1][0], h[2][0], h[2][1] = h[0][1], h[0][2], h[1][2]
    return f, tuple(g), tuple(tuple(row) for row in h)


def rician_value(params, s, te):
    return rician_value_e(params, s, te)[0]


def rician_value_e(params, s, te):
    """(objective, [exp(-te/t2)]) — the exponentials feed the next fgh call."""
    k, t2, sg = params
    u_inv = -1.0 / t2
    sg2 = sg * sg
    f = jnp.zeros_like(k)
    es = []
    for st, t in zip(s, te):
        e = jnp.exp(t * u_inv)
        es.append(e)
        m = k * e
        x = m * st / sg2
        d_sm = jnp.abs(st) - jnp.abs(m)   # see rician_fgh: stable identity
        L = (jnp.log(jnp.maximum(st, _LOG_EPS)) - jnp.log(sg2)
             - d_sm * d_sm * 0.5 / sg2
             + jnp.log(jnp.maximum(i0e(x), 1e-30)))
        f = f - L
    return f, es


def gaussian_value_e(params, s, te):
    k, t2 = params
    u_inv = -1.0 / t2
    es = [jnp.exp(t * u_inv) for t in te]
    r = [st - k * et for st, et in zip(s, es)]
    return sum(rt * rt for rt in r) / len(te), es


FGH = {
    "gaussian": gaussian_fgh,
    "gaussian_rician": gaussian_rician_fgh,
    "rician": rician_fgh,
}
VALUE = {
    "gaussian": gaussian_value,
    "gaussian_rician": gaussian_rician_value,
    "rician": rician_value,
}
# value + the per-echo exponentials (for kernels that carry them)
VALUE_E = {
    "gaussian": gaussian_value_e,
    "gaussian_rician": gaussian_rician_value_e,
    "rician": rician_value_e,
}
N_PARAMS = {"gaussian": 2, "gaussian_rician": 3, "rician": 3}
