import numpy as np
from math import erf, sqrt, pi, exp

def fit_rational_odd(f, B, dp, dq, iters=40):
    """fit f(x) ~ x*P(s)/Q(s), s=x^2, Q=1+..., on [0,B] via iterative LS."""
    xs = np.linspace(1e-9, B, 40001)
    ys = np.array([f(v) for v in xs])
    s = xs * xs
    Vp = np.vander(s, dp + 1, increasing=True)
    Vq = np.vander(s, dq + 1, increasing=True)[:, 1:]
    w = np.ones_like(xs)
    for _ in range(iters):
        # y*(1+q.s..) = x*P(s)  ->  linear in (p, q)
        A = np.hstack([xs[:, None] * Vp, -ys[:, None] * Vq])
        b = ys
        sol, *_ = np.linalg.lstsq(A * w[:, None], b * w, rcond=None)
        p, q = sol[: dp + 1], sol[dp + 1:]
        approx = xs * (Vp @ p) / (1 + Vq @ q)
        err = approx - ys
        w = np.sqrt(w * np.maximum(np.abs(err) / np.abs(err).max(), 1e-3))
        w /= w.mean()
    return p, q, np.abs(err).max(), approx[-1]

for name, f, B in [
    ("erf", erf, 2.85),  # historical (the round-2 fwd path went through erf)
    # fwd/recompute: gelu(x) = x*(0.5 + (Phi(x)-0.5)), fit the odd cdf part
    # directly — two VPU ops cheaper than 0.5*x*(1+erf(x/sqrt(2)))
    ("gelu_cdf_odd", lambda x: 0.5*erf(x/sqrt(2)), 4.6),
    ("gelu_grad_odd", lambda x: 0.5*(1+erf(x/sqrt(2))) + x*exp(-x*x/2)/sqrt(2*pi) - 0.5, 4.6),
]:
    for dp, dq in ((3, 3), (4, 3), (4, 4)):
        p, q, err, endval = fit_rational_odd(f, B, dp, dq)
        print(f"{name} dp={dp} dq={dq} maxerr={err:.2e} f(B)~{endval:.6f} "
              f"p={[float(v) for v in p]} q={[float(v) for v in q]}")
