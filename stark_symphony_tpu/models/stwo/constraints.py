"""Pluggable AIR constraint modules for the stwo verifier.

The reference selects the constraint set with an `#include`
(/root/reference/stwo-verifier/src/deep/oods.simf:17); here an AIR is a
function `eval_composition_poly(log_size, oods_point, oods_trace, coeff)`
registered by name.
"""

from __future__ import annotations

from ...ops import field as F
from ...ops.circle import qm31_point_x, qm31_point_y, vanishing_poly_eval


def wide_fibonacci(log_size: int, oods_point, oods_trace, random_coeff):
    """Wide-Fibonacci AIR: c = b^2 + a^2 across columns, random-linear-
    combined and divided by the vanishing polynomial
    (/root/reference/stwo-verifier/src/constraints/wide_fibonacci.simf:24-62).

    oods_trace: (n_columns, 4) QM31 evals at the OODS point; the first two
    columns seed (a, b) and contribute no constraint.
    """
    n_columns = oods_trace.shape[-2]
    acc = F.qm31_zero(oods_trace.shape[:-2])
    a = oods_trace[..., 0, :]
    b = oods_trace[..., 1, :]
    for col in range(2, n_columns):
        c = oods_trace[..., col, :]
        constraint = F.qm31_sub(c, F.qm31_add(F.qm31_sqr(b), F.qm31_sqr(a)))
        acc = F.qm31_add(F.qm31_mul(acc, random_coeff), constraint)
        a, b = b, c
    vanish = vanishing_poly_eval(log_size, oods_point)
    return F.qm31_div(acc, vanish)


REGISTRY = {
    "wide_fibonacci": wide_fibonacci,
}
