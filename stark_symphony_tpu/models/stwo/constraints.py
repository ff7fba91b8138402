"""Pluggable AIR constraint modules for the stwo verifier.

The reference selects the constraint set with an `#include`
(/root/reference/stwo-verifier/src/deep/oods.simf:17); here an AIR is a
function `eval_composition_poly(log_size, oods_point, oods_trace, coeff)`
registered by name.  Each AIR also carries its trace recurrence (used by
the prover's trace generator and LDE constraint evaluation) so one
registry drives prover + verifier + the expert-parallel router
(parallel/expert.py).
"""

from __future__ import annotations

from ...ops import field as F
from ...ops.circle import vanishing_poly_eval


def _fold_columns(rule_qm31, log_size, oods_point, oods_trace, random_coeff):
    """Random-linear-combine per-column constraints c_k = rule(c_{k-2},
    c_{k-1}) and divide by the vanishing polynomial
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
        constraint = F.qm31_sub(c, rule_qm31(a, b))
        acc = F.qm31_add(F.qm31_mul(acc, random_coeff), constraint)
        a, b = b, c
    vanish = vanishing_poly_eval(log_size, oods_point)
    return F.qm31_div(acc, vanish)


def wide_fibonacci(log_size, oods_point, oods_trace, random_coeff):
    """Wide-Fibonacci AIR: c = b^2 + a^2 across columns."""
    rule = lambda a, b: F.qm31_add(F.qm31_sqr(b), F.qm31_sqr(a))
    return _fold_columns(rule, log_size, oods_point, oods_trace, random_coeff)


def wide_product(log_size, oods_point, oods_trace, random_coeff):
    """Wide-product AIR: c = a * b across columns (a second constraint set
    to exercise heterogeneous-AIR routing; no reference analogue — the
    reference supports exactly one AIR per compiled program).  Degree 2,
    like wide-Fibonacci, so the composition quotient stays a polynomial
    after dividing by the degree-2^n vanishing polynomial."""
    return _fold_columns(F.qm31_mul, log_size, oods_point, oods_trace,
                         random_coeff)


REGISTRY = {
    "wide_fibonacci": wide_fibonacci,
    "wide_product": wide_product,
}

# AIR order for routed (expert-parallel) verification: air_id indexes this.
AIR_IDS = ("wide_fibonacci", "wide_product")

# Trace recurrences (python ints mod P) and M31-lane LDE rules, keyed the
# same way; used by the prover (prover.py).
TRACE_RULES = {
    "wide_fibonacci": lambda a, b: (a * a + b * b),
    "wide_product": lambda a, b: (a * b),
}


def lde_rule(air: str):
    """M31-lane constraint rule on LDE values for the prover."""
    if air == "wide_fibonacci":
        return lambda a, b: F.m31_add(F.m31_sqr(a), F.m31_sqr(b))
    if air == "wide_product":
        return lambda a, b: F.m31_mul(a, b)
    raise KeyError(air)
