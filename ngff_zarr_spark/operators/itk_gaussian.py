"""ITK-parity discrete Gaussian weights (A4).

ITK's DiscreteGaussianImageFilter builds its kernel from the discrete
Gaussian (Lindeberg): coefficient k = exp(-t) * I_k(t) with t = sigma^2
and I_k the modified Bessel function of the first kind — NOT a sampled
continuous Gaussian. The kernel half-width grows until the coefficient
mass reaches 1 - maximumError (default 0.01), capped at
maximumKernelWidth (default 32, further clamped to the chunk extent by
the reference: /root/reference py/ngff_zarr/methods/_itk.py:23-45), and
the kept coefficients are renormalized.

``modified_bessel_i`` uses the power series
I_k(t) = sum_m (t/2)^(2m+k) / (m! (m+k)!), which converges rapidly in
float64 for the t = sigma^2 <= ~20 range these pyramids use (sigma for
factor 2 is ~0.74 → t ~0.54).

These weights plug into the same separable window / chunked kernels as
the sampled-Gaussian path — the METHOD tag picks the weight function,
the plan shape is identical (one tag ≠ three aliases anymore).
"""

from __future__ import annotations

import math

DEFAULT_MAX_ERROR = 0.01
DEFAULT_MAX_KERNEL_WIDTH = 32


def modified_bessel_i(order: int, x: float, terms: int = 80) -> float:
    """I_order(x) by power series (float64; adequate for x ≤ ~30)."""
    half = x / 2.0
    total = 0.0
    for m in range(terms):
        log_term = (2 * m + order) * math.log(half) if half > 0 else (
            0.0 if 2 * m + order == 0 else float("-inf")
        )
        log_term -= math.lgamma(m + 1) + math.lgamma(m + order + 1)
        total += math.exp(log_term)
    return total


def itk_gaussian_kernel(
    sigma: float,
    max_error: float = DEFAULT_MAX_ERROR,
    max_kernel_width: int = DEFAULT_MAX_KERNEL_WIDTH,
) -> list[float]:
    """Normalized half-kernel [w0, w1..wr] of ITK's GaussianOperator:
    w_k = exp(-t) I_k(t), widened until sum ≥ 1 - max_error (total
    width ≤ max_kernel_width taps), then renormalized."""
    t = float(sigma) * float(sigma)
    if t <= 0:
        return [1.0]
    et = math.exp(-t)
    cap = 1.0 - max_error
    coeffs = [et * modified_bessel_i(0, t)]
    total = coeffs[0]
    k = 1
    # total width = 2*r + 1 taps must stay ≤ max_kernel_width
    while total < cap and (2 * k + 1) <= max_kernel_width:
        c = et * modified_bessel_i(k, t)
        coeffs.append(c)
        total += 2.0 * c
        k += 1
    return [c / total for c in coeffs]


def itk_kernel_radius(
    sigma: float,
    max_error: float = DEFAULT_MAX_ERROR,
    max_kernel_width: int = DEFAULT_MAX_KERNEL_WIDTH,
) -> int:
    return len(itk_gaussian_kernel(sigma, max_error, max_kernel_width)) - 1
