"""S2 level<->physical-size calibration metrics (K22).

Port of S2.Metric (``/root/reference/src/com/google/common/geometry/S2.java:141-221``)
and the quadratic-projection metric constants
(``S2Projections.java:89-220``). Driver-side scalar helpers used to pick
covering/tiling/kNN-bucket levels from physical radii.
"""

from __future__ import annotations

import math

MAX_LEVEL = 30

M_PI = math.pi
M_SQRT2 = math.sqrt(2.0)


def _exp(v: float) -> int:
    """Exponent e with 0.5 <= |v| * 2**-e < 1 (S2.java:56-63); 0 for v == 0."""
    if v == 0:
        return 0
    return math.frexp(v)[1]


class Metric:
    """A length (dim=1) or area (dim=2) cell metric (S2.java:141-221)."""

    def __init__(self, dim: int, deriv: float):
        self.dim = dim
        self.deriv = deriv

    def get_value(self, level: int) -> float:
        """Metric value for cells at the given level: scalb(deriv, dim*(1-level))."""
        return math.ldexp(self.deriv, self.dim * (1 - level))

    def get_closest_level(self, value: float) -> int:
        return self.get_min_level(M_SQRT2 * value)

    def get_min_level(self, value: float) -> int:
        """Minimum level such that the metric is <= value (S2.java:184-197)."""
        if value <= 0:
            return MAX_LEVEL
        exponent = _exp(value / ((1 << self.dim) * self.deriv))
        return max(0, min(MAX_LEVEL, -((exponent - 1) >> (self.dim - 1))))

    def get_max_level(self, value: float) -> int:
        """Maximum level such that the metric is >= value (S2.java:206-218)."""
        if value <= 0:
            return MAX_LEVEL
        exponent = _exp((1 << self.dim) * self.deriv / value)
        return max(0, min(MAX_LEVEL, (exponent - 1) >> (self.dim - 1)))


# Quadratic-projection constants (S2Projections.java:89-220).
MIN_AREA = Metric(2, 2 * M_SQRT2 / 9)  # 0.314
MAX_AREA = Metric(2, 0.65894981424079037)  # 0.659
AVG_AREA = Metric(2, M_PI / 6)  # 0.524

MIN_ANGLE_SPAN = Metric(1, 2.0 / 3)  # 0.667
MAX_ANGLE_SPAN = Metric(1, 0.85244858959960922)  # 0.852
AVG_ANGLE_SPAN = Metric(1, M_PI / 4)  # 0.785

MIN_WIDTH = Metric(1, M_SQRT2 / 3)  # 0.471
MAX_WIDTH = Metric(1, MAX_ANGLE_SPAN.deriv)
AVG_WIDTH = Metric(1, 0.71726183644304969)  # 0.717

MIN_EDGE = Metric(1, M_SQRT2 / 3)  # 0.471
MAX_EDGE = Metric(1, MAX_ANGLE_SPAN.deriv)
AVG_EDGE = Metric(1, 0.72960687319305303)  # 0.730

MIN_DIAG = Metric(1, 4 * M_SQRT2 / 9)  # 0.629
MAX_DIAG = Metric(1, 1.2193272972170106)  # 1.219
AVG_DIAG = Metric(1, 1.03021136949923584)  # 1.030

MAX_EDGE_ASPECT = 1.44261527445268292
MAX_DIAG_ASPECT = math.sqrt(3)


def get_max_level_vec(metric: Metric, values):
    """Vectorized Metric.get_max_level for dim=1 metrics (S2.java:206-218)."""
    import numpy as np

    values = np.asarray(values, dtype=np.float64)
    assert metric.dim == 1
    with np.errstate(divide="ignore"):
        _, exponent = np.frexp((2.0 * metric.deriv) / values)
    out = np.clip(exponent - 1, 0, MAX_LEVEL).astype(np.int64)
    return np.where(values <= 0, MAX_LEVEL, out)
