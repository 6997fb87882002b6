"""R1Interval (closed real interval) and S1Interval (circle interval).

Ports of the reference's interval algebra used by all region bounds:
``R1Interval.java`` (empty iff lo > hi) and ``S1Interval.java`` (inverted,
lo > hi, means the interval wraps through ±pi). Driver-side scalar code.
"""

from __future__ import annotations

import math

M_PI = math.pi
M_PI_2 = math.pi / 2.0


def ieee_remainder(x: float, y: float) -> float:
    return math.remainder(x, y)


class R1Interval:
    __slots__ = ("lo", "hi")

    def __init__(self, lo: float, hi: float):
        self.lo = lo
        self.hi = hi

    @staticmethod
    def empty() -> "R1Interval":
        return R1Interval(1.0, 0.0)

    @staticmethod
    def from_point(p: float) -> "R1Interval":
        return R1Interval(p, p)

    @staticmethod
    def from_point_pair(p1: float, p2: float) -> "R1Interval":
        return R1Interval(p1, p2) if p1 <= p2 else R1Interval(p2, p1)

    def is_empty(self) -> bool:
        return self.lo > self.hi

    def get_center(self) -> float:
        return 0.5 * (self.lo + self.hi)

    def get_length(self) -> float:
        return self.hi - self.lo

    def contains(self, p: float) -> bool:
        return self.lo <= p <= self.hi

    def interior_contains(self, p: float) -> bool:
        return self.lo < p < self.hi

    def contains_interval(self, y: "R1Interval") -> bool:
        if y.is_empty():
            return True
        return y.lo >= self.lo and y.hi <= self.hi

    def interior_contains_interval(self, y: "R1Interval") -> bool:
        if y.is_empty():
            return True
        return y.lo > self.lo and y.hi < self.hi

    def intersects(self, y: "R1Interval") -> bool:
        # R1Interval.java:126-133
        if self.lo <= y.lo:
            return y.lo <= self.hi and y.lo <= y.hi
        return self.lo <= y.hi and self.lo <= self.hi

    def interior_intersects(self, y: "R1Interval") -> bool:
        return y.lo < self.hi and self.lo < y.hi and self.lo < self.hi and y.lo <= y.hi

    def add_point(self, p: float) -> "R1Interval":
        if self.is_empty():
            return R1Interval.from_point(p)
        if p < self.lo:
            return R1Interval(p, self.hi)
        if p > self.hi:
            return R1Interval(self.lo, p)
        return R1Interval(self.lo, self.hi)

    def expanded(self, radius: float) -> "R1Interval":
        if self.is_empty():
            return self
        return R1Interval(self.lo - radius, self.hi + radius)

    def union(self, y: "R1Interval") -> "R1Interval":
        if self.is_empty():
            return y
        if y.is_empty():
            return self
        return R1Interval(min(self.lo, y.lo), max(self.hi, y.hi))

    def intersection(self, y: "R1Interval") -> "R1Interval":
        return R1Interval(max(self.lo, y.lo), min(self.hi, y.hi))

    def __eq__(self, other):
        return isinstance(other, R1Interval) and (
            (self.lo == other.lo and self.hi == other.hi) or (self.is_empty() and other.is_empty())
        )

    def __repr__(self):
        return f"R1[{self.lo}, {self.hi}]"


class S1Interval:
    """Closed interval on the unit circle; inverted (lo > hi) wraps through ±pi
    (S1Interval.java:30-48). Endpoint -pi is normalized to pi except for
    empty/full."""

    __slots__ = ("lo", "hi")

    def __init__(self, lo: float, hi: float, checked: bool = False):
        if not checked:
            # Both conditions test the ORIGINAL endpoints (S1Interval.java:58-66
            # assigns to newLo/newHi): S1Interval(-pi, -pi) must normalize to
            # the point (pi, pi), not the empty-looking (pi, -pi).
            new_lo, new_hi = lo, hi
            if lo == -M_PI and hi != M_PI:
                new_lo = M_PI
            if hi == -M_PI and lo != M_PI:
                new_hi = M_PI
            lo, hi = new_lo, new_hi
        self.lo = lo
        self.hi = hi

    @staticmethod
    def empty() -> "S1Interval":
        return S1Interval(M_PI, -M_PI, True)

    @staticmethod
    def full() -> "S1Interval":
        return S1Interval(-M_PI, M_PI, True)

    @staticmethod
    def from_point(p: float) -> "S1Interval":
        if p == -M_PI:
            p = M_PI
        return S1Interval(p, p, True)

    @staticmethod
    def from_point_pair(p1: float, p2: float) -> "S1Interval":
        if p1 == -M_PI:
            p1 = M_PI
        if p2 == -M_PI:
            p2 = M_PI
        if S1Interval.positive_distance(p1, p2) <= M_PI:
            return S1Interval(p1, p2, True)
        return S1Interval(p2, p1, True)

    @staticmethod
    def positive_distance(a: float, b: float) -> float:
        # S1Interval.java:499-507
        d = b - a
        if d >= 0:
            return d
        return (b + M_PI) - (a - M_PI)

    def is_valid(self) -> bool:
        # S1Interval.java:129-133
        return (
            abs(self.lo) <= M_PI
            and abs(self.hi) <= M_PI
            and not (self.lo == -M_PI and self.hi != M_PI)
            and not (self.hi == -M_PI and self.lo != M_PI)
        )

    def is_full(self) -> bool:
        return self.hi - self.lo == 2 * M_PI

    def is_empty(self) -> bool:
        return self.lo - self.hi == 2 * M_PI

    def is_inverted(self) -> bool:
        return self.lo > self.hi

    def get_center(self) -> float:
        center = 0.5 * (self.lo + self.hi)
        if not self.is_inverted():
            return center
        return center + M_PI if center <= 0 else center - M_PI

    def get_length(self) -> float:
        length = self.hi - self.lo
        if length >= 0:
            return length
        length += 2 * M_PI
        return length if length > 0 else -1.0

    def complement(self) -> "S1Interval":
        if self.lo == self.hi:
            return S1Interval.full()
        return S1Interval(self.hi, self.lo, True)

    def fast_contains(self, p: float) -> bool:
        if self.is_inverted():
            return (p >= self.lo or p <= self.hi) and not self.is_empty()
        return self.lo <= p <= self.hi

    def contains(self, p: float) -> bool:
        if p == -M_PI:
            p = M_PI
        return self.fast_contains(p)

    def interior_contains(self, p: float) -> bool:
        if p == -M_PI:
            p = M_PI
        if self.is_inverted():
            return p > self.lo or p < self.hi
        return (self.lo < p < self.hi) or self.is_full()

    def contains_interval(self, y: "S1Interval") -> bool:
        if self.is_inverted():
            if y.is_inverted():
                return y.lo >= self.lo and y.hi <= self.hi
            return (y.lo >= self.lo or y.hi <= self.hi) and not self.is_empty()
        if y.is_inverted():
            return self.is_full() or y.is_empty()
        return y.lo >= self.lo and y.hi <= self.hi

    def interior_contains_interval(self, y: "S1Interval") -> bool:
        if self.is_inverted():
            if not y.is_inverted():
                return y.lo > self.lo or y.hi < self.hi
            return (y.lo > self.lo and y.hi < self.hi) or y.is_empty()
        if y.is_inverted():
            return self.is_full() or y.is_empty()
        return (y.lo > self.lo and y.hi < self.hi) or self.is_full()

    def intersects(self, y: "S1Interval") -> bool:
        if self.is_empty() or y.is_empty():
            return False
        if self.is_inverted():
            return y.is_inverted() or y.lo <= self.hi or y.hi >= self.lo
        if y.is_inverted():
            return y.lo <= self.hi or y.hi >= self.lo
        return y.lo <= self.hi and y.hi >= self.lo

    def interior_intersects(self, y: "S1Interval") -> bool:
        if self.is_empty() or y.is_empty() or self.lo == self.hi:
            return False
        if self.is_inverted():
            return y.is_inverted() or y.lo < self.hi or y.hi > self.lo
        if y.is_inverted():
            return y.lo < self.hi or y.hi > self.lo
        return (y.lo < self.hi and y.hi > self.lo) or self.is_full()

    def add_point(self, p: float) -> "S1Interval":
        if p == -M_PI:
            p = M_PI
        if self.fast_contains(p):
            return S1Interval(self.lo, self.hi, True)
        if self.is_empty():
            return S1Interval.from_point(p)
        dlo = S1Interval.positive_distance(p, self.lo)
        dhi = S1Interval.positive_distance(self.hi, p)
        if dlo < dhi:
            return S1Interval(p, self.hi)
        return S1Interval(self.lo, p)

    def expanded(self, radius: float) -> "S1Interval":
        if self.is_empty():
            return self
        if self.get_length() + 2 * radius >= 2 * M_PI - 1e-15:
            return S1Interval.full()
        lo = ieee_remainder(self.lo - radius, 2 * M_PI)
        hi = ieee_remainder(self.hi + radius, 2 * M_PI)
        if lo == -M_PI:
            lo = M_PI
        return S1Interval(lo, hi)

    def union(self, y: "S1Interval") -> "S1Interval":
        if y.is_empty():
            return self
        if self.fast_contains(y.lo):
            if self.fast_contains(y.hi):
                if self.contains_interval(y):
                    return self
                return S1Interval.full()
            return S1Interval(self.lo, y.hi, True)
        if self.fast_contains(y.hi):
            return S1Interval(y.lo, self.hi, True)
        if self.is_empty() or y.fast_contains(self.lo):
            return y
        dlo = S1Interval.positive_distance(y.hi, self.lo)
        dhi = S1Interval.positive_distance(self.hi, y.lo)
        if dlo < dhi:
            return S1Interval(y.lo, self.hi, True)
        return S1Interval(self.lo, y.hi, True)

    def intersection(self, y: "S1Interval") -> "S1Interval":
        if y.is_empty():
            return S1Interval.empty()
        if self.fast_contains(y.lo):
            if self.fast_contains(y.hi):
                if y.get_length() < self.get_length():
                    return y
                return self
            return S1Interval(y.lo, self.hi, True)
        if self.fast_contains(y.hi):
            return S1Interval(self.lo, y.hi, True)
        if y.fast_contains(self.lo):
            return self
        return S1Interval.empty()

    def approx_equals(self, y: "S1Interval", max_error: float = 1e-9) -> bool:
        if self.is_empty():
            return y.get_length() <= max_error
        if y.is_empty():
            return self.get_length() <= max_error
        return (
            abs(ieee_remainder(y.lo - self.lo, 2 * M_PI)) + abs(ieee_remainder(y.hi - self.hi, 2 * M_PI))
        ) <= max_error

    def __eq__(self, other):
        return isinstance(other, S1Interval) and self.lo == other.lo and self.hi == other.hi

    def __repr__(self):
        return f"S1[{self.lo}, {self.hi}]"
