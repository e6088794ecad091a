"""PCRD rate control: pass-slope convex hulls + global threshold bisection.

Parity: TileProcessor::pcrdBisect* / RateControl (SURVEY.md §2.1 "Rate
control", B.8): per-codeblock candidate truncation points are pass ends on
the convex hull of (rate, distortion); a global slope threshold lambda picks
each block's contribution per layer; the threshold is bisected against the
layer's byte budget with a Tier-2 dry run to account for header overhead
("feasible" variant).  `-q` quality mode thresholds on distortion instead.
"""

from __future__ import annotations

import math
from dataclasses import dataclass


@dataclass
class HullPoint:
    passno: int     # index of last included pass (truncation at passno+1)
    rate: int       # cumulative bytes
    dist: float     # cumulative weighted distortion decrease
    slope: float = 0.0


def convex_hull(passes, weight: float) -> list[HullPoint]:
    """Feasible truncation points with strictly decreasing slopes.

    `passes` is the list of t1.coder.PassInfo; `weight` scales the raw
    distortion units into image-MSE units ((Delta_b * norm_b * mct_norm)^2).
    """
    pts = [HullPoint(i, p.rate, p.dist * weight) for i, p in enumerate(passes)]
    hull: list[HullPoint] = []
    for pt in pts:
        while True:
            base_r = hull[-1].rate if hull else 0
            base_d = hull[-1].dist if hull else 0.0
            dr = pt.rate - base_r
            dd = pt.dist - base_d
            if dd <= 0:
                break  # no distortion gain: not a feasible truncation point
            pt.slope = math.inf if dr <= 0 else dd / dr
            if hull and hull[-1].slope <= pt.slope:
                hull.pop()  # previous point is dominated
                continue
            hull.append(pt)
            break
    return hull


def passes_for_threshold(hull: list[HullPoint], lam: float) -> int:
    """Number of passes included when keeping hull slopes >= lam."""
    n = 0
    for pt in hull:
        if pt.slope >= lam:
            n = pt.passno + 1
        else:
            break
    return n


def candidate_slopes(hulls: list[list[HullPoint]]) -> list[float]:
    """All distinct finite hull slopes, descending."""
    s = {pt.slope for hull in hulls for pt in hull if math.isfinite(pt.slope)}
    return sorted(s, reverse=True)
