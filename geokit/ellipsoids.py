"""Reference ellipsoids (cf. reference ``geo.h`` ellipsoid constant table).

Bessel 1841 carries the Slovenian D48 datum; GRS80 carries D96/ETRS89;
WGS84 is numerically indistinguishable from GRS80 at the mm level (the
flattenings differ in the 11th significant digit) but both are kept so
the transform menu can name them separately, as the reference does.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Ellipsoid:
    name: str
    a: float  # semi-major axis [m]
    f_inv: float  # inverse flattening 1/f

    @property
    def f(self) -> float:
        return 1.0 / self.f_inv

    @property
    def b(self) -> float:
        return self.a * (1.0 - self.f)

    @property
    def e2(self) -> float:
        """First eccentricity squared e^2 = f(2-f)."""
        f = self.f
        return f * (2.0 - f)

    @property
    def ep2(self) -> float:
        """Second eccentricity squared e'^2 = e^2/(1-e^2)."""
        e2 = self.e2
        return e2 / (1.0 - e2)


BESSEL = Ellipsoid("bessel1841", 6377397.155, 299.1528128)
GRS80 = Ellipsoid("grs80", 6378137.0, 298.257222101)
WGS84 = Ellipsoid("wgs84", 6378137.0, 298.257223563)
