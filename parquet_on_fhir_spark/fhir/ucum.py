"""F12 — UCUM canonicalization table (README.md:365-381).

"A canonicalized form of the value and the code can be provided" so
quantities in different units compare at query time; the spec's own
example is Celsius/Fahrenheit → Kelvin (README.md:372-373).

A pure-Python map of common clinical UCUM units → (canonical unit,
linear factor, offset); applied as a chained CASE expression — JVM-side,
no UDF. Unknown units pass through unchanged (identity canonical form),
which is spec-legal since the annotation is optional per element.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# code -> (canonical_code, factor, offset): canonical = value*factor + offset
UCUM_CANONICAL: dict[str, tuple[str, float, float]] = {
    "Cel": ("K", 1.0, 273.15),
    "[degF]": ("K", 5.0 / 9.0, 459.67 * 5.0 / 9.0),
    "K": ("K", 1.0, 0.0),
    "kg": ("g", 1000.0, 0.0),
    "g": ("g", 1.0, 0.0),
    "mg": ("g", 0.001, 0.0),
    "ug": ("g", 1e-6, 0.0),
    "[lb_av]": ("g", 453.59237, 0.0),
    "km": ("m", 1000.0, 0.0),
    "m": ("m", 1.0, 0.0),
    "cm": ("m", 0.01, 0.0),
    "mm": ("m", 0.001, 0.0),
    "[in_i]": ("m", 0.0254, 0.0),
    "a": ("s", 31557600.0, 0.0),
    "d": ("s", 86400.0, 0.0),
    "h": ("s", 3600.0, 0.0),
    "min": ("s", 60.0, 0.0),
    "s": ("s", 1.0, 0.0),
    "L": ("m3", 0.001, 0.0),
    "mL": ("m3", 1e-6, 0.0),
    "dL": ("m3", 1e-4, 0.0),
}


def canonical_quantity(value: Column, code: Column) -> Column:
    """STRUCT<value DECIMAL(38,6), code STRING> in UCUM-canonical form
    (README.md:375-381). ``value`` may be the spec's string-typed decimal."""
    v = value.try_cast("double")
    canon_value = None
    canon_code = None
    for unit, (target, factor, offset) in UCUM_CANONICAL.items():
        expr_v = (v * F.lit(factor) + F.lit(offset))
        expr_c = F.lit(target)
        if canon_value is None:
            canon_value = F.when(code == unit, expr_v)
            canon_code = F.when(code == unit, expr_c)
        else:
            canon_value = canon_value.when(code == unit, expr_v)
            canon_code = canon_code.when(code == unit, expr_c)
    canon_value = canon_value.otherwise(v)
    canon_code = canon_code.otherwise(code)
    return F.struct(
        canon_value.try_cast("decimal(38,6)").alias("value"), canon_code.alias("code")
    )
