"""F12 — UCUM canonicalization table (README.md:365-381).

"A canonicalized form of the value and the code can be provided" so
quantities in different units compare at query time; the spec's own
example is Celsius/Fahrenheit → Kelvin (README.md:372-373).

A pure-Python map of ~85 clinical UCUM units → (canonical unit, linear
factor, offset); applied as three literal MAP lookups — JVM-side, no
UDF, O(1) per row regardless of table size (earlier rounds used a
chained CASE whose codegen grew linearly with the table). Unknown units
pass through unchanged (identity canonical form), which is spec-legal
since the annotation is optional per element.

Canonical bases follow UCUM dimensional reduction: mass→g, length→m,
time→s, volume→m3, temperature→K, pressure→Pa, energy→J,
mass-concentration→g/L, molar-concentration→mol/L, amount→mol,
enzyme-activity→U/L (and [IU]/L as its own base — IU↔U equivalence is
substance-specific), count-concentration→/L, frequency→/s, flow→m3/s,
osmolality→osm/kg, dimensionless ratios→1.

Deliberate non-conversion (the molar-mass caveat): mass concentration
(mg/dL → g/L) and molar concentration (mmol/L → mol/L) canonicalize to
DIFFERENT bases. Converting between them requires the analyte's molar
mass (e.g. glucose 180.156 g/mol: 1 mmol/L = 18.0156 mg/dL), which a
context-free unit table cannot know — exactly UCUM's own position.
Cross-dimension comparison belongs in query logic that knows the
analyte (join the LOINC code against a molar-mass dimension table and
multiply — a broadcast join at any scale).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# code -> (canonical_code, factor, offset): canonical = value*factor + offset
UCUM_CANONICAL: dict[str, tuple[str, float, float]] = {
    # temperature → K (the spec's own example, README.md:372-373)
    "Cel": ("K", 1.0, 273.15),
    "[degF]": ("K", 5.0 / 9.0, 459.67 * 5.0 / 9.0),
    "K": ("K", 1.0, 0.0),
    # mass → g
    "kg": ("g", 1000.0, 0.0),
    "g": ("g", 1.0, 0.0),
    "mg": ("g", 1e-3, 0.0),
    "ug": ("g", 1e-6, 0.0),
    "ng": ("g", 1e-9, 0.0),
    "pg": ("g", 1e-12, 0.0),
    "[lb_av]": ("g", 453.59237, 0.0),
    "[oz_av]": ("g", 28.349523125, 0.0),
    # length → m
    "km": ("m", 1000.0, 0.0),
    "m": ("m", 1.0, 0.0),
    "cm": ("m", 0.01, 0.0),
    "mm": ("m", 1e-3, 0.0),
    "um": ("m", 1e-6, 0.0),
    "nm": ("m", 1e-9, 0.0),
    "[in_i]": ("m", 0.0254, 0.0),
    "[ft_i]": ("m", 0.3048, 0.0),
    # time → s (a = mean Julian year, mo = mean Julian month, per UCUM)
    "a": ("s", 31557600.0, 0.0),
    "mo": ("s", 2629800.0, 0.0),
    "wk": ("s", 604800.0, 0.0),
    "d": ("s", 86400.0, 0.0),
    "h": ("s", 3600.0, 0.0),
    "min": ("s", 60.0, 0.0),
    "s": ("s", 1.0, 0.0),
    "ms": ("s", 1e-3, 0.0),
    # volume → m3
    "m3": ("m3", 1.0, 0.0),
    "L": ("m3", 1e-3, 0.0),
    "dL": ("m3", 1e-4, 0.0),
    "cL": ("m3", 1e-5, 0.0),
    "mL": ("m3", 1e-6, 0.0),
    "uL": ("m3", 1e-9, 0.0),
    "pL": ("m3", 1e-15, 0.0),
    "fL": ("m3", 1e-18, 0.0),
    # areic mass → g/m2 (BMI's kg/m2)
    "kg/m2": ("g/m2", 1000.0, 0.0),
    "g/m2": ("g/m2", 1.0, 0.0),
    # pressure → Pa (blood pressure, blood gases, ventilation)
    "Pa": ("Pa", 1.0, 0.0),
    "kPa": ("Pa", 1000.0, 0.0),
    "bar": ("Pa", 1e5, 0.0),
    "mbar": ("Pa", 100.0, 0.0),
    "atm": ("Pa", 101325.0, 0.0),
    "mm[Hg]": ("Pa", 133.322387415, 0.0),
    "cm[H2O]": ("Pa", 98.0665, 0.0),
    # frequency → /s (heart rate, respiratory rate)
    "Hz": ("/s", 1.0, 0.0),
    "/s": ("/s", 1.0, 0.0),
    "/min": ("/s", 1.0 / 60.0, 0.0),
    "/h": ("/s", 1.0 / 3600.0, 0.0),
    # mass concentration → g/L (hemoglobin, glucose, lipids, drug levels)
    "g/L": ("g/L", 1.0, 0.0),
    "g/dL": ("g/L", 10.0, 0.0),
    "mg/dL": ("g/L", 0.01, 0.0),
    "mg/L": ("g/L", 1e-3, 0.0),
    "mg/mL": ("g/L", 1.0, 0.0),
    "ug/mL": ("g/L", 1e-3, 0.0),
    "ug/dL": ("g/L", 1e-5, 0.0),
    "ug/L": ("g/L", 1e-6, 0.0),
    "ng/mL": ("g/L", 1e-6, 0.0),
    "ng/L": ("g/L", 1e-9, 0.0),
    "pg/mL": ("g/L", 1e-9, 0.0),
    # molar concentration → mol/L (electrolytes, SI-unit labs)
    "mol/L": ("mol/L", 1.0, 0.0),
    "mmol/L": ("mol/L", 1e-3, 0.0),
    "umol/L": ("mol/L", 1e-6, 0.0),
    "nmol/L": ("mol/L", 1e-9, 0.0),
    "pmol/L": ("mol/L", 1e-12, 0.0),
    # amount of substance → mol
    "mol": ("mol", 1.0, 0.0),
    "mmol": ("mol", 1e-3, 0.0),
    "umol": ("mol", 1e-6, 0.0),
    "nmol": ("mol", 1e-9, 0.0),
    # enzyme activity → U/L ([IU] kept as a separate base: the IU↔U
    # equivalence is defined per analyte by WHO, not dimensionally)
    "U/L": ("U/L", 1.0, 0.0),
    "kU/L": ("U/L", 1000.0, 0.0),
    "U/mL": ("U/L", 1000.0, 0.0),
    "U/dL": ("U/L", 10.0, 0.0),
    "mU/mL": ("U/L", 1.0, 0.0),
    "[IU]/L": ("[IU]/L", 1.0, 0.0),
    "[IU]/mL": ("[IU]/L", 1000.0, 0.0),
    "m[IU]/mL": ("[IU]/L", 1.0, 0.0),
    # count concentration → /L (CBC: WBC/RBC/platelets)
    "/L": ("/L", 1.0, 0.0),
    "/mL": ("/L", 1e3, 0.0),
    "/uL": ("/L", 1e6, 0.0),
    "10*3/uL": ("/L", 1e9, 0.0),
    "10*6/uL": ("/L", 1e12, 0.0),
    "10*9/L": ("/L", 1e9, 0.0),
    "10*12/L": ("/L", 1e12, 0.0),
    # energy → J (dietary intake, metabolic rate)
    "J": ("J", 1.0, 0.0),
    "kJ": ("J", 1e3, 0.0),
    "cal": ("J", 4.184, 0.0),
    "kcal": ("J", 4184.0, 0.0),
    "[Cal]": ("J", 4184.0, 0.0),
    # dimensionless ratios → 1 (saturation %, mass-per-mass dosing)
    "1": ("1", 1.0, 0.0),
    "%": ("1", 0.01, 0.0),
    "[ppth]": ("1", 1e-3, 0.0),
    "[ppm]": ("1", 1e-6, 0.0),
    "[ppb]": ("1", 1e-9, 0.0),
    "mg/kg": ("1", 1e-6, 0.0),
    "ug/kg": ("1", 1e-9, 0.0),
    # volumetric flow → m3/s (infusion rates, urine output; eGFR's
    # mL/min/{1.73_m2} is an annotated mL/min in UCUM and excluded)
    "mL/min": ("m3/s", 1e-6 / 60.0, 0.0),
    "mL/h": ("m3/s", 1e-6 / 3600.0, 0.0),
    "L/min": ("m3/s", 1e-3 / 60.0, 0.0),
    "L/h": ("m3/s", 1e-3 / 3600.0, 0.0),
    # osmolality → osm/kg
    "osm/kg": ("osm/kg", 1.0, 0.0),
    "mosm/kg": ("osm/kg", 1e-3, 0.0),
}


def canonical_quantity(value: Column, code: Column) -> Column:
    """STRUCT<value DECIMAL(38,6), code STRING> in UCUM-canonical form
    (README.md:375-381). ``value`` may be the spec's string-typed decimal.

    Three literal-map lookups (factor, offset, canonical code) —
    ``try_element_at`` so an unknown or NULL code falls through to the
    identity form instead of raising under ANSI mode.
    """
    v = value.try_cast("double")
    factor_map = F.create_map(
        *[
            lit
            for unit, (_, factor, _o) in UCUM_CANONICAL.items()
            for lit in (F.lit(unit), F.lit(factor))
        ]
    )
    offset_map = F.create_map(
        *[
            lit
            for unit, (_, _f, offset) in UCUM_CANONICAL.items()
            for lit in (F.lit(unit), F.lit(offset))
        ]
    )
    code_map = F.create_map(
        *[
            lit
            for unit, (target, _f, _o) in UCUM_CANONICAL.items()
            for lit in (F.lit(unit), F.lit(target))
        ]
    )
    factor = F.coalesce(F.try_element_at(factor_map, code), F.lit(1.0))
    offset = F.coalesce(F.try_element_at(offset_map, code), F.lit(0.0))
    canon_value = v * factor + offset
    canon_code = F.coalesce(F.try_element_at(code_map, code), code)
    return F.struct(
        canon_value.try_cast("decimal(38,6)").alias("value"), canon_code.alias("code")
    )
