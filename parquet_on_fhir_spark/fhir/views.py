"""SQL-on-FHIR v2 ViewDefinition runner (hl7.org/fhir/uv/sql-on-fhir/).

Runs the public HL7 "SQL on FHIR" ViewDefinition resource — the standard
way to flatten FHIR resources into relational views — directly over
Parquet-on-FHIR tables. The FHIRPath subset below is compiled to pure
Spark ``Column`` expressions (field access, ``transform``/``filter``/
``flatten`` higher-order functions, ``explode`` generators): evaluation
is whole-stage-codegen JVM work, no Python on the data path, and a view
over a 100 TB table is a map-only scan (plus whatever the caller does
with the rows afterwards).

Supported ViewDefinition surface
--------------------------------
- ``resource`` (rows filtered to that resourceType when the column exists)
- ``select[]`` with ``column[{name, path, collection}]``, ``forEach`` /
  ``forEachOrNull`` (compiled to ``explode`` / ``explode_outer`` — the
  spec's drop-vs-keep-null semantics exactly), nested ``select``, and a
  single top-level ``unionAll`` item (branches unioned by name)
- ``where[{path}]`` — resource-level filters
- ``constant[]`` — referenced as ``%name`` inside paths

FHIRPath subset (per the spec's "Shareable View Definition" profile):
path navigation with implicit collection flattening, ``$this``,
``first()``, ``exists()``, ``empty()``, ``count()``, ``where(<field>
<op> <literal>)`` (op ∈ = != > >= < <=, a bare truthy path, and
``and`` / ``or`` / ``not`` / parenthesized combinations),
``ofType(X)`` (choice-type column selection), ``extension('url')``,
``getResourceKey()``, ``getReferenceKey([Type])`` (relative
``Type/id`` references), ``repeat(x)`` (transitive projection closure,
statically unrolled to a unionAll over the schema's finite nesting
depth), ``toInteger()``/``toDecimal()``/``toString()`` casts
(``try_cast`` — non-coercible values null out, FHIRPath's empty),
``lowBoundary()``/``highBoundary()`` on
date-kinded elements — the boundary functions read this format's
date-range annotation columns (``__<el>_start``/``__<el>_end``,
reference README.md:308-341), which is exactly what those annotations
exist for — and simple arithmetic (``+ - * /`` with precedence and
parentheses) over singleton numeric operands and literals; FHIR's
string-typed decimals cast to DOUBLE at the operand (README.md:343-351).

Singleton discipline: a ``column`` whose path still yields a collection
raises at compile time unless ``collection: true`` — same rule the spec
validator applies, but enforced against the actual derived schema.

Unsupported FHIRPath (aggregate functions) raises ``ViewPathError``
at compile time — never a silent wrong answer.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class ViewPathError(ValueError):
    """A path uses FHIRPath outside the supported subset, or does not
    fit the data's schema."""


# ---------------------------------------------------------------------------
# path parsing
# ---------------------------------------------------------------------------

_SEG = re.compile(r"^(\$this|[A-Za-z_][A-Za-z0-9_]*)(?:\((.*)\))?$")


def _split_top(path: str, sep: str) -> list[str]:
    """Split on ``sep`` at paren/quote depth 0."""
    out, buf, depth, q = [], [], 0, None
    for ch in path:
        if q:
            buf.append(ch)
            if ch == q:
                q = None
            continue
        if ch in "'\"":
            q = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    out.append("".join(buf))
    return out


def _parse_segments(path: str) -> list[tuple[str, str | None]]:
    """``a.b.where(u = 'x').first()`` → [(a,None),(b,None),(where,"u = 'x'"),(first,"")]."""
    segs = []
    for raw in _split_top(path.strip(), "."):
        raw = raw.strip()
        m = _SEG.match(raw)
        if not m:
            raise ViewPathError(f"unsupported path segment: {raw!r}")
        segs.append((m.group(1), m.group(2)))
    # fold ofType(X) into the preceding choice-element name:
    # value.ofType(Quantity) → valueQuantity (the spec's column rule)
    folded: list[tuple[str, str | None]] = []
    for name, arg in segs:
        if name == "ofType":
            if not folded or folded[-1][1] is not None:
                raise ViewPathError("ofType() must follow a bare element name")
            ty = (arg or "").strip()
            if not ty:
                raise ViewPathError("ofType() needs a type argument")
            prev, _ = folded.pop()
            folded.append((prev + ty[0].upper() + ty[1:], None))
        else:
            folded.append((name, arg))
    return folded


def _literal(tok: str, constants: dict[str, Any]) -> Any:
    tok = tok.strip()
    if tok.startswith("%"):
        name = tok[1:]
        if name not in constants:
            raise ViewPathError(f"unknown constant %{name}")
        return constants[name]
    if (tok.startswith("'") and tok.endswith("'")) or (
        tok.startswith('"') and tok.endswith('"')
    ):
        return tok[1:-1]
    if tok == "true":
        return True
    if tok == "false":
        return False
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        raise ViewPathError(f"unsupported literal: {tok!r}")


def _split_kw(expr: str, kw: str) -> list[str]:
    """Split on the bare keyword (`` and `` / `` or ``) at paren/quote
    depth 0."""
    out, buf, depth, q = [], [], 0, None
    i, n, pat = 0, len(expr), f" {kw} "
    while i < n:
        ch = expr[i]
        if q:
            buf.append(ch)
            if ch == q:
                q = None
            i += 1
            continue
        if ch in "'\"":
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and expr.startswith(pat, i):
            out.append("".join(buf))
            buf = []
            i += len(pat)
            continue
        buf.append(ch)
        i += 1
    out.append("".join(buf))
    return out


def _balanced(s: str) -> bool:
    depth, q = 0, None
    for ch in s:
        if q:
            if ch == q:
                q = None
        elif ch in "'\"":
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                return False
    return depth == 0 and q is None


_CMP = re.compile(r"^(.*?)\s*(!=|>=|<=|=|>|<)\s*(.*)$")
_OPS = {
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
}

_ARITH = {
    "+": Column.__add__,
    "-": Column.__sub__,
    "*": Column.__mul__,
    "/": Column.__truediv__,
}


def _split_arith(expr: str, ops: str) -> list[str] | None:
    """Split at paren/quote depth 0 on the single-char operators in
    ``ops`` → ``[operand, op, operand, ...]``, or None when the
    expression contains none of them."""
    out: list[str] = []
    buf: list[str] = []
    depth, q = 0, None
    for ch in expr:
        if q:
            buf.append(ch)
            if ch == q:
                q = None
            continue
        if ch in "'\"":
            q = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif depth == 0 and ch in ops:
            out.append("".join(buf))
            out.append(ch)
            buf = []
        else:
            buf.append(ch)
    if not out:
        return None
    out.append("".join(buf))
    return out


# ---------------------------------------------------------------------------
# compilation: (col, dtype, multi) triples
# ---------------------------------------------------------------------------
# ``col is None`` + dtype=StructType ⇒ the root resource row (fields are
# top-level DataFrame columns). ``multi`` ⇒ col is array<dtype>.


def _get(col: Column | None, dtype: T.StructType, name: str) -> Column:
    return F.col(name) if col is None else col.getField(name)


def _nz_size(col: Column) -> Column:
    return F.when(col.isNull(), F.lit(0)).otherwise(F.size(col))


class _Compiler:
    def __init__(self, constants: dict[str, Any]):
        self.constants = constants

    def compile(
        self,
        path: str,
        col: Column | None,
        dtype: T.DataType,
        multi: bool = False,
    ) -> tuple[Column, T.DataType, bool]:
        """Compile a FHIRPath — an arithmetic expression over singleton
        numeric operands, or a plain navigation path."""
        for ops in ("+-", "*/"):  # lowest precedence splits first
            parts = _split_arith(path, ops)
            if parts is not None:
                acc: Column | None = None
                for i in range(0, len(parts), 2):
                    operand = self._num_operand(parts[i], col, dtype, multi)
                    acc = (
                        operand
                        if acc is None
                        else _ARITH[parts[i - 1]](acc, operand)
                    )
                return acc, T.DoubleType(), False
        return self._path(path, col, dtype, multi)

    def _num_operand(
        self, expr: str, col: Column | None, dtype: T.DataType, multi: bool
    ) -> Column:
        """One arithmetic operand → a DOUBLE Column: a numeric literal,
        a parenthesized sub-expression, or a singleton path (FHIR stores
        decimal as string — README.md:343-351 — so string leaves cast)."""
        expr = expr.strip()
        if not expr:
            raise ViewPathError(
                "empty arithmetic operand (unary +/- is not supported)"
            )
        if expr.startswith("(") and expr.endswith(")") and _balanced(expr[1:-1]):
            sub, _, m = self.compile(expr[1:-1], col, dtype, multi)
            if m:
                raise ViewPathError("arithmetic needs singleton operands")
            return sub.cast("double")
        try:
            return F.lit(float(expr))
        except ValueError:
            pass
        sub, sdt, m = self.compile(expr, col, dtype, multi)
        if m:
            raise ViewPathError(
                f"arithmetic operand {expr!r} yields a collection — "
                "append first()"
            )
        if isinstance(sdt, T.StringType):
            return sub.try_cast("double")
        return sub.cast("double")

    def _path(
        self,
        path: str,
        col: Column | None,
        dtype: T.DataType,
        multi: bool = False,
    ) -> tuple[Column, T.DataType, bool]:
        """Compile a navigation FHIRPath against the (col, dtype, multi)
        context."""
        # parent tracking for lowBoundary/highBoundary sibling lookup
        parent: tuple[Column | None, T.DataType] | None = None
        leaf_name: str | None = None
        for name, arg in _parse_segments(path):
            if arg is None:  # plain navigation
                col, dtype, multi, parent, leaf_name = self._nav(
                    col, dtype, multi, name
                )
                continue
            col, dtype, multi = self._fn(
                name, arg, col, dtype, multi, parent, leaf_name
            )
            if name not in ("where", "extension"):
                parent, leaf_name = None, None
        if col is None:
            raise ViewPathError(f"path {path!r} selects the whole resource")
        return col, dtype, multi

    # -- navigation ---------------------------------------------------------
    def _nav(self, col, dtype, multi, name):
        if name == "$this":
            if col is None:
                raise ViewPathError("$this is only valid inside forEach")
            return col, dtype, multi, None, None
        if not isinstance(dtype, T.StructType):
            raise ViewPathError(
                f"cannot navigate {name!r} from non-struct {dtype.simpleString()}"
            )
        if name not in dtype.fieldNames():
            raise ViewPathError(
                f"element {name!r} not in schema "
                f"(has: {', '.join(dtype.fieldNames()[:12])}…)"
            )
        fdt = dtype[name].dataType
        parent = (col, dtype)
        if not multi:
            child = _get(col, dtype, name)
            if isinstance(fdt, T.ArrayType):
                return child, fdt.elementType, True, parent, name
            return child, fdt, False, parent, name
        # collection semantics: project each element, drop empties, flatten
        projected = F.transform(col, lambda x: x.getField(name))
        if isinstance(fdt, T.ArrayType):
            flat = F.flatten(F.filter(projected, lambda a: a.isNotNull()))
            return flat, fdt.elementType, True, parent, name
        kept = F.filter(projected, lambda v: v.isNotNull())
        return kept, fdt, True, parent, name

    # -- functions ----------------------------------------------------------
    def _fn(self, name, arg, col, dtype, multi, parent, leaf_name):
        if name == "getResourceKey":
            if col is not None:
                raise ViewPathError("getResourceKey() must start a path")
            if "id" not in dtype.fieldNames():
                raise ViewPathError("resource has no id column")
            return F.col("id"), dtype["id"].dataType, False
        if name == "first":
            if not multi:
                return col, dtype, False
            return F.get(col, 0), dtype, False
        if name == "exists":
            e = _nz_size(col) > 0 if multi else col.isNotNull()
            return e, T.BooleanType(), False
        if name == "empty":
            e = _nz_size(col) == 0 if multi else col.isNull()
            return e, T.BooleanType(), False
        if name == "count":
            c = (
                _nz_size(col)
                if multi
                else F.when(col.isNull(), F.lit(0)).otherwise(F.lit(1))
            )
            return c, T.IntegerType(), False
        if name == "where":
            if not multi:
                raise ViewPathError("where() requires a collection")
            pred = self._predicate(arg, dtype)
            return F.filter(col, pred), dtype, True
        if name == "extension":
            url = _literal(arg, self.constants)
            col, dtype, multi, _, _ = self._nav(col, dtype, multi, "extension")
            if not isinstance(dtype, T.StructType) or "url" not in dtype.fieldNames():
                raise ViewPathError("extension elements have no url field")
            return (
                F.filter(col, lambda x: x.getField("url") == F.lit(url)),
                dtype,
                True,
            )
        if name == "getReferenceKey":
            if multi:
                raise ViewPathError("getReferenceKey() needs a singleton Reference")
            if not isinstance(dtype, T.StructType) or "reference" not in dtype.fieldNames():
                raise ViewPathError("getReferenceKey() target is not a Reference")
            ref = col.getField("reference")
            parts = F.split(ref, "/")
            ok = (F.size(parts) == 2) & ~ref.startswith("#")
            ty = (arg or "").strip()
            if ty:
                ok = ok & (parts.getItem(0) == F.lit(ty))
            return F.when(ok, parts.getItem(1)), T.StringType(), False
        if name in ("toInteger", "toDecimal", "toString"):
            if multi:
                raise ViewPathError(f"{name}() needs a singleton")
            target = {
                "toInteger": "int",
                "toDecimal": "double",
                "toString": "string",
            }[name]
            cast = col.try_cast(target)
            return (
                cast,
                {"int": T.IntegerType(), "double": T.DoubleType(),
                 "string": T.StringType()}[target],
                False,
            )
        if name in ("lowBoundary", "highBoundary"):
            if multi:
                raise ViewPathError(f"{name}() needs a singleton")
            if parent is None or leaf_name is None:
                raise ViewPathError(f"{name}() needs a named date element")
            pcol, pdtype = parent
            ann = f"__{leaf_name}_{'start' if name == 'lowBoundary' else 'end'}"
            if ann not in pdtype.fieldNames():
                raise ViewPathError(
                    f"{name}() needs the {ann} date-range annotation — "
                    "encode with annotations=True (fhir/annotations.py)"
                )
            c = _get(pcol, pdtype, ann)
            return c, pdtype[ann].dataType, False
        raise ViewPathError(f"unsupported FHIRPath function: {name}()")

    # -- predicates (where(...) args and view-level where paths) ------------
    def _predicate(self, expr: str, dtype: T.DataType):
        """Compile ``field op literal`` / bare truthy path to a lambda
        over a collection element."""

        def build(x: Column) -> Column:
            return self._bool_expr(expr, x, dtype)

        return build

    def _bool_expr(self, expr: str, col: Column | None, dtype: T.DataType) -> Column:
        expr = expr.strip()
        # FHIRPath boolean combinators, lowest precedence first
        for kw, combine in (("or", Column.__or__), ("and", Column.__and__)):
            parts = _split_kw(expr, kw)
            if len(parts) > 1:
                out = self._bool_expr(parts[0], col, dtype)
                for p in parts[1:]:
                    out = combine(out, self._bool_expr(p, col, dtype))
                return out
        if expr.startswith("(") and expr.endswith(")") and _balanced(expr[1:-1]):
            return self._bool_expr(expr[1:-1], col, dtype)
        if expr.startswith("not "):
            return ~self._bool_expr(expr[4:], col, dtype)
        m = _CMP.match(expr.strip())
        if m and m.group(1).strip():
            lhs, dt, multi = self.compile(m.group(1).strip(), col, dtype)
            lit = F.lit(_literal(m.group(3), self.constants))
            op = _OPS[m.group(2)]
            if multi:  # FHIRPath collection comparison: any element matches
                return F.exists(lhs, lambda v: op(v, lit))
            return op(lhs, lit)
        sub, dt, multi = self.compile(expr.strip(), col, dtype)
        if multi:
            return _nz_size(sub) > 0
        if isinstance(dt, T.BooleanType):
            return F.coalesce(sub, F.lit(False))
        return sub.isNotNull()


# ---------------------------------------------------------------------------
# view execution
# ---------------------------------------------------------------------------


def _constants(view: dict) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for c in view.get("constant", []):
        val = [v for k, v in c.items() if k.startswith("value")]
        if len(val) != 1:
            raise ViewPathError(f"constant {c.get('name')!r} needs one value[x]")
        out[c["name"]] = val[0]
    return out


_REPEAT = re.compile(r"^(?:(.+)\.)?repeat\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)$")


def _unroll_repeat(view: dict, comp: "_Compiler", schema: T.StructType) -> dict:
    """Rewrite ``forEach: "repeat(x)"`` into a unionAll of depth-unrolled
    branches (``x``, ``x.x``, …) — FHIRPath's transitive projection
    closure, bounded statically by how deep the SCHEMA actually nests
    ``x`` (Spark types are non-recursive, so the closure is finite by
    construction). Each branch compiles independently, so levels whose
    struct types differ still union by name."""
    selects = view.get("select", [])
    out, changed = [], False
    for s in selects:
        fe = s.get("forEach") or s.get("forEachOrNull")
        m = _REPEAT.match(fe.strip()) if fe else None
        if not m:
            out.append(s)
            continue
        prefix, field = m.group(1), m.group(2)
        if prefix:
            _, dt, _multi = comp.compile(prefix, None, schema)
        else:
            dt = schema
        depth, cur = 0, dt
        while isinstance(cur, T.StructType) and field in cur.fieldNames():
            nxt = cur[field].dataType
            cur = nxt.elementType if isinstance(nxt, T.ArrayType) else nxt
            depth += 1
        if depth == 0:
            raise ViewPathError(
                f"repeat({field}): element not in schema at that position"
            )
        key = "forEach" if "forEach" in s else "forEachOrNull"
        rest = {k: v for k, v in s.items() if k not in ("forEach", "forEachOrNull")}
        branches = [
            {**rest, key: ".".join(([prefix] if prefix else []) + [field] * k)}
            for k in range(1, depth + 1)
        ]
        out.append({"unionAll": branches})
        changed = True
    return {**view, "select": out} if changed else view


def run_view(df: DataFrame, view: dict) -> DataFrame:
    """Execute a ViewDefinition over a Parquet-on-FHIR DataFrame.

    Plan shape: optional resourceType filter → view-level ``where``
    filters (all pushdown-eligible) → one ``explode``/``explode_outer``
    per forEach → a single final projection. No shuffle is introduced;
    output partitioning is the input's. ``forEach: "repeat(x)"``
    unrolls to a unionAll over every nesting depth the schema holds.
    """
    comp = _Compiler(_constants(view))
    rtype = view.get("resource")
    if rtype and "resourceType" in df.columns:
        df = df.filter(F.col("resourceType") == rtype)
    for w in view.get("where", []):
        df = df.filter(comp._bool_expr(w["path"], None, df.schema))
    view = _unroll_repeat(view, comp, df.schema)

    selects = view.get("select", [])
    unions = [s for s in selects if "unionAll" in s]
    if len(unions) > 1:
        raise ViewPathError("at most one top-level unionAll item is supported")
    if unions:
        u = unions[0]
        if set(u) - {"unionAll"}:
            raise ViewPathError(
                "unionAll may not be combined with other keys in the same "
                "select item (supported subset)"
            )
        base = [s for s in selects if "unionAll" not in s]
        branches = [
            run_view(
                df,
                {**{k: v for k, v in view.items() if k != "select"},
                 "resource": None,  # already filtered
                 "select": base + [b]},
            )
            for b in u["unionAll"]
        ]
        out = branches[0]
        for b in branches[1:]:
            out = out.unionByName(b)
        return out

    out_cols: list[Column] = []
    n_ctx = 0

    def apply_select(d: DataFrame, sel: dict, ctx: str | None,
                     ctx_dtype: T.DataType | None) -> DataFrame:
        nonlocal n_ctx
        fe = sel.get("forEach") or sel.get("forEachOrNull")
        if fe is not None:
            if ctx is None:
                col, dtype, multi = comp.compile(fe, None, d.schema)
            else:
                col, dtype, multi = comp.compile(fe, F.col(ctx), ctx_dtype)
            alias = f"__vd{n_ctx}"
            n_ctx += 1
            if multi:
                gen = F.explode(col) if "forEach" in sel else F.explode_outer(col)
                d = d.withColumn(alias, gen)
            else:  # singleton collection: no row multiplication
                d = d.withColumn(alias, col)
                if "forEach" in sel:
                    d = d.filter(F.col(alias).isNotNull())
            ctx, ctx_dtype = alias, dtype
        for c in sel.get("column", []):
            if ctx is None:
                col, dtype, multi = comp.compile(c["path"], None, d.schema)
            else:
                col, dtype, multi = comp.compile(c["path"], F.col(ctx), ctx_dtype)
            if multi and not c.get("collection"):
                raise ViewPathError(
                    f"column {c['name']!r} path yields a collection — "
                    "append first() or set collection: true"
                )
            out_cols.append(col.alias(c["name"]))
        for sub in sel.get("select", []):
            d = apply_select(d, sub, ctx, ctx_dtype)
        return d

    for sel in selects:
        df = apply_select(df, sel, None, None)
    if not out_cols:
        raise ViewPathError("view selects no columns")
    return df.select(*out_cols)
