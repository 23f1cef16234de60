package org.pofs.spark;

import java.time.LocalDate;
import java.time.LocalDateTime;
import java.time.OffsetDateTime;
import java.time.YearMonth;
import java.time.ZoneOffset;
import java.util.ArrayList;
import java.util.HashMap;
import java.util.List;
import java.util.Map;
import java.util.regex.Matcher;
import java.util.regex.Pattern;

import org.apache.spark.sql.catalyst.expressions.And;
import org.apache.spark.sql.catalyst.expressions.Attribute;
import org.apache.spark.sql.catalyst.expressions.AttributeReference;
import org.apache.spark.sql.catalyst.expressions.BinaryComparison;
import org.apache.spark.sql.catalyst.expressions.Cast;
import org.apache.spark.sql.catalyst.expressions.EqualTo;
import org.apache.spark.sql.catalyst.expressions.Expression;
import org.apache.spark.sql.catalyst.expressions.GreaterThan;
import org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual;
import org.apache.spark.sql.catalyst.expressions.IsNull;
import org.apache.spark.sql.catalyst.expressions.LessThan;
import org.apache.spark.sql.catalyst.expressions.LessThanOrEqual;
import org.apache.spark.sql.catalyst.expressions.Literal;
import org.apache.spark.sql.catalyst.expressions.Or;
import org.apache.spark.sql.catalyst.plans.logical.Filter;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.DecimalType;
import org.apache.spark.sql.types.DoubleType;
import org.apache.spark.sql.types.FloatType;
import org.apache.spark.sql.types.StringType;
import org.apache.spark.sql.types.TimestampType;
import org.apache.spark.unsafe.types.UTF8String;

/**
 * Annotation-aware predicate rewrite as an injected Catalyst optimizer
 * rule — the v2 form of SURVEY.md §4.1 (the v1 typed API lives in
 * parquet_on_fhir_spark/plans/rewrite.py). The Parquet-on-FHIR format
 * stores dates as lossless STRINGS plus derived TIMESTAMP annotation
 * columns __{elem}_start / __{elem}_end (reference README.md:314-341,
 * "useful for querying the data"); this rule makes raw
 * {@code spark.sql("... WHERE birthDate >= '2020-03'")} text benefit
 * from them with NO typed-API call.
 *
 * Semantics-preserving by construction: the user's string predicate is
 * NEVER replaced — the rule only ADDS implied conjuncts on the
 * annotation columns, which Spark then pushes into the Parquet scan
 * (PushedFilters) for row-group min/max pruning. Soundness of the
 * implication, for valid FHIR lexical forms:
 *
 *  - the "earliest instant" padding is lexicographically MONOTONE on
 *    the date/time body, so {@code x >= 'v'} (string order) implies
 *    {@code __x_start >= fhir_start(v) - SLACK}; mirrored for <=;
 *  - SLACK (48 h) absorbs the two non-monotone lexical effects:
 *    timezone offsets (±14 h each side) and shorter-form time padding
 *    (< 1 min) — far below row-group granularity, so pruning power is
 *    unaffected;
 *  - {@code x = 'v'} implies the annotations EQUAL the literal's own
 *    bounds (annotations are deterministic functions of the string) —
 *    no slack;
 *  - malformed strings have NULL annotations while their string
 *    predicate may still be true, so every implied conjunct carries an
 *    {@code __x_start IS NULL OR} escape (Parquet pushes Or(IsNull,
 *    cmp); row groups without nulls still prune on min/max).
 *
 * The rule is idempotent (implied conjuncts are semanticEquals-checked
 * against existing ones) so the fixpoint operator-optimization batch it
 * is injected into converges. Only top-level conjuncts of a Filter are
 * examined; comparisons under OR cannot soundly contribute a global
 * conjunct and are left alone.
 */
public class FhirAnnotationRule extends Rule<LogicalPlan> {

    /** 48 h in microseconds: covers ±14 h timezone offsets on both
     *  sides of the comparison plus sub-minute padding effects. */
    private static final long SLACK_MICROS = 48L * 3600L * 1000L * 1000L;

    @Override
    public LogicalPlan apply(LogicalPlan plan) {
        return transformPlan(plan);
    }

    private LogicalPlan transformPlan(LogicalPlan plan) {
        List<LogicalPlan> kids = new ArrayList<>();
        boolean changed = false;
        scala.collection.Iterator<LogicalPlan> it = plan.children().iterator();
        while (it.hasNext()) {
            LogicalPlan c = it.next();
            LogicalPlan n = transformPlan(c);
            if (n != c) {
                changed = true;
            }
            kids.add(n);
        }
        LogicalPlan cur = changed
                ? (LogicalPlan) plan.withNewChildren(
                        scala.jdk.javaapi.CollectionConverters.asScala(kids).toSeq())
                : plan;
        if (cur instanceof Filter) {
            Filter f = (Filter) cur;
            Expression newCond = rewriteCondition(f.condition(), f.child());
            if (newCond != f.condition()) {
                return new Filter(newCond, f.child());
            }
        }
        return cur;
    }

    private Expression rewriteCondition(Expression cond, LogicalPlan child) {
        Map<String, Attribute> outs = new HashMap<>();
        scala.collection.Iterator<Attribute> it = child.output().iterator();
        while (it.hasNext()) {
            Attribute a = it.next();
            outs.put(a.name(), a);
        }
        List<Expression> conjuncts = new ArrayList<>();
        splitAnd(cond, conjuncts);
        List<Expression> implied = new ArrayList<>();
        for (Expression c : conjuncts) {
            Expression imp = implyAnnotation(c, outs);
            if (imp == null) {
                imp = implyNumeric(c, outs);
            }
            if (imp != null
                    && !alreadyPresent(imp, conjuncts)
                    && !alreadyPresent(imp, implied)) {
                implied.add(imp);
            }
        }
        if (implied.isEmpty()) {
            return cond;
        }
        Expression out = cond;
        for (Expression e : implied) {
            out = new And(out, e);
        }
        return out;
    }

    private static void splitAnd(Expression e, List<Expression> acc) {
        if (e instanceof And) {
            splitAnd(((And) e).left(), acc);
            splitAnd(((And) e).right(), acc);
        } else {
            acc.add(e);
        }
    }

    private static boolean alreadyPresent(Expression imp, List<Expression> list) {
        for (Expression e : list) {
            if (e.semanticEquals(imp)) {
                return true;
            }
        }
        return false;
    }

    private Expression implyAnnotation(Expression c, Map<String, Attribute> outs) {
        if (c instanceof org.apache.spark.sql.catalyst.expressions.In) {
            return implyInList(
                    (org.apache.spark.sql.catalyst.expressions.In) c, outs);
        }
        if (c instanceof org.apache.spark.sql.catalyst.expressions.InSet) {
            return implyInSet(
                    (org.apache.spark.sql.catalyst.expressions.InSet) c, outs);
        }
        if (!(c instanceof BinaryComparison)) {
            return null;
        }
        BinaryComparison bc = (BinaryComparison) c;
        Attribute attr;
        UTF8String lit;
        boolean attrLeft;
        if (bc.left() instanceof AttributeReference
                && bc.right() instanceof Literal
                && ((Literal) bc.right()).value() instanceof UTF8String) {
            attr = (Attribute) bc.left();
            lit = (UTF8String) ((Literal) bc.right()).value();
            attrLeft = true;
        } else if (bc.right() instanceof AttributeReference
                && bc.left() instanceof Literal
                && ((Literal) bc.left()).value() instanceof UTF8String) {
            attr = (Attribute) bc.right();
            lit = (UTF8String) ((Literal) bc.left()).value();
            attrLeft = false;
        } else {
            return null;
        }
        if (!(attr.dataType() instanceof StringType)) {
            return null;
        }
        Attribute start = outs.get("__" + attr.name() + "_start");
        Attribute end = outs.get("__" + attr.name() + "_end");
        if (start == null || end == null
                || !(start.dataType() instanceof TimestampType)
                || !(end.dataType() instanceof TimestampType)) {
            return null;
        }
        long[] bounds = fhirBounds(lit.toString());
        if (bounds == null) {
            return null;
        }
        String op;
        if (c instanceof EqualTo) {
            op = "eq";
        } else if (c instanceof GreaterThan || c instanceof GreaterThanOrEqual) {
            op = attrLeft ? "ge" : "le";
        } else if (c instanceof LessThan || c instanceof LessThanOrEqual) {
            op = attrLeft ? "le" : "ge";
        } else {
            return null;
        }
        Expression core;
        if (op.equals("eq")) {
            core = new And(
                    new EqualTo(start, tsLit(bounds[0])),
                    new Or(new IsNull(end), new EqualTo(end, tsLit(bounds[1]))));
        } else if (op.equals("ge")) {
            core = new GreaterThanOrEqual(start, tsLit(bounds[0] - SLACK_MICROS));
        } else {
            core = new LessThanOrEqual(start, tsLit(bounds[0] + SLACK_MICROS));
        }
        return new Or(new IsNull(start), core);
    }

    /**
     * CAST(elem AS DOUBLE/FLOAT/DECIMAL) cmp numeric-literal, where a
     * DECIMAL(38,6) annotation __elem_numeric exists (lossless string
     * decimals + derived numeric column, reference README.md:349-363).
     * The annotation is the string rounded to 6 dp, so |ann − value| ≤
     * 5e-7 and a ±1e-6 slack makes the range implication sound:
     *   v > L  ⇒  ann ≥ L − 1e-6      v < L  ⇒  ann ≤ L + 1e-6
     * Equality gets the same slackened RANGE (not equality: round-trip
     * through double may not hit the 6-dp value exactly). Strings that
     * fail the decimal cast have a NULL annotation while the user's own
     * ANSI cast would error — the IsNull escape keeps semantics exact
     * for rows the user's predicate would accept.
     */
    private Expression implyNumeric(Expression c, Map<String, Attribute> outs) {
        if (!(c instanceof BinaryComparison)) {
            return null;
        }
        BinaryComparison bc = (BinaryComparison) c;
        Attribute attr;
        Object litVal;
        boolean attrLeft;
        Expression l = bc.left(), r = bc.right();
        if (isNumericCastOfStringAttr(l) && r instanceof Literal) {
            attr = (Attribute) ((Cast) l).child();
            litVal = ((Literal) r).value();
            attrLeft = true;
        } else if (isNumericCastOfStringAttr(r) && l instanceof Literal) {
            attr = (Attribute) ((Cast) r).child();
            litVal = ((Literal) l).value();
            attrLeft = false;
        } else {
            return null;
        }
        Double v = numericValue(litVal);
        if (v == null || !Double.isFinite(v) || Math.abs(v) > 1e30) {
            return null;
        }
        Attribute num = outs.get("__" + attr.name() + "_numeric");
        if (num == null || !(num.dataType() instanceof DecimalType)) {
            return null;
        }
        String op;
        if (c instanceof EqualTo) {
            op = "eq";
        } else if (c instanceof GreaterThan || c instanceof GreaterThanOrEqual) {
            op = attrLeft ? "ge" : "le";
        } else if (c instanceof LessThan || c instanceof LessThanOrEqual) {
            op = attrLeft ? "le" : "ge";
        } else {
            return null;
        }
        // lower bounds round the literal DOWN and upper bounds UP, so
        // 6-dp literal quantization can only widen the slack.
        // The slack must be ulp-aware: above |v| ~ 1e10 double ulp
        // exceeds 1e-6, so (v - 1e-6) collapses back to v while the
        // user's cast(string->double) of a data value can legitimately
        // land up to ~ulp(v)/2 away from the 6-dp annotation — a fixed
        // 1e-6 envelope would silently DROP matching rows.  1e-6 covers
        // the annotation's 5e-7 rounding; 2*ulp(v) covers the double
        // rounding of both the literal and the cast value at any
        // magnitude (soundness over selectivity: at 1e30 the envelope
        // is wide but still prunes nothing incorrectly).
        double slack = 1e-6 + 2.0 * Math.ulp(v);
        Literal lo = decLit(v - slack, java.math.RoundingMode.FLOOR);
        Literal hi = decLit(v + slack, java.math.RoundingMode.CEILING);
        Expression core;
        if (op.equals("eq")) {
            core = new And(
                    new GreaterThanOrEqual(num, lo),
                    new LessThanOrEqual(num, hi));
        } else if (op.equals("ge")) {
            core = new GreaterThanOrEqual(num, lo);
        } else {
            core = new LessThanOrEqual(num, hi);
        }
        return new Or(new IsNull(num), core);
    }

    /**
     * elem IN ('v1', ..., 'vk') with every vi a FHIR date implies
     * __elem_start BETWEEN min(start(vi)) and max(start(vi)) — the
     * equality implication (annotation = deterministic function of the
     * matched string) relaxed to the envelope, which is what prunes
     * row groups / partitions for IN-list date filters.
     *
     * Lists past spark.sql.optimizer.inSetConversionThreshold
     * (default 10) reach the optimizer converted to InSet and are
     * handled by {@link #implyInSet} with the same envelope.
     */
    private Expression implyInList(
            org.apache.spark.sql.catalyst.expressions.In in,
            Map<String, Attribute> outs) {
        if (!(in.value() instanceof AttributeReference)
                || !(((Attribute) in.value()).dataType() instanceof StringType)) {
            return null;
        }
        Attribute attr = (Attribute) in.value();
        Attribute start = outs.get("__" + attr.name() + "_start");
        if (start == null || !(start.dataType() instanceof TimestampType)) {
            return null;
        }
        long lo = Long.MAX_VALUE, hi = Long.MIN_VALUE;
        scala.collection.Iterator<Expression> it = in.list().iterator();
        while (it.hasNext()) {
            Expression e = it.next();
            if (!(e instanceof Literal)
                    || !(((Literal) e).value() instanceof UTF8String)) {
                return null;
            }
            long[] b = fhirBounds(((Literal) e).value().toString());
            if (b == null) {
                return null; // one non-date member voids the envelope
            }
            lo = Math.min(lo, b[0]);
            hi = Math.max(hi, b[0]);
        }
        if (lo > hi) {
            return null; // empty IN list
        }
        Expression core = new And(
                new GreaterThanOrEqual(start, tsLit(lo)),
                new LessThanOrEqual(start, tsLit(hi)));
        return new Or(new IsNull(start), core);
    }

    /** The InSet form of {@link #implyInList} (lists past the
     *  inSetConversionThreshold, default 10): same envelope over the
     *  materialized literal set. */
    private Expression implyInSet(
            org.apache.spark.sql.catalyst.expressions.InSet in,
            Map<String, Attribute> outs) {
        if (!(in.child() instanceof AttributeReference)
                || !(((Attribute) in.child()).dataType() instanceof StringType)) {
            return null;
        }
        Attribute attr = (Attribute) in.child();
        Attribute start = outs.get("__" + attr.name() + "_start");
        if (start == null || !(start.dataType() instanceof TimestampType)) {
            return null;
        }
        long lo = Long.MAX_VALUE, hi = Long.MIN_VALUE;
        scala.collection.Iterator<Object> it = in.hset().iterator();
        while (it.hasNext()) {
            Object v = it.next();
            if (!(v instanceof UTF8String)) {
                return null;
            }
            long[] b = fhirBounds(v.toString());
            if (b == null) {
                return null;
            }
            lo = Math.min(lo, b[0]);
            hi = Math.max(hi, b[0]);
        }
        if (lo > hi) {
            return null;
        }
        Expression core = new And(
                new GreaterThanOrEqual(start, tsLit(lo)),
                new LessThanOrEqual(start, tsLit(hi)));
        return new Or(new IsNull(start), core);
    }

    private static boolean isNumericCastOfStringAttr(Expression e) {
        if (!(e instanceof Cast)) {
            return false;
        }
        Cast cast = (Cast) e;
        boolean numericTarget = cast.dataType() instanceof DoubleType
                || cast.dataType() instanceof FloatType
                || cast.dataType() instanceof DecimalType;
        return numericTarget
                && cast.child() instanceof AttributeReference
                && ((Attribute) cast.child()).dataType() instanceof StringType;
    }

    private static Double numericValue(Object litVal) {
        if (litVal instanceof Double) {
            return (Double) litVal;
        }
        if (litVal instanceof Float) {
            return ((Float) litVal).doubleValue();
        }
        if (litVal instanceof Integer) {
            return ((Integer) litVal).doubleValue();
        }
        if (litVal instanceof Long) {
            return ((Long) litVal).doubleValue();
        }
        if (litVal instanceof org.apache.spark.sql.types.Decimal) {
            return ((org.apache.spark.sql.types.Decimal) litVal)
                    .toJavaBigDecimal().doubleValue();
        }
        return null;
    }

    private static Literal decLit(double v, java.math.RoundingMode mode) {
        java.math.BigDecimal bd = java.math.BigDecimal.valueOf(v)
                .setScale(6, mode);
        return new Literal(
                org.apache.spark.sql.types.Decimal.apply(bd),
                new DecimalType(38, 6));
    }

    private static Literal tsLit(long micros) {
        return new Literal(micros, DataTypes.TimestampType);
    }

    private static final Pattern YEAR_P = Pattern.compile("\\d{4}");
    private static final Pattern MONTH_P = Pattern.compile("\\d{4}-\\d{2}");
    private static final Pattern DAY_P = Pattern.compile("\\d{4}-\\d{2}-\\d{2}");
    private static final Pattern TIMED_P = Pattern.compile(
            "(\\d{4}-\\d{2}-\\d{2})T(\\d{2}:\\d{2}(?::\\d{2}(?:\\.\\d+)?)?)"
                    + "(Z|[+-]\\d{2}:\\d{2})");

    /**
     * [startMicros, endMicros] covered by a FHIR date/dateTime lexical
     * form (UTC, millisecond resolution — the same semantics as
     * functions/partial_date.py), or null when not a FHIR date.
     */
    static long[] fhirBounds(String s) {
        s = s.trim();
        try {
            if (YEAR_P.matcher(s).matches()) {
                int y = Integer.parseInt(s);
                return new long[] {
                    micros(LocalDateTime.of(y, 1, 1, 0, 0, 0, 0)),
                    micros(LocalDateTime.of(y, 12, 31, 23, 59, 59, 999_000_000)),
                };
            }
            if (MONTH_P.matcher(s).matches()) {
                YearMonth ym = YearMonth.parse(s);
                return new long[] {
                    micros(ym.atDay(1).atStartOfDay()),
                    micros(ym.atEndOfMonth().atTime(23, 59, 59, 999_000_000)),
                };
            }
            if (DAY_P.matcher(s).matches()) {
                LocalDate d = LocalDate.parse(s);
                return new long[] {
                    micros(d.atStartOfDay()),
                    micros(d.atTime(23, 59, 59, 999_000_000)),
                };
            }
            Matcher m = TIMED_P.matcher(s);
            if (m.matches()) {
                String date = m.group(1);
                String time = m.group(2);
                String tz = m.group(3).equals("Z") ? "+00:00" : m.group(3);
                return new long[] {
                    timedMicros(date, padTime(time, false), tz),
                    timedMicros(date, padTime(time, true), tz),
                };
            }
        } catch (RuntimeException e) {
            return null; // lexically shaped but invalid (month 13, Feb 30...)
        }
        return null;
    }

    /** hh:mm[:ss[.frac]] → hh:mm:ss.SSS, padding the unspecified tail
     *  with the earliest (false) or latest (true) completion. */
    private static String padTime(String t, boolean latest) {
        String fill = latest ? "9" : "0";
        String sec = latest ? "59" : "00";
        int colons = t.length() - t.replace(":", "").length();
        if (colons == 1) {
            return t + ":" + sec + "." + fill + fill + fill;
        }
        int dot = t.indexOf('.');
        if (dot < 0) {
            return t + "." + fill + fill + fill;
        }
        String frac = t.substring(dot + 1);
        frac = frac.length() >= 3 ? frac.substring(0, 3) : frac;
        while (frac.length() < 3) {
            frac = frac + fill;
        }
        return t.substring(0, dot) + "." + frac;
    }

    private static long timedMicros(String date, String paddedTime, String tz) {
        OffsetDateTime odt = OffsetDateTime.parse(date + "T" + paddedTime + tz);
        return odt.toInstant().getEpochSecond() * 1_000_000L
                + odt.toInstant().getNano() / 1_000L;
    }

    private static long micros(LocalDateTime ldt) {
        return ldt.toInstant(ZoneOffset.UTC).getEpochSecond() * 1_000_000L
                + ldt.getNano() / 1_000L;
    }
}
