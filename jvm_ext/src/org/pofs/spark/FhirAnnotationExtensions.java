package org.pofs.spark;

import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.SparkSessionExtensions;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.rules.Rule;

import scala.runtime.AbstractFunction1;
import scala.runtime.BoxedUnit;

/**
 * Entry point for {@code spark.sql.extensions}: injects
 * {@link FhirAnnotationRule} into the operator-optimization batch so
 * raw SQL text benefits from the Parquet-on-FHIR annotation columns
 * (SURVEY.md §4.1 v2). Wire with:
 *
 * <pre>
 *   spark.jars           = .../pofs-catalyst-ext.jar
 *   spark.sql.extensions = org.pofs.spark.FhirAnnotationExtensions
 * </pre>
 *
 * (parquet_on_fhir_spark/session.py does this automatically when the
 * bundled jar is present).
 */
public class FhirAnnotationExtensions
        extends AbstractFunction1<SparkSessionExtensions, BoxedUnit> {

    @Override
    public BoxedUnit apply(SparkSessionExtensions extensions) {
        extensions.injectOptimizerRule(
                new AbstractFunction1<SparkSession, Rule<LogicalPlan>>() {
                    @Override
                    public Rule<LogicalPlan> apply(SparkSession session) {
                        return new FhirAnnotationRule();
                    }
                });
        return BoxedUnit.UNIT;
    }
}
