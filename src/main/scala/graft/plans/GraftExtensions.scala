package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}

/** Engine optimizer extensions (SURVEY §4, §7.2 M5).
  *
  * [[DerivedTokenPrefilter]]: a token-count predicate
  * `size(regexp_extract_all(text, TokenPattern, 1)) > n` cannot reach
  * the parquet scan (UDF-shaped), and the regex is the most expensive
  * scalar in the engine. Every token consumes ≥ 1 character, so
  * `token_count(text) ≤ length(text)` — which makes
  * `length(text) > n` a sound derived pre-filter: cheap (no regex),
  * evaluated first in the conjunction, and it short-circuits the
  * regex for every too-short row. The q20 query adds the analogous
  * `n_chars` guard by hand; this rule derives it for ANY
  * token-count predicate, including user-written ones.
  *
  * Registered via `spark.sql.extensions=graft.plans.GraftExtensions`
  * (Verify/Bench/TestSpark session builders).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => DerivedTokenPrefilter)
}

object DerivedTokenPrefilter extends Rule[LogicalPlan] {

  private val TokenPattern = graft.ops.TextOps.TokenPattern

  private object TokenCountGt {
    /** Matches size(regexp_extract_all(text, TokenPattern, 1)) > lit. */
    def unapply(e: Expression): Option[(Expression, Literal)] = e match {
      case GreaterThan(
            Size(RegExpExtractAll(txt, Literal(pat, StringType), _), _),
            l @ Literal(_, IntegerType))
          if pat != null && pat.toString == TokenPattern =>
        Some((txt, l))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      var changed = false
      val newCond = cond.transformUp {
        case tc @ TokenCountGt(txt, n)
            // idempotence: skip if the guard is already present
            // anywhere in this filter's condition
            if !cond.exists {
              case GreaterThan(Length(t2), n2) =>
                t2.semanticEquals(txt) && n2 == n
              case _ => false
            } =>
          changed = true
          And(GreaterThan(Length(txt), n), tc)
      }
      if (changed) Filter(newCond, child) else f
  }
}
