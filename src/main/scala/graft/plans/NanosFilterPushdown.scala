package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule: make time filters on nanosecond-sourced event
  * columns reach the parquet scan.
  *
  * The fixture `events.ts` is parquet TIMESTAMP(NANOS), which Spark
  * reads as an epoch-nanos LONG; [[graft.sources.Tables.events]]
  * converts it with `timestamp_micros(ts div 1000)`. A filter written
  * against the *converted* column —
  * `Filter(timestamp_micros(ts_ns div 1000) >= TS_LIT)` — cannot be
  * pushed into the scan by Catalyst (the conversion wraps the
  * attribute), so at 100 TB every row group is read even for a
  * last-day query.
  *
  * `floor(n / 1000)` is monotone non-decreasing in `n`, so each
  * comparison against a literal implies an equivalent raw-nanos
  * bound:
  *   floor(n/1000) ≥ C  ⟺  n ≥ 1000·C
  *   floor(n/1000) >  C  ⟺  n ≥ 1000·(C+1)   (⟸ n > 1000·C+999)
  *   floor(n/1000) ≤ C  ⟺  n < 1000·(C+1)   (n ≤ 1000·C+999)
  *   floor(n/1000) <  C  ⟺  n < 1000·C
  *
  * The rule ADDS the implied raw conjunct and keeps the original
  * predicate — semantics are trivially preserved (the new conjunct is
  * implied), and Catalyst's own `PushDownPredicates` +
  * parquet-filter conversion then push the raw-attribute conjunct to
  * the scan, where row-group min/max statistics skip data.
  *
  * This is the rewrite SURVEY.md §7.3 anticipated ("rewrite
  * filter-on-converted-time into a raw range for parquet pushdown"),
  * registered through `SparkSessionExtensions`
  * ([[GraftExtensions]]).
  */
object NanosFilterPushdown extends Rule[LogicalPlan] {

  /** Matches `timestamp_micros(x div 1000)` where x is a LONG
    * attribute, returning x.
    */
  private object MicrosOfNanos {
    def unapply(e: Expression): Option[Attribute] = e match {
      case MicrosToTimestamp(IntegralDivide(a: Attribute, Literal(1000L, LongType), _))
          if a.dataType == LongType => Some(a)
      case _ => None
    }
  }

  private def tsLitMicros(l: Literal): Option[Long] = l match {
    case Literal(v: Long, TimestampType) => Some(v) // micros since epoch
    case _ => None
  }

  /** The implied raw-nanos predicate for one comparison, if any.
    *
    * CAUTION: Spark's `div` (IntegralDivide) truncates toward ZERO,
    * which is floor for non-negative nanos but ceil for pre-epoch
    * (negative) values. The bounds below are derived from
    * `trunc(n/1000) ⋛ C ⟹ n/1000 ⋛ C∓1` — necessary conditions valid
    * for BOTH signs (up to 1 µs weaker than the floor-only bounds, so
    * row-group skipping is unaffected, and no pre-1970 row can be
    * wrongly filtered).
    */
  private def implied(cmp: BinaryComparison): Option[Expression] = {
    // (us+delta)·1000 with overflow checks: a literal past ±year 2262
    // cannot be represented in raw nanos, so it implies no useful bound
    // — skip the rewrite rather than emit a wrapped (wrong-sign) one.
    def nanos(us: Long, delta: Long = 0L): Option[Literal] =
      try Some(Literal(Math.multiplyExact(Math.addExact(us, delta), 1000L), LongType))
      catch { case _: ArithmeticException => None }
    cmp match {
      // trunc(n/1000) >= C ⟹ n/1000 > C−1 ⟹ n ≥ (C−1)·1000 + 1
      case GreaterThanOrEqual(MicrosOfNanos(a), l: Literal) =>
        tsLitMicros(l).flatMap(us => nanos(us, -1).map(GreaterThan(a, _)))
      // trunc(n/1000) > C ⟹ trunc ≥ C+1 ⟹ n > C·1000
      case GreaterThan(MicrosOfNanos(a), l: Literal) =>
        tsLitMicros(l).flatMap(us => nanos(us).map(GreaterThan(a, _)))
      // trunc(n/1000) <= C ⟹ n/1000 < C+1 ⟹ n < (C+1)·1000
      case LessThanOrEqual(MicrosOfNanos(a), l: Literal) =>
        tsLitMicros(l).flatMap(us => nanos(us, 1).map(LessThan(a, _)))
      // trunc(n/1000) < C ⟹ trunc ≤ C−1 ⟹ n < C·1000
      case LessThan(MicrosOfNanos(a), l: Literal) =>
        tsLitMicros(l).flatMap(us => nanos(us).map(LessThan(a, _)))
      case EqualTo(MicrosOfNanos(a), l: Literal) =>
        tsLitMicros(l).flatMap { us =>
          for (lo <- nanos(us, -1); hi <- nanos(us, 1))
            yield And(GreaterThan(a, lo), LessThan(a, hi))
        }
      // literal-on-the-left mirrors (C ⋛ trunc(n/1000) ⟺ flipped)
      case GreaterThanOrEqual(l: Literal, MicrosOfNanos(a)) =>
        tsLitMicros(l).flatMap(us => nanos(us, 1).map(LessThan(a, _)))
      case GreaterThan(l: Literal, MicrosOfNanos(a)) =>
        tsLitMicros(l).flatMap(us => nanos(us).map(LessThan(a, _)))
      case LessThanOrEqual(l: Literal, MicrosOfNanos(a)) =>
        tsLitMicros(l).flatMap(us => nanos(us, -1).map(GreaterThan(a, _)))
      case LessThan(l: Literal, MicrosOfNanos(a)) =>
        tsLitMicros(l).flatMap(us => nanos(us).map(GreaterThan(a, _)))
      case EqualTo(l: Literal, MicrosOfNanos(a)) =>
        tsLitMicros(l).flatMap { us =>
          for (lo <- nanos(us, -1); hi <- nanos(us, 1))
            yield And(GreaterThan(a, lo), LessThan(a, hi))
        }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val extra = conjuncts.collect {
        case c: BinaryComparison => implied(c)
      }.flatten
      // only add conjuncts not already present
      val novel = extra.filterNot(e => conjuncts.exists(_.semanticEquals(e)))
      if (novel.isEmpty) f
      else Filter((conjuncts ++ novel).reduce(And), child)
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
    case other => Seq(other)
  }
}

/** Engine extensions, registered with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`:
  * the nanos-pushdown optimizer rule, plus SQL registration of the
  * native expressions — `SELECT simhash64(tokens), vec_dot(a, b) …`
  * works from the SQL-text entry point, not only the Column API
  * (the reference exposes everything through SQL text, so the
  * extension surface must too).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

  private def register(e: SparkSessionExtensions, name: String, arity: Int,
      usage: String)(build: Seq[Expression] => Expression): Unit =
    e.injectFunction((FunctionIdentifier(name),
      // 3-arg ExpressionInfo is (className, db, name) — passing usage
      // there would corrupt the registered identity; the long form
      // carries usage in its proper slot
      new ExpressionInfo("graft.functions", null, name, usage,
        "", "", "", "", "", "", "built-in"),
      (args: Seq[Expression]) => {
        require(args.length == arity, s"$name expects $arity arguments")
        build(args)
      }))

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => NanosFilterPushdown)
    import graft.functions._
    register(e, "simhash64", 1,
      "simhash64(tokens) - 64-bit SimHash of a string array")(
      a => SimHash64(a.head))
    register(e, "vec_dot", 2,
      "vec_dot(a, b) - double dot product of two double arrays")(
      a => VecDot(a(0), a(1)))
    register(e, "pq_adc", 2,
      "pq_adc(codes, table) - PQ asymmetric-distance lookup-add")(
      a => PqAdc(a(0), a(1)))
    register(e, "centroid_scores", 2,
      "centroid_scores(v, centroids) - dot of v with each centroid")(
      a => CentroidScores(a(0), a(1)))
    register(e, "arg_max_double", 1,
      "arg_max_double(scores) - index of the max element")(
      a => ArgMaxDouble(a.head))
    register(e, "ngram_hash64", 2,
      "ngram_hash64(tokens, n) - xxhash64 of each word n-gram")(
      a => NgramHash64(a(0), a(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"ngram_hash64: n must be an integer literal, got $other")
      }))
    register(e, "nfc_normalize", 1,
      "nfc_normalize(s) - Unicode NFC canonical composition")(
      a => NfcNormalize(a.head))
    register(e, "word_ngrams", 2,
      "word_ngrams(tokens, n) - generator: one row per n-token window")(
      a => WordNgrams(a(0), a(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"word_ngrams: n must be an integer literal, got $other")
      }))
  }
}
