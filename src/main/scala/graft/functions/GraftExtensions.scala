package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the builtin higher-order-function forms of
  * dot product and squared-L2 distance into the codegen'd native
  * expressions.
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *     → graft_dot(a, b)
  *   aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0.0, …)
  *     → graft_l2sq(a, b)
  *
  * Semantics are identical by construction (same ascending-index fold
  * order, same null behavior — see [[VectorFoldExpression]]), so this
  * is a pure strength reduction: user code or SQL written in the
  * portable HOF style silently gets the primitive-loop plan. Matching
  * is deliberately conservative: double arrays only, lambda bodies
  * must reference exactly the lambda's own variables, zero must be the
  * literal 0.0, and the finish lambda must be identity.
  */
object VectorFoldRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def sameVar(e: Expression, v: NamedExpression): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _ => false
  }

  /** merge = (acc, v) -> acc + v (either order — addition commutes). */
  private def isSumMerge(merge: Expression): Boolean = merge match {
    case LambdaFunction(Add(l, r, _), Seq(acc, v), _) =>
      (sameVar(l, acc) && sameVar(r, v)) || (sameVar(l, v) && sameVar(r, acc))
    case _ => false
  }

  private def isIdentityFinish(finish: Expression): Boolean = finish match {
    case LambdaFunction(body, Seq(v), _) => sameVar(body, v)
    case _ => false
  }

  private def isZeroDouble(zero: Expression): Boolean = zero match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  /** (x, y) -> x * y over exactly the zip_with lambda variables. */
  private def isProductLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(l, r, _), Seq(x, y), _) =>
      (sameVar(l, x) && sameVar(r, y)) || (sameVar(l, y) && sameVar(r, x))
    case _ => false
  }

  /** (x, y) -> (x - y) * (x - y); the square makes operand order moot,
    * but both factors must be the SAME subtraction. */
  private def isSquaredDiffLambda(f: Expression): Boolean = f match {
    case LambdaFunction(
        Multiply(Subtract(a1, b1, _), Subtract(a2, b2, _), _),
        Seq(x, y), _) =>
      val sameDiff = (sameVar(a1, x) && sameVar(b1, y) &&
        sameVar(a2, x) && sameVar(b2, y)) ||
        (sameVar(a1, y) && sameVar(b1, x) &&
          sameVar(a2, y) && sameVar(b2, x))
      sameDiff
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(a, b, f), zero, merge, finish)
          if isDoubleArray(a) && isDoubleArray(b) && isZeroDouble(zero) &&
            isSumMerge(merge) && isIdentityFinish(finish) &&
            isProductLambda(f) =>
        ArrayDotProduct(a, b)
      case ArrayAggregate(ZipWith(a, b, f), zero, merge, finish)
          if isDoubleArray(a) && isDoubleArray(b) && isZeroDouble(zero) &&
            isSumMerge(merge) && isIdentityFinish(finish) &&
            isSquaredDiffLambda(f) =>
        ArrayL2SqDistance(a, b)
    }
}

/** Session extension wiring (`spark.sql.extensions=graft.functions.GraftExtensions`):
  * injects [[VectorFoldRewrite]] and the SQL-callable `graft_*`
  * functions into every session built with it. For sessions the caller
  * does not construct (notebooks, test harnesses), the same surface is
  * available post-hoc via [[GraftFunctions.register]] and
  * `spark.experimental.extraOptimizations`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => VectorFoldRewrite)
    // MV auto-routing: a no-op until MvRewrite.register is called, so
    // injecting it unconditionally costs nothing
    ext.injectOptimizerRule(_ => graft.plans.MvRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new ExpressionInfo("graft.functions", name),
          builder))
    }
  }
}

/** SQL-callable registration of the native expressions. */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> { args: Seq[Expression] =>
      require(args.length == 2, "graft_dot(a, b)")
      ArrayDotProduct(args(0), args(1))
    },
    "graft_l2sq" -> { args: Seq[Expression] =>
      require(args.length == 2, "graft_l2sq(a, b)")
      ArrayL2SqDistance(args(0), args(1))
    },
    "graft_hashed_ngrams" -> { args: Seq[Expression] =>
      require(args.length == 2, "graft_hashed_ngrams(tokens, n)")
      HashedNGrams(args(0), intArg(args(1), "n"))
    },
    "graft_sorted_jaccard" -> { args: Seq[Expression] =>
      require(args.length == 2, "graft_sorted_jaccard(a, b)")
      SortedLongSetJaccard(args(0), args(1))
    },
    "graft_minhash" -> { args: Seq[Expression] =>
      require(args.length == 2, "graft_minhash(shingles, k)")
      MinHashSignatures(args(0), intArg(args(1), "k"))
    },
    "graft_winnow" -> { args: Seq[Expression] =>
      require(args.length == 3, "graft_winnow(text, k, w)")
      WinnowingFingerprints(args(0), intArg(args(1), "k"), intArg(args(2), "w"))
    },
    "graft_simhash" -> { args: Seq[Expression] =>
      require(args.length == 3, "graft_simhash(tokens, bits, seed)")
      SimHash(args(0), intArg(args(1), "bits"), intArg(args(2), "seed"))
    },
    "graft_stopword_hits" -> { args: Seq[Expression] =>
      require(args.length == 2, "graft_stopword_hits(tokens, stopwords_csv)")
      args(1) match {
        case Literal(s, _) if s != null =>
          StopwordHitCount(args(0),
            s.toString.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        case other => throw new IllegalArgumentException(
          s"stopwords_csv must be a non-null string literal, got $other")
      }
    },
    "graft_ngram_repetition" -> { args: Seq[Expression] =>
      require(args.length == 2, "graft_ngram_repetition(tokens, n)")
      NGramRepetition(args(0), intArg(args(1), "n"))
    })

  /** Register all graft_* functions on an EXISTING session (temp
    * functions — no extensions config required). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      org.apache.spark.sql.graftbridge.ColumnBridge
        .registerTempFunction(spark, name, builder)
    }
}
