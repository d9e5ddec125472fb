package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration of the native signature kernels (builder brief
  * §custom-operators path (b) + `SparkSessionExtensions`): the same
  * codegen'd expressions behind [[SignatureExprs]]' Column API become plain
  * SQL functions, so `spark.sql("SELECT graft_cosine(a, b) ...")` plans the
  * identical whole-stage-codegen kernel.
  *
  * Two entry points, one builder table:
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` (spark-submit
  *    users; [[graft.Verify]] and [[graft.Bench]] sessions set it in code);
  *  - [[GraftFunctions.registerAll]] for an already-built session (tests).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  private def litInt(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT argument, got $other")
  }

  /** (name, info, builder) for every SQL-exposed kernel. */
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_simhash64",
      info("graft_simhash64", "_FUNC_(text) - 64-bit SimHash of the word multiset"),
      (args: Seq[Expression]) => SignatureExprs.SimHash64Expr(args.head)),
    ("graft_shingle_hashes",
      info("graft_shingle_hashes", "_FUNC_(text, k) - distinct k-word shingle hashes"),
      (args: Seq[Expression]) =>
        SignatureExprs.ShingleHashesExpr(args.head,
          litInt(args(1), "graft_shingle_hashes"))),
    ("graft_minhash_sig",
      info("graft_minhash_sig", "_FUNC_(text, m, k) - m-hash MinHash signature over k-shingles"),
      (args: Seq[Expression]) =>
        SignatureExprs.MinHashSigExpr(args.head,
          litInt(args(1), "graft_minhash_sig"), litInt(args(2), "graft_minhash_sig"))),
    ("graft_cosine",
      info("graft_cosine", "_FUNC_(a, b) - cosine similarity of two numeric arrays"),
      (args: Seq[Expression]) => SignatureExprs.CosineExpr(args.head, args(1))))

  /** Register on an existing session (temp functions, session-scoped). */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
