package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for the native text/vector expressions: makes every custom
  * Catalyst expression reachable from `spark.sql(...)` (and therefore from
  * any SQL-only client), not just the Scala Column API.
  *
  * Two registration paths, same builders:
  *  - config-driven: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  *    (the standard library-injection mechanism — applies to every session
  *    the submitter creates);
  *  - imperative: [[GraftExtensions.register]] on an existing session
  *    (tests, notebooks).
  *
  * Arity/argument validation happens at ANALYSIS time (bad literal → the
  * usual AnalysisException path, not a runtime task failure).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def litInt(fn: String, arg: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an INT literal, got $other")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n)
      throw new IllegalArgumentException(s"$fn expects $n arguments, got ${args.length}")

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** (name, info, builder) for every exposed function. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_charhash",
      info("graft_charhash", "graft_charhash(str) - rolling polynomial document fingerprint"),
      (args: Seq[Expression]) => { arity("graft_charhash", args, 1); CharPolyHash(args.head) }),
    ("graft_shingles",
      info("graft_shingles", "graft_shingles(str, n) - word n-gram shingle strings"),
      (args: Seq[Expression]) => {
        arity("graft_shingles", args, 2)
        ShinglesExpr(args.head, litInt("graft_shingles", "n", args(1)))
      }),
    ("graft_minhash",
      info("graft_minhash", "graft_minhash(str, k, n) - MinHash signature over n-gram shingles"),
      (args: Seq[Expression]) => {
        arity("graft_minhash", args, 3)
        MinhashShingleSig(args.head,
          litInt("graft_minhash", "k", args(1)), litInt("graft_minhash", "n", args(2)))
      }),
    ("graft_simhash",
      info("graft_simhash", "graft_simhash(str, n) - 30-bit SimHash over n-gram shingles"),
      (args: Seq[Expression]) => {
        arity("graft_simhash", args, 2)
        Simhash30Expr(args.head, litInt("graft_simhash", "n", args(1)))
      }),
    ("graft_simhash60",
      info("graft_simhash60",
        "graft_simhash60(str, n) - 60-bit SimHash over n-gram shingles (hamming-LSH banding signature)"),
      (args: Seq[Expression]) => {
        arity("graft_simhash60", args, 2)
        Simhash60Expr(args.head, litInt("graft_simhash60", "n", args(1)))
      }),
    ("graft_charhash_cp",
      info("graft_charhash_cp",
        "graft_charhash_cp(str) - codepoint-fold fingerprint (Unicode-correct tier)"),
      (args: Seq[Expression]) => {
        arity("graft_charhash_cp", args, 1); CharPolyHashCp(args.head)
      }),
    ("graft_tokens_cp",
      info("graft_tokens_cp",
        "graft_tokens_cp(str) - tokens split on the Unicode White_Space set"),
      (args: Seq[Expression]) => {
        arity("graft_tokens_cp", args, 1); TokensCpExpr(args.head)
      }),
    ("graft_minhash_cp",
      info("graft_minhash_cp",
        "graft_minhash_cp(str, k, n) - codepoint-tier MinHash signature"),
      (args: Seq[Expression]) => {
        arity("graft_minhash_cp", args, 3)
        MinhashShingleSigCp(args.head,
          litInt("graft_minhash_cp", "k", args(1)), litInt("graft_minhash_cp", "n", args(2)))
      }),
    ("graft_simhash60_cp",
      info("graft_simhash60_cp",
        "graft_simhash60_cp(str, n) - codepoint-tier 60-bit SimHash"),
      (args: Seq[Expression]) => {
        arity("graft_simhash60_cp", args, 2)
        Simhash60CpExpr(args.head, litInt("graft_simhash60_cp", "n", args(1)))
      }),
    ("graft_token_counts",
      info("graft_token_counts",
        "graft_token_counts(str) - struct(counts: map<token,count>, dl) per-document term frequencies"),
      (args: Seq[Expression]) => {
        arity("graft_token_counts", args, 1); TokenCountsExpr(args.head)
      }),
    ("graft_shingle_counts",
      info("graft_shingle_counts",
        "graft_shingle_counts(str, n) - map<shingle,count> per-document word n-gram frequencies"),
      (args: Seq[Expression]) => {
        arity("graft_shingle_counts", args, 2)
        ShingleCountsExpr(args.head, litInt("graft_shingle_counts", "n", args(1)))
      }),
    ("graft_token_set_count",
      info("graft_token_set_count",
        "graft_token_set_count(str, csvWords) - occurrence count of tokens in the comma-separated word set"),
      (args: Seq[Expression]) => {
        arity("graft_token_set_count", args, 2)
        val csv = args(1) match {
          case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
          case other => throw new IllegalArgumentException(
            s"graft_token_set_count: csvWords must be a STRING literal, got $other")
        }
        TokenSetCountExpr(args.head, csv.split(",").toSeq.filter(_.nonEmpty))
      }),
    ("graft_token_entropy",
      info("graft_token_entropy",
        "graft_token_entropy(str) - struct(raw: double, n_unique) Shannon token entropy (unrounded), null on token-less input"),
      (args: Seq[Expression]) => {
        arity("graft_token_entropy", args, 1); TokenEntropyExpr(args.head)
      }),
    ("graft_dot",
      info("graft_dot", "graft_dot(a, b) - float-vector dot product"),
      (args: Seq[Expression]) => { arity("graft_dot", args, 2); DotProductExpr(args(0), args(1)) }),
    ("graft_cosine",
      info("graft_cosine", "graft_cosine(a, b) - float-vector cosine similarity (unrounded)"),
      (args: Seq[Expression]) => { arity("graft_cosine", args, 2); CosineSimExpr(args(0), args(1)) }),
    ("graft_l2",
      info("graft_l2", "graft_l2(a, b) - float-vector euclidean distance (unrounded)"),
      (args: Seq[Expression]) => { arity("graft_l2", args, 2); L2DistExpr(args(0), args(1)) }),
    ("graft_srp_bucket",
      info("graft_srp_bucket", "graft_srp_bucket(v, bits) - sign-random-projection LSH bucket"),
      (args: Seq[Expression]) => {
        arity("graft_srp_bucket", args, 2)
        SrpBucketExpr(args.head, litInt("graft_srp_bucket", "bits", args(1)))
      }),
    ("graft_srp_band",
      info("graft_srp_band",
        "graft_srp_band(v, bits, planeOffset) - one band of a banded SRP signature " +
          "(bit r = hyperplane planeOffset + r; bands over disjoint plane ranges " +
          "compose an unbounded-width signature)"),
      (args: Seq[Expression]) => {
        arity("graft_srp_band", args, 3)
        SrpBucketExpr(args.head,
          litInt("graft_srp_band", "bits", args(1)),
          litInt("graft_srp_band", "planeOffset", args(2)))
      }))

  /** Imperative registration into an existing session (the config path
    * can't retrofit a session that already exists). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, inf, builder) =>
      org.apache.spark.sql.graftbridge.ColumnBridge
        .registerFunction(spark, name, inf, builder)
    }
}
