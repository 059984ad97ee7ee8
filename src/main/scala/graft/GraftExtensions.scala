package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.{HashExpressions, TextFunctions}

/** Spark extension point — the idiomatic way to ship this engine's
  * functions into ANY session, including spark-submit / Thrift /
  * connect deployments where user code never touches the session
  * builder:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * Injects the custom expressions (analyzer: ascii_fold,
  * snowball_stem; sketches: minhash_signature, simhash64,
  * cosine_similarity, sig_agreement, word_ngrams_3) as SQL-resolvable
  * functions. No custom planner rules or strategies are injected —
  * per SURVEY §4, the reference's whole surface plans onto built-in
  * operators, and injecting rules we don't need would only add
  * analysis cost.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

    def info(name: String) = new ExpressionInfo("graft", name)

    ext.injectFunction((FunctionIdentifier("ascii_fold"), info("ascii_fold"),
      (exprs: Seq[Expression]) => TextFunctions.AsciiFold(exprs.head)))
    ext.injectFunction((FunctionIdentifier("snowball_stem"), info("snowball_stem"),
      (exprs: Seq[Expression]) => TextFunctions.SnowballStem(exprs.head)))
    ext.injectFunction((FunctionIdentifier("minhash_signature"), info("minhash_signature"),
      (exprs: Seq[Expression]) => HashExpressions.MinHashSignature(exprs.head, 64)))
    ext.injectFunction((FunctionIdentifier("simhash64"), info("simhash64"),
      (exprs: Seq[Expression]) => HashExpressions.SimHash64(exprs.head)))
    ext.injectFunction((FunctionIdentifier("cosine_similarity"), info("cosine_similarity"),
      (exprs: Seq[Expression]) => HashExpressions.CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("sig_agreement"), info("sig_agreement"),
      (exprs: Seq[Expression]) => HashExpressions.SigAgreement(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("word_ngrams_3"), info("word_ngrams_3"),
      (exprs: Seq[Expression]) => HashExpressions.WordNgrams(exprs.head, 3)))
  }
}
