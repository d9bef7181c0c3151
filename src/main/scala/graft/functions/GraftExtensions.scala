package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Library-grade registration of the graft native expressions:
  *
  * {{{
  *   spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * injects `graft_dot`, `graft_gram_min_md5`, and `graft_char_grams`
  * into every session built with the extension — SQL, thriftserver, and
  * notebook users get them without any Scala-side
  * [[VectorExpressions.register]] call (which remains for programmatic
  * use and is idempotent with this path). Injection happens at session
  * build time via the supported `SparkSessionExtensions.injectFunction`
  * hook, the same mechanism a Catalyst rule or strategy would use. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // className points at each EXPRESSION class (what DESCRIBE FUNCTION
    // EXTENDED reports), not at this registrar
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info(classOf[DotProduct], "graft_dot",
        "graft_dot(a, b) - left-to-right double-fold dot product of two float/double arrays"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_gram_min_md5"),
      info(classOf[GramMinMd5], "graft_gram_min_md5",
        "graft_gram_min_md5(text, n) - minimum md5 over rolling character n-grams (winnowing fingerprint)"),
      (exprs: Seq[Expression]) => GramMinMd5(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_char_grams"),
      info(classOf[CharGrams], "graft_char_grams",
        "graft_char_grams(text, n) - sorted distinct rolling character n-grams"),
      (exprs: Seq[Expression]) => CharGrams(exprs(0), exprs(1))))
  }
}
