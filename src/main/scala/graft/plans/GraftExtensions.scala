package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BoundedCollectSet, CosineSimilarity, NfcNormalize, QuantizedCosine}

/** Engine extension installer: makes the native functions available to SQL
  * (`SELECT cosine_sim(a, b)`) via
  * `spark.sql.extensions=graft.plans.GraftExtensions` or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  *
  * The DataFrame API path (graft.functions.GraftFunctions) does not depend
  * on this registration — registered queries work under any caller-owned
  * SparkSession; this class only adds the SQL surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "cosine_sim expects exactly 2 arguments")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("quantized_cosine"),
      new ExpressionInfo(classOf[QuantizedCosine].getName, "quantized_cosine"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "quantized_cosine expects exactly 2 arguments")
        QuantizedCosine(children.head, children(1))
      }))
    // Spark's own runtime-filter bloom expressions, surfaced as SQL
    // functions: the engine uses these internally for InjectRuntimeFilter
    // but does not register them. bloom_agg(x, n_items, n_bits) builds a
    // binary filter; bloom_might_contain(bloom, x) is the codegen'd probe
    // — no UDF anywhere in a bloom-fronted join.
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "nfc_normalize expects exactly 1 argument")
        NfcNormalize(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("bounded_collect_set"),
      new ExpressionInfo(classOf[BoundedCollectSet].getName, "bounded_collect_set"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "bounded_collect_set expects (value, max_size)")
        val cap = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"bounded_collect_set max_size must be an integer literal, got $other")
        }
        BoundedCollectSet(children.head, cap)
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_agg"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "bloom_agg expects (value, n_items, n_bits)")
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "bloom_might_contain"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "bloom_might_contain expects (bloom, value)")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1))
      }))
  }
}
