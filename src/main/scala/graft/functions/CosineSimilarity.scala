package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` vectors — the one justified custom expression in the
  * engine (SURVEY.md §7.4): it sits in the innermost loop of similarity
  * search (|queries| × |corpus| evaluations), where a codegen'd tight loop
  * beats the higher-order-function formulation (zip_with + aggregate build
  * intermediate arrays and box through lambda variables) and any UDF (which
  * would also pay serialization).
  *
  * Arithmetic contract (shared with the DuckDB oracle and the HOF
  * formulation it replaces): every product is rounded to 1e-6 via
  * `floor(x*1e6 + 0.5)` and accumulated in exact 64-bit integers, so the
  * result is independent of accumulation order — bit-identical across
  * engines, partitionings, and evaluation strategies. Final score =
  * dot / sqrt(normA * normB) in IEEE doubles.
  *
  * Null vectors propagate null (BinaryExpression's null-safe contract);
  * element nulls are not expected (embedding columns are dense). Vectors of
  * MISMATCHED length return null rather than a silently-truncated score —
  * cosine over different-dimensional vectors has no meaning, and truncating
  * would diverge from the full-norm HOF/oracle formulation.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be array<double>; call sites cast explicitly
  // (ExpectsInputTypes is private[sql], so coercion isn't declared here).
  override def dataType: DataType = DoubleType

  // nullable regardless of child nullability: length mismatch yields null
  override def nullable: Boolean = true

  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0L
    var nx = 0L
    var ny = 0L
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += math.floor(xi * yi * 1e6 + 0.5).toLong
      nx += math.floor(xi * xi * 1e6 + 0.5).toLong
      ny += math.floor(yi * yi * 1e6 + 0.5).toLong
      i += 1
    }
    dot.toDouble / math.sqrt(nx.toDouble * ny.toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        if ($x.numElements() != $y.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $x.numElements();
          long $dot = 0L; long $nx = 0L; long $ny = 0L;
          for (int $i = 0; $i < $n; $i++) {
            double $xi = $x.getDouble($i);
            double $yi = $y.getDouble($i);
            $dot += (long) java.lang.Math.floor($xi * $yi * 1e6 + 0.5);
            $nx += (long) java.lang.Math.floor($xi * $xi * 1e6 + 0.5);
            $ny += (long) java.lang.Math.floor($yi * $yi * 1e6 + 0.5);
          }
          ${ev.value} = ((double) $dot) / java.lang.Math.sqrt(((double) $nx) * ((double) $ny));
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Native cosine over INT8-QUANTIZED code vectors (`array<bigint>`): the
  * per-vector scales cancel in cosine, so the score is the pure integer
  * ratio dot / √(‖a‖²·‖b‖²) — exact 64-bit accumulation, ONE IEEE
  * division, and every multiply is an integer op (cheaper per element
  * than [[CosineSimilarity]]'s three float-round-scale products). Sits in
  * the same |queries| × |corpus| inner loop as cosine_sim, and replaces
  * the zip_with + aggregate HOF formulation for the same reason
  * (intermediate arrays + lambda boxing per pair). MEASURED honestly: at
  * the local test scales the two forms tie (0.80 s both at sf0.001 —
  * the query is plan-overhead-dominated, scoring is ~2M integer ops);
  * the native loop's advantage grows with |pairs|, which is the regime
  * the operator exists for. Mismatched lengths and zero-norm inputs (no
  * direction) return null.
  */
case class QuantizedCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "quantized_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0L
    var nx = 0L
    var ny = 0L
    var i = 0
    while (i < n) {
      val xi = x.getLong(i)
      val yi = y.getLong(i)
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    if (nx == 0L || ny == 0L) null
    else dot.toDouble / math.sqrt(nx.toDouble * ny.toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        if ($x.numElements() != $y.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $x.numElements();
          long $dot = 0L; long $nx = 0L; long $ny = 0L;
          for (int $i = 0; $i < $n; $i++) {
            long $xi = $x.getLong($i);
            long $yi = $y.getLong($i);
            $dot += $xi * $yi;
            $nx += $xi * $xi;
            $ny += $yi * $yi;
          }
          if ($nx == 0L || $ny == 0L) {
            ${ev.isNull} = true;
          } else {
            ${ev.value} = ((double) $dot) / java.lang.Math.sqrt(((double) $nx) * ((double) $ny));
          }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedCosine =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points for the engine's native functions. */
object GraftFunctions {
  import org.apache.spark.sql.graft.Bridge

  /** Cosine similarity of two `array<double>` columns (exact scaled-integer
    * accumulation; see [[CosineSimilarity]]).
    */
  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** Cosine over int8-quantized `array<bigint>` code vectors (see
    * [[QuantizedCosine]]).
    */
  def quantized_cosine(a: Column, b: Column): Column =
    Bridge.column(QuantizedCosine(Bridge.expression(a), Bridge.expression(b)))

  /** Size-capped distinct-collect over a string column: NULL when the
    * group's distinct count exceeds `maxSize`, the sorted distinct array
    * otherwise; hot groups' buffers are emptied at overflow so memory
    * stays O(maxSize) per group (see [[BoundedCollectSet]]).
    */
  def bounded_collect_set(x: Column, maxSize: Int): Column =
    Bridge.column(
      BoundedCollectSet(Bridge.expression(x), maxSize).toAggregateExpression())

  /** Build a bloom filter over a long column — Spark's own runtime-filter
    * aggregate (`BloomFilterAggregate`), surfaced for explicit use.
    */
  def bloom_agg(x: Column, expectedItems: Long, numBits: Long): Column =
    Bridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        Bridge.expression(x),
        org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
        .toAggregateExpression())

  /** Codegen'd bloom membership probe against a driver-held filter binary
    * (inlined as a literal — the form `BloomFilterMightContain` requires;
    * Spark's own InjectRuntimeFilter uses a scalar subquery the same way).
    */
  def bloom_might_contain(bloom: Array[Byte], x: Column): Column =
    Bridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(
          bloom, org.apache.spark.sql.types.BinaryType),
        Bridge.expression(x)))

  /** Unicode NFC normalization of a string column (codegen'd; see
    * [[NfcNormalize]]).
    */
  def nfc_normalize(s: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(s)))
}
