package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hot-path scalar math
  * (reference scalar surface per SURVEY.md §2.7): dense dot / cosine over
  * `ArrayType(FloatType)` and sparse dot over `MapType(StringType, FloatType)`.
  *
  * Dense ops implement `doGenCode` so they stay inside whole-stage codegen —
  * this is the Spark counterpart of the reference's tight per-doc scoring
  * loops (e.g. query/NeuralQueryBuilder.java k-NN scoring via the k-NN plugin,
  * sparse/data/SparseVector.java dot products). All ops compute in double
  * precision and are null-safe (null in → null out).
  */
object VectorExpressions {

  // Input-type checks: ExpectsInputTypes is private[sql] in Spark 4, so the
  // expressions validate via checkInputDataTypes instead — a SQL call with
  // ArrayType(DoubleType) would otherwise misread 4 of every 8 bytes
  // through getFloat (silently wrong scores, not an error).
  private def checkFloatArrays(name: String, children: Seq[Expression]): TypeCheckResult = {
    val bad = children.find(c => c.dataType match {
      case ArrayType(FloatType, _) => false
      case _                       => true
    })
    bad match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<float> arguments, got ${c.dataType.catalogString} — cast embeddings to array<float>")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  private def checkFloatMaps(name: String, children: Seq[Expression]): TypeCheckResult = {
    val bad = children.find(c => c.dataType match {
      case MapType(StringType, FloatType, _) => false
      case _                                 => true
    })
    bad match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"$name requires map<string,float> arguments, got ${c.dataType.catalogString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  /** Driver-side scalar cosine over float arrays — the one shared kernel
    * for small collected candidate sets (MMR, IVF probing); matches
    * DenseCosine's dot/sqrt(na·nb) with 0.0 on zero norms. */
  private[graft] def cosineArrays(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  // Local names come from ctx.freshName: nullSafeCodeGen only brace-wraps
  // the result code when a child is nullable, so fixed names would collide
  // (janino compile error → silent interpreted fallback) when two dense ops
  // over non-nullable inputs share one codegen scope.
  private def loopDot(ctx: CodegenContext, a: String, b: String, acc: String): String = {
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    s"""
       |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double $acc = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
       |}
     """.stripMargin
  }

  case class DenseDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "dense_dot"
    override def checkInputDataTypes(): TypeCheckResult =
      checkFloatArrays(prettyName, children)

    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var s = 0.0; var i = 0
      while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val acc = ctx.freshName("acc")
        s"${loopDot(ctx, a, b, acc)}\n${ev.value} = $acc;"
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  case class DenseCosine(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "dense_cosine"
    override def checkInputDataTypes(): TypeCheckResult =
      checkFloatArrays(prettyName, children)

    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0, $na = 0.0, $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = (double) $a.getFloat($i);
           |  double $y = (double) $b.getFloat($i);
           |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
           |}
           |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($na * $nb);
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** Sparse dot product Σ_t q_t · d_t over token-weight maps — the scoring
    * kernel of the `neural_sparse` query (reference:
    * query/NeuralSparseQueryBuilder.java:569-589, BooleanQuery of
    * FeatureField.newLinearQuery clauses). When the query side is a foldable
    * literal (the common case: one query vector vs the corpus), its map is
    * materialized once into a Java HashMap and probed per doc token.
    */
  case class SparseDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "sparse_dot"
    override def checkInputDataTypes(): TypeCheckResult =
      checkFloatMaps(prettyName, children)

    @transient private lazy val foldedRight: java.util.HashMap[UTF8String, java.lang.Float] =
      if (right.foldable) {
        val m = right.eval(null)
        if (m == null) null else toJavaMap(m.asInstanceOf[MapData])
      } else null

    private def toJavaMap(m: MapData): java.util.HashMap[UTF8String, java.lang.Float] = {
      val out = new java.util.HashMap[UTF8String, java.lang.Float](m.numElements() * 2)
      val ks = m.keyArray(); val vs = m.valueArray()
      var i = 0
      while (i < m.numElements()) {
        out.put(ks.getUTF8String(i).clone(), vs.getFloat(i)); i += 1
      }
      out
    }

    /** Kernel shared by the interpreted and codegen paths. The query-side
      * HashMap is materialized once when the right child is foldable. */
    def computeDot(docAny: Any, rAny: Any): Double = {
      val doc = docAny.asInstanceOf[MapData]
      val q = if (foldedRight != null) foldedRight else toJavaMap(rAny.asInstanceOf[MapData])
      val ks = doc.keyArray(); val vs = doc.valueArray()
      var s = 0.0; var i = 0
      while (i < doc.numElements()) {
        val w = q.get(ks.getUTF8String(i))
        if (w != null) s += vs.getFloat(i).toDouble * w.doubleValue()
        i += 1
      }
      s
    }

    override protected def nullSafeEval(l: Any, r: Any): Any = computeDot(l, r)

    /** Codegen: call the kernel through a reference object so the
      * surrounding operator stays inside WholeStageCodegen (no interpreted
      * projection fallback for the whole stage). */
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("sparseDot", this,
        "graft.functions.VectorExpressions.SparseDot")
      nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $ref.computeDot($l, $r);")
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** Count of common elements of two SORTED bigint arrays (distinct-element
    * inputs — the per-doc shingle/fingerprint hash arrays): one merge pass
    * directly over ArrayData, inside whole-stage codegen. Replaces the
    * Scala-UDF merge that dominated prefix-dedup verification at scale:
    * the UDF deserialized both catalyst arrays into Seq[Long] per candidate
    * pair (~8.4M conversions / ~430M boxed longs at ×10 replication —
    * measured 17 s of a 23 s pipeline; the same merge as a native
    * expression is pure primitive reads). */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "sorted_intersect_count"
    override def checkInputDataTypes(): TypeCheckResult = {
      val bad = children.find(c => c.dataType match {
        case ArrayType(LongType, _) => false
        case _                      => true
      })
      bad match {
        case Some(c) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<bigint> arguments, got ${c.dataType.catalogString}")
        case None => TypeCheckResult.TypeCheckSuccess
      }
    }

    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
      val na = a.numElements(); val nb = b.numElements()
      var i = 0; var j = 0; var n = 0L
      while (i < na && j < nb) {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { n += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
      n
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val n = ctx.freshName("cnt")
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        s"""
           |int $na = $a.numElements(); int $nb = $b.numElements();
           |int $i = 0; int $j = 0; long $n = 0L;
           |while ($i < $na && $j < $nb) {
           |  long $x = $a.getLong($i); long $y = $b.getLong($j);
           |  if ($x == $y) { $n++; $i++; $j++; }
           |  else if ($x < $y) { $i++; } else { $j++; }
           |}
           |${ev.value} = $n;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** Dot product of two signed-byte quantized vectors (BinaryType) — the
    * integer kernel of the embedding dedup's byte-quantized prefilter
    * (reference semantics: sparse/quantization/ByteQuantizer.java:25-34
    * linear scale-to-byte with a ceiling, ByteQuantizationUtil.java:62-64
    * integer products rescaled by ceil²/255² at score time; here the
    * ceiling is per-vector max-|component| because dense embeddings are
    * signed where the reference's sparse weights are positive). 64 byte
    * loads + integer MACs per pair, inside whole-stage codegen — the
    * prefilter's whole point is that this runs where the 64-float dot
    * would have, on a quarter of the shuffled bytes. */
  case class ByteDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "byte_dot"
    override def checkInputDataTypes(): TypeCheckResult = {
      val bad = children.find(_.dataType != BinaryType)
      bad match {
        case Some(c) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires binary arguments, got ${c.dataType.catalogString}")
        case None => TypeCheckResult.TypeCheckSuccess
      }
    }

    // Mismatched lengths THROW (ADVICE r17): the prefilter's lossless
    // bound (quantKeepCond) assumes the full dim contributed — a silent
    // min-length truncation would quietly weaken it. The quant pipelines
    // filter size === dim before quantizing, so a mismatch here is a bug,
    // not data.
    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[Array[Byte]]; val b = r.asInstanceOf[Array[Byte]]
      if (a.length != b.length) throw new IllegalArgumentException(
        s"byte_dot length mismatch: ${a.length} vs ${b.length}")
      var s = 0L; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |if ($a.length != $b.length) {
           |  throw new IllegalArgumentException(
           |    "byte_dot length mismatch: " + $a.length + " vs " + $b.length);
           |}
           |long $acc = 0L;
           |for (int $i = 0; $i < $a.length; $i++) {
           |  $acc += $a[$i] * $b[$i];
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  // Column-level API (Spark 4: Column<->Expression via Bridge)
  def dense_dot(a: Column, b: Column): Column =
    Bridge.column(DenseDot(Bridge.expression(a), Bridge.expression(b)))
  def dense_cosine(a: Column, b: Column): Column =
    Bridge.column(DenseCosine(Bridge.expression(a), Bridge.expression(b)))
  def sparse_dot(doc: Column, query: Column): Column =
    Bridge.column(SparseDot(Bridge.expression(doc), Bridge.expression(query)))
  def sorted_intersect_count(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))
  def byte_dot(a: Column, b: Column): Column =
    Bridge.column(ByteDot(Bridge.expression(a), Bridge.expression(b)))
}
