package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd vector kernels over `array<float>` columns.
  *
  * These are the Spark-native analogs of the reference's distance kernels
  * (`/root/reference/src/MetalDistance.h:21-22` — squared-L2 and inner
  * product; direct per-pair L2 `shaders/l2_norm_f16.metal:74-97`; per-row
  * norm `shaders/l2_norm.metal:7-26`). Each implements `doGenCode` so the
  * scalar loop stays inside whole-stage codegen — a lambda UDF here would
  * break the fused stage that makes the cross-join + top-k pipeline cheap.
  *
  * Accumulation is fp64 over fp32 elements: strictly more accurate than the
  * reference's fp32/fp16 accumulation, and deterministic (fixed
  * left-to-right order per pair, no reduction-tree variance).
  */
trait VectorBinaryExpression extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
}

/** dot(a, b) = Σ aᵢ·bᵢ (the reference's METRIC_INNER_PRODUCT score). */
case class DotProductFloat(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** ‖a − b‖² — squared L2, no sqrt, matching FAISS METRIC_L2 semantics. */
case class SquaredL2Distance(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $x.getFloat($i) - (double) $y.getFloat($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** ‖v‖² = Σ vᵢ² — the per-row norm materialized at ingest
  * (reference: norms always computed from fp32 input,
  * `src/MetalIndexFlat.mm:258-268`).
  */
case class VectorNormSq(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val v = x.getFloat(i).toDouble; acc += v * v; i += 1 }
    acc
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |int $n = $x.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $x.getFloat($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** fp32 vector → 16-bit storage bits (`array<short>`).
  * `bfloat = false` → IEEE half (C `(__fp16)` cast semantics, ref
  * `src/MetalIndexFlat.mm:244-256`); `bfloat = true` → bfloat16
  * round-to-nearest-even truncation (ref `mm:224-243`).
  */
case class QuantizeVector16(child: Expression, bfloat: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(ShortType, containsNull = false)
  override def nullIntolerant: Boolean = true
  private def conv(f: Float): Short =
    if (bfloat) FloatBits.floatToBf16Bits(f) else FloatBits.floatToHalfBits(f)
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = conv(x.getFloat(i)); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val fn = if (bfloat) "floatToBf16Bits" else "floatToHalfBits"
      s"""
         |int $n = $x.numElements();
         |short[] $out = new short[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = graft.functions.FloatBits.$fn($x.getFloat($i));
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 16-bit storage bits → fp32 vector (exact dequantization; ref
  * `src/MetalIndexFlat.mm:508-527` reconstruct path).
  */
case class DequantizeVector16(child: Expression, bfloat: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(ShortType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (bfloat) FloatBits.bf16BitsToFloat(x.getShort(i))
        else FloatBits.halfBitsToFloat(x.getShort(i))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val fn = if (bfloat) "bf16BitsToFloat" else "halfBitsToFloat"
      s"""
         |int $n = $x.numElements();
         |float[] $out = new float[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = graft.functions.FloatBits.$fn($x.getShort($i));
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** fp32 vector → SQ8 (int8 scalar quantization): per-vector symmetric
  * max-abs scale (scale = max|x|/127) + one signed byte per element
  * (code = floor(x/scale + 0.5), exactly ±127 at the extremes) — FAISS's
  * `IndexScalarQuantizer(QT_8bit)` family recast per-vector. 4× fewer
  * stored bytes than fp32; decode is `code · scale` (exact in double).
  * Ingest-time only (CodegenFallback; the hot scan side is the compiled
  * [[DequantizeVectorInt8]]).
  */
case class QuantizeVectorInt8(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes
    with codegen.CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(ByteType, containsNull = false), nullable = false),
    StructField("scale", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(x.getFloat(i).toDouble)
      if (v > maxAbs) maxAbs = v
      i += 1
    }
    val scale = maxAbs / 127.0
    val out = new Array[Byte](n)
    i = 0
    while (i < n) {
      out(i) =
        if (scale == 0.0) 0
        else math.floor(x.getFloat(i).toDouble / scale + 0.5).toByte
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      UnsafeArrayData.fromPrimitiveArray(out), scale)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** (int8 codes, scale) → fp32 vector — the SQ8 decode, codegen'd so it
  * stays inside the scan stage of the declarative search plan.
  */
case class DequantizeVectorInt8(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(ByteType), DoubleType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val scale = r.asInstanceOf[Double]
    val n = codes.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = (codes.getByte(i).toDouble * scale).toFloat; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, s) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int $n = $c.numElements();
         |float[] $out = new float[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = (float) (((double) $c.getByte($i)) * $s);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** fp32 vector → SQ4 (int4 scalar quantization): per-vector symmetric
  * 15-level grid (scale = max|x|/7, code = floor(x/scale + 0.5) ∈ [−7, 7])
  * with TWO codes nibble-packed per stored byte — 8× fewer scanned bytes
  * than fp32, the rung between SQ8 and PQ on the compression ladder
  * (FAISS `IndexScalarQuantizer(QT_4bit)`). Nibbles are stored BIASED
  * (code + 8 ∈ [1, 15]): bias keeps the nibble unsigned, and 0 is never a
  * valid code, so the odd-length pad nibble (0) can't collide with data.
  * Byte i holds element 2i in its low nibble, element 2i+1 in its high
  * nibble. `n` (the element count) is carried in the struct because the
  * packed length alone can't distinguish 2m−1 from 2m elements.
  * Ingest-time only (CodegenFallback); the scan side is the compiled
  * [[DequantizeVectorInt4]].
  */
case class QuantizeVectorInt4(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes
    with codegen.CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(ByteType, containsNull = false), nullable = false),
    StructField("scale", DoubleType, nullable = false),
    StructField("n", IntegerType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(x.getFloat(i).toDouble)
      if (v > maxAbs) maxAbs = v
      i += 1
    }
    val scale = maxAbs / 7.0
    val out = new Array[Byte]((n + 1) / 2)
    i = 0
    while (i < n) {
      val code =
        if (scale == 0.0) 0
        else math.floor(x.getFloat(i).toDouble / scale + 0.5).toInt
      val nib = code + 8 // biased, ∈ [1, 15]
      if ((i & 1) == 0) out(i / 2) = nib.toByte
      else out(i / 2) = (out(i / 2) | (nib << 4)).toByte
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      UnsafeArrayData.fromPrimitiveArray(out), scale, n)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** (packed int4 codes, scale, n) → fp32 vector — the SQ4 decode,
  * codegen'd so it stays inside the scan stage of a declarative search
  * plan. Decode of nibble v is `float((v − 8) · scale)` — exact double
  * arithmetic + one IEEE float rounding, reproducible in SQL.
  */
case class DequantizeVectorInt4(first: Expression, second: Expression,
                                third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(ByteType), DoubleType, IntegerType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(c: Any, s: Any, len: Any): Any = {
    val codes = c.asInstanceOf[ArrayData]
    val scale = s.asInstanceOf[Double]
    val n = len.asInstanceOf[Int]
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val b = codes.getByte(i / 2) & 0xff
      val nib = if ((i & 1) == 0) b & 0xf else b >>> 4
      out(i) = ((nib - 8).toDouble * scale).toFloat
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, s, n) => {
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val nib = ctx.freshName("nib")
      val out = ctx.freshName("out")
      s"""
         |float[] $out = new float[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  int $b = $c.getByte($i / 2) & 0xff;
         |  int $nib = (($i & 1) == 0) ? ($b & 0xf) : ($b >>> 4);
         |  $out[$i] = (float) (((double) ($nib - 8)) * $s);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** fp32 vector → FP8 E4M3 codes, one byte per element (the OCP 8-bit
  * float: 4 exponent bits / 3 mantissa, bias 7, saturating-finite —
  * see `FloatBits.floatToFp8E4m3Bits`). The rung between int8's
  * uniform grid and f16: 4× fewer stored bytes than fp32 WITH a
  * per-element exponent, so no per-vector scale state and no outlier
  * sensitivity. Ingest-side (CodegenFallback, the QuantizeVectorInt4
  * precedent); the decode below is codegen'd for scan loops.
  */
case class QuantizeVectorFp8(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes
    with codegen.CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = FloatBits.floatToFp8E4m3Bits(x.getFloat(i))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** FP8 E4M3 codes → fp32 vector — exact decode (every e4m3 value is
  * fp32-representable), codegen'd table lookup so it stays inside the
  * scan stage of a declarative search plan.
  */
case class DequantizeVectorFp8(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(ByteType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val n = codes.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) = FloatBits.fp8E4m3ToFloat(codes.getByte(i))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      s"""
         |int $n = $c.numElements();
         |float[] $out = new float[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = graft.functions.FloatBits.fp8E4m3ToFloat($c.getByte($i));
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** fp32 vector → packed sign bits (binary/1-bit quantization, the
  * sign-LSH family): bit t of word j is set iff element 63·j + t > 0.
  * 63 bits per word — not 64 — so every per-bit power of two stays inside
  * a signed BIGINT and the SQL oracle reconstructs the words with exact
  * integer arithmetic (the same trick as the 63-bit SimHash fingerprints).
  * 1 bit per dimension = 32× fewer scanned bytes than fp32.
  */
case class SignBits(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes
    with codegen.CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val words = new Array[Long]((n + 62) / 63)
    var i = 0
    while (i < n) {
      if (x.getFloat(i) > 0f) words(i / 63) |= 1L << (i % 63)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(words)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hamming distance between two packed sign-bit arrays:
  * Σ popcount(aⱼ xor bⱼ). Integer-exact — identical in any engine.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i)); i += 1 }
    acc
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
