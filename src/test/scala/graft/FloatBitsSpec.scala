package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FloatBits._

class FloatBitsSpec extends AnyFunSuite {

  private def sweep(n: Int, lo: Float, hi: Float)(f: Float => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    (0 until n).foreach(_ => f(lo + rnd.nextFloat() * (hi - lo)))
  }

  test("known f16 values round-trip exactly") {
    val known = Seq(
      0.0f -> 0x0000, 1.0f -> 0x3C00, -1.0f -> 0xBC00, 2.0f -> 0x4000,
      0.5f -> 0x3800, 65504.0f -> 0x7BFF, // max finite half
      5.9604645e-8f -> 0x0001 // smallest subnormal
    )
    for ((f, bits) <- known) {
      assert((floatToHalfBits(f) & 0xFFFF) === bits, s"for $f")
      assert(halfBitsToFloat(bits.toShort) === f)
    }
  }

  test("f16 overflow → Inf, Inf/NaN preserved") {
    assert(floatToHalfBits(1e9f) === 0x7C00.toShort)
    assert(floatToHalfBits(-1e9f) === 0xFC00.toShort)
    assert(floatToHalfBits(Float.PositiveInfinity) === 0x7C00.toShort)
    assert(halfBitsToFloat(floatToHalfBits(Float.NaN)).isNaN)
  }

  test("f16 overflow boundary: [65504, 65520) rounds to max finite, ≥65520 to Inf") {
    // pins the exact RNE boundary the round-trip ORACLE mirrors
    // (abs(quantized) > 65504 → err = +Inf on both engines)
    assert(halfBitsToFloat(floatToHalfBits(65504.0f)) === 65504.0f)
    assert(halfBitsToFloat(floatToHalfBits(65512.0f)) === 65504.0f) // tie → even (65504)
    assert(halfBitsToFloat(floatToHalfBits(65519.0f)) === 65504.0f)
    assert(halfBitsToFloat(floatToHalfBits(65520.0f)).isPosInfinity)
    assert(halfBitsToFloat(floatToHalfBits(-65520.0f)).isNegInfinity)
    assert(halfBitsToFloat(floatToHalfBits(65536.0f)).isPosInfinity)
  }

  test("f16 round-trip error ≤ 2^-11 relative (RNE)") {
    sweep(20000, -100f, 100f) { f =>
      val r = halfBitsToFloat(floatToHalfBits(f))
      if (math.abs(f) > 1e-4f) {
        assert(math.abs(r - f) <= math.abs(f) * (1.0f / 2048) + 1e-7f,
          s"f=$f r=$r")
      }
    }
  }

  test("f16 subnormal range round-trips within absolute 2^-25") {
    sweep(5000, -6e-5f, 6e-5f) { f =>
      val r = halfBitsToFloat(floatToHalfBits(f))
      assert(math.abs(r - f) <= 3.0e-8f, s"f=$f r=$r")
    }
  }

  test("f16 rounding is to nearest (ties to even)") {
    // 1 + 2^-11 is exactly halfway between 1.0 and the next half (1+2^-10):
    // RNE keeps the even mantissa → 1.0
    assert(halfBitsToFloat(floatToHalfBits(1.0f + 4.8828125e-4f)) === 1.0f)
    // 1 + 3*2^-11 is halfway between 1+2^-10 and 1+2^-9 → rounds to even
    // mantissa (..10) = 1+2^-9
    assert(halfBitsToFloat(floatToHalfBits(1.0f + 3 * 4.8828125e-4f)) ===
      1.0f + 2 * 9.765625e-4f)
  }

  test("bf16 is top-16-bits with RNE; relative error ≤ 2^-8") {
    assert(bf16BitsToFloat(floatToBf16Bits(1.0f)) === 1.0f)
    assert(bf16BitsToFloat(floatToBf16Bits(-2.5f)) === -2.5f)
    sweep(20000, -1e6f, 1e6f) { f =>
      val r = bf16BitsToFloat(floatToBf16Bits(f))
      if (math.abs(f) > 1e-30f) {
        assert(math.abs(r - f) <= math.abs(f) * (1.0f / 256), s"f=$f r=$r")
      }
    }
  }

  test("bf16 RNE matches reference bit trick on specific values") {
    // 0x3F800001 (1.0000001) → rounds down to 0x3F80
    assert(floatToBf16Bits(java.lang.Float.intBitsToFloat(0x3F800001)) === 0x3F80.toShort)
    // 0x3F808000 is exactly halfway; lsb of target (0) → stays 0x3F80 (even)
    assert(floatToBf16Bits(java.lang.Float.intBitsToFloat(0x3F808000)) === 0x3F80.toShort)
    // 0x3F818000 halfway with odd target lsb → rounds up to 0x3F82
    assert(floatToBf16Bits(java.lang.Float.intBitsToFloat(0x3F818000)) === 0x3F82.toShort)
    assert(floatToBf16Bits(Float.NaN) !== 0x7F80.toShort) // stays NaN, not Inf
  }

  // ---- FP8 E4M3 ----

  test("fp8 e4m3: every code round-trips bit-exactly (decode is exact)") {

    for (c <- 0 until 256) {
      val b = c.toByte
      val f = fp8E4m3ToFloat(b)
      if (!f.isNaN) {
        assert(floatToFp8E4m3Bits(f) === b, f"code 0x$c%02x value $f")
      } else {
        assert(fp8E4m3ToFloat(floatToFp8E4m3Bits(f)).isNaN)
      }
    }
  }

  test("fp8 e4m3 RNE: ties to even mantissa, exact grid values unchanged") {

    def rt(f: Float) = fp8E4m3ToFloat(floatToFp8E4m3Bits(f))
    assert(rt(1.0f) === 1.0f && rt(1.125f) === 1.125f)
    assert(rt(1.0625f) === 1.0f)   // halfway 1.0 / 1.125 → even mantissa 0
    assert(rt(1.1875f) === 1.25f)  // halfway 1.125 / 1.25 → even mantissa 2
    assert(rt(1.06f) === 1.0f && rt(1.07f) === 1.125f) // either side of the tie
  }

  test("fp8 e4m3 saturating-finite: beyond ±448 (incl. Inf) clamps; NaN stays NaN") {

    def rt(f: Float) = fp8E4m3ToFloat(floatToFp8E4m3Bits(f))
    assert(rt(448f) === 448f && rt(-448f) === -448f)
    assert(rt(449f) === 448f && rt(464f) === 448f) // 464 is the half-step edge
    assert(rt(480f) === 448f && rt(1e30f) === 448f)
    assert(rt(Float.PositiveInfinity) === 448f)
    assert(rt(Float.NegativeInfinity) === -448f)
    assert(rt(Float.NaN).isNaN)
  }

  test("fp8 e4m3 subnormals and underflow: step 2^-9, RNE to zero below 2^-10") {

    def rt(f: Float) = fp8E4m3ToFloat(floatToFp8E4m3Bits(f))
    val ulp = math.pow(2, -9).toFloat
    assert(rt(ulp) === ulp)              // smallest subnormal exact
    assert(rt(7 * ulp) === 7 * ulp)      // largest subnormal exact
    assert(rt(ulp / 2) === 0f)           // exactly 2^-10: tie → even → 0
    assert(rt(ulp * 0.75f) === ulp)      // above the tie → rounds up
    assert(rt(ulp / 4) === 0f)           // deep underflow
    assert(rt(0f) === 0f)
    // signed zero survives
    assert(java.lang.Float.floatToRawIntBits(rt(-0f)) ===
      java.lang.Float.floatToRawIntBits(-0f))
    assert(rt(-3 * ulp) === -3 * ulp)
  }

  test("fp8 e4m3 carry across binades: rounding 15.5→16 lands on the next exponent") {

    def rt(f: Float) = fp8E4m3ToFloat(floatToFp8E4m3Bits(f))
    assert(rt(15.5f) === 16f)   // mantissa carry bumps the exponent field
    assert(rt(0.99f) === 1.0f)  // subnormal→... normal boundary below 1 binade
    assert(rt(0.0625f) === 0.0625f) // 2^-4 exact normal
  }
}
