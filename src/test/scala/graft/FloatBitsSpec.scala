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
}
