package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TopKBuffer

class TopKSpec extends AnyFunSuite {

  private def fill(b: TopKBuffer, items: Seq[(Double, Long)]): TopKBuffer = {
    items.foreach { case (s, l) => b.insert(s, l) }
    b
  }

  private def contents(b: TopKBuffer): Seq[(Double, Long)] = {
    val idx = b.sortedIndices
    idx.map(i => (b.scores(i), b.labels(i))).toSeq
  }

  private def oracle(items: Seq[(Double, Long)], k: Int, asc: Boolean): Seq[(Double, Long)] =
    items.sortBy { case (s, l) => (if (asc) s else -s, l) }.take(k)

  test("keeps the k best under (score, label) total order — both directions") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 50; asc <- Seq(true, false)) {
      val n = 1 + rnd.nextInt(200)
      val k = 1 + rnd.nextInt(20)
      // duplicate scores on purpose to exercise the label tiebreak
      val items = (0 until n).map(i => (rnd.nextInt(20).toDouble, i.toLong))
      val got = contents(fill(new TopKBuffer(k, asc), items))
      assert(got === oracle(items, k, asc), s"trial=$trial asc=$asc k=$k")
    }
  }

  test("buffer never exceeds k elements") {
    val b = fill(new TopKBuffer(5, true), (0 until 1000).map(i => (i.toDouble, i.toLong)))
    assert(b.size === 5)
    assert(contents(b) === (0 until 5).map(i => (i.toDouble, i.toLong)))
  }

  test("merge(topk(A), topk(B)) == topk(A ++ B) — partial/final agg correctness") {
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 50; asc <- Seq(true, false)) {
      val k = 1 + rnd.nextInt(16)
      val a = (0 until rnd.nextInt(100)).map(i => (rnd.nextDouble() * 10, i.toLong))
      val b = (0 until rnd.nextInt(100)).map(i => (rnd.nextDouble() * 10, (1000 + i).toLong))
      val bufA = fill(new TopKBuffer(k, asc), a)
      val bufB = fill(new TopKBuffer(k, asc), b)
      bufA.mergeIn(bufB)
      assert(contents(bufA) === oracle(a ++ b, k, asc), s"trial=$trial asc=$asc")
    }
  }

  test("NaN scores are always worst in both directions and evictable") {
    for (asc <- Seq(true, false)) {
      // NaN inserted while under-filled must be evicted by finite scores
      val b = new TopKBuffer(2, asc)
      b.insert(Double.NaN, 99L)
      b.insert(1.0, 1L)
      b.insert(2.0, 2L)
      b.insert(3.0, 3L)
      val got = contents(b)
      assert(!got.exists(_._1.isNaN), s"asc=$asc: NaN survived: $got")
      // and a buffer that only ever saw NaN still returns it (not lost)
      val only = new TopKBuffer(2, asc)
      only.insert(Double.NaN, 5L)
      assert(contents(only).map(_._2) === Seq(5L))
      // NaN sorts last, never rank 1
      val mixed = new TopKBuffer(3, asc)
      mixed.insert(Double.NaN, 9L); mixed.insert(1.0, 1L)
      assert(contents(mixed).head._2 === 1L)
    }
  }

  test("merge is associative across 3-way splits") {
    val rnd = new scala.util.Random(99)
    val all = (0 until 300).map(i => (rnd.nextDouble(), i.toLong))
    val (x, yz) = all.splitAt(100)
    val (y, z) = yz.splitAt(100)
    val k = 10
    // (x + y) + z
    val left = fill(new TopKBuffer(k, true), x)
    left.mergeIn(fill(new TopKBuffer(k, true), y))
    left.mergeIn(fill(new TopKBuffer(k, true), z))
    // x + (y + z)
    val right = fill(new TopKBuffer(k, true), y)
    right.mergeIn(fill(new TopKBuffer(k, true), z))
    val outer = fill(new TopKBuffer(k, true), x)
    outer.mergeIn(right)
    assert(contents(left) === contents(outer))
    assert(contents(left) === oracle(all, k, true))
  }
}
