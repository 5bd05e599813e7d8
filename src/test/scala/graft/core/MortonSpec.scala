package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.cell.Morton

/** Morton curve kernel: bit round-trips, the canonical z pattern, and the
  * range decomposition checked differentially against brute cell
  * enumeration (exact at full depth; superset-only when depth-capped). */
class MortonSpec extends AnyFunSuite {

  test("interleave/deinterleave round-trip across the 31-bit domain") {
    val vals = Seq(0L, 1L, 2L, 3L, 255L, 256L, 65535L, 65536L,
      (1L << 30) - 1, 1L << 30, (1L << 31) - 1) ++
      (0 until 200).map(i => (i * 2654435761L) & 0x7FFFFFFFL)
    for (x <- vals; y <- vals.take(11)) {
      assert(Morton.deinterleave(Morton.interleave(x, y)) == ((x, y)),
        s"round-trip failed for ($x, $y)")
    }
  }

  test("4x4 grid follows the canonical z pattern") {
    val expect = Map(
      (0L, 0L) -> 0L, (1L, 0L) -> 1L, (0L, 1L) -> 2L, (1L, 1L) -> 3L,
      (2L, 0L) -> 4L, (3L, 0L) -> 5L, (2L, 1L) -> 6L, (3L, 1L) -> 7L,
      (0L, 2L) -> 8L, (0L, 3L) -> 10L, (2L, 2L) -> 12L, (3L, 3L) -> 15L)
    for (((x, y), z) <- expect) assert(Morton.interleave(x, y) == z, s"($x,$y)")
  }

  test("ranges: exact cover — differential vs brute enumeration") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 60) {
      val x0 = rnd.nextInt(60); val y0 = rnd.nextInt(60)
      val x1 = x0 + rnd.nextInt(64 - x0 max 1); val y1 = y0 + rnd.nextInt(64 - y0 max 1)
      val rs = Morton.ranges(x0, y0, x1, y1)
      // sorted, disjoint, with real gaps (coalesced)
      for (i <- 1 until rs.length) assert(rs(i)._1 > rs(i - 1)._2 + 1, s"$x0,$y0,$x1,$y1: ${rs.toSeq}")
      // every rect cell covered (no under-cover)
      val cells = for (x <- x0 to x1; y <- y0 to y1) yield Morton.interleave(x, y)
      for (z <- cells)
        assert(rs.exists(r => z >= r._1 && z <= r._2), s"cell z=$z uncovered in ${rs.toSeq}")
      // exact: total range mass == rect cell count (full-depth descent)
      assert(rs.map(r => r._2 - r._1 + 1).sum == cells.length.toLong,
        s"over-cover at full depth for rect ($x0,$y0)-($x1,$y1)")
    }
  }

  test("ranges: depth cap over-covers but never under-covers, fewer intervals") {
    val (x0, y0, x1, y1) = (5L, 9L, 37L, 53L)
    val exact = Morton.ranges(x0, y0, x1, y1)
    val capped = Morton.ranges(x0, y0, x1, y1, maxLevels = 28) // root=31: cap at side 2^3
    assert(capped.length <= exact.length)
    for (x <- x0 to x1; y <- y0 to y1) {
      val z = Morton.interleave(x, y)
      assert(capped.exists(r => z >= r._1 && z <= r._2))
    }
    assert(capped.map(r => r._2 - r._1 + 1).sum >= exact.map(r => r._2 - r._1 + 1).sum)
  }
}
