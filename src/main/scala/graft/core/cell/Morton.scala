package graft.core.cell

/**
 * Morton (Z-order) curve over non-negative 31-bit cell coordinates — the
 * file-clustering key behind SpatialLayout (SURVEY.md §4 "spatial index"
 * row: the reference's GiST index becomes a cell-grid equi-join for JOINS,
 * and a z-order file layout for SCANS, so bbox reads skip parquet files /
 * row groups by min-max stats instead of touching the whole table).
 *
 * `interleave` spreads the bits of (x, y) so that nearby cells get nearby
 * codes; `ranges` decomposes a cell-rectangle into few contiguous z-code
 * intervals by quadtree descent. Ranges may OVER-cover when `maxLevel`
 * truncates the descent (each unfinished node emits its whole interval) —
 * callers always AND an exact coordinate refinement, so over-cover costs
 * I/O, never correctness; under-cover is impossible (property-tested).
 *
 * Everything is pure 64-bit integer arithmetic, reproducible verbatim in
 * any SQL engine with shifts and bit-ands (the q_sp_zorder oracle re-derives
 * codes in DuckDB with the same five spread steps).
 */
object Morton {
  /** Spread the low 31 bits of v to the even bit positions of a Long. */
  @inline def spread(v: Long): Long = {
    var x = v & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8))  & 0x00FF00FF00FF00FFL
    x = (x | (x << 4))  & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  /** z-code of cell (x, y); x, y in [0, 2^31). */
  def interleave(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  /** Inverse of spread (compact the even bits). */
  @inline private def compact(v: Long): Long = {
    var x = v & 0x5555555555555555L
    x = (x | (x >> 1))  & 0x3333333333333333L
    x = (x | (x >> 2))  & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x >> 4))  & 0x00FF00FF00FF00FFL
    x = (x | (x >> 8))  & 0x0000FFFF0000FFFFL
    x = (x | (x >> 16)) & 0x00000000FFFFFFFFL
    x
  }

  def deinterleave(z: Long): (Long, Long) = (compact(z), compact(z >> 1))

  /**
   * Contiguous z-code intervals covering the inclusive cell rectangle
   * [x0..x1] × [y0..y1]. Quadtree descent from a root of side 2^`bits`;
   * a node fully inside the rectangle emits its whole interval (a quad
   * node's codes are contiguous by the Morton property); descent stops
   * `maxLevels` below the root and over-covers from there. Output is
   * sorted and coalesced (adjacent intervals merged).
   */
  def ranges(x0: Long, y0: Long, x1: Long, y1: Long,
             bits: Int = 31, maxLevels: Int = Int.MaxValue): Array[(Long, Long)] = {
    require(x0 <= x1 && y0 <= y1 && x0 >= 0 && y0 >= 0, "rectangle must be non-empty, non-negative")
    require(bits >= 1 && bits <= 31 && (x1 >> bits) == 0 && (y1 >> bits) == 0,
      s"coords must fit in $bits bits")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def rec(nx: Long, ny: Long, level: Int): Unit = {
      val side = 1L << level
      val mx = nx + side - 1; val my = ny + side - 1
      if (mx < x0 || nx > x1 || my < y0 || ny > y1) return // disjoint
      val zBase = interleave(nx, ny)
      val span = (side * side) - 1 // 4^level - 1
      if ((nx >= x0 && mx <= x1 && ny >= y0 && my <= y1) || // contained
          level == 0 || level <= bits - maxLevels) {        // depth cap: over-cover
        out += ((zBase, zBase + span))
      } else {
        val h = side >> 1
        rec(nx, ny, level - 1); rec(nx + h, ny, level - 1)
        rec(nx, ny + h, level - 1); rec(nx + h, ny + h, level - 1)
      }
    }
    rec(0, 0, bits)
    val sorted = out.sortBy(_._1)
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    for (r <- sorted) {
      if (merged.nonEmpty && merged.last._2 + 1 >= r._1)
        merged(merged.length - 1) = (merged.last._1, math.max(merged.last._2, r._2))
      else merged += r
    }
    merged.toArray
  }
}
