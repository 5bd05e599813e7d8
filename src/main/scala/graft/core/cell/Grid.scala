package graft.core.cell

import graft.core.geom.{Envelope, Geom}

/**
 * Fixed-resolution square-grid spatial index over the EPSG:3006 plane.
 *
 * Replaces the reference's GiST index-nested-loop ST_DWithin joins
 * (SURVEY.md §2.4 J1/J2) with a distributed, shuffle-friendly equi-join key:
 * both sides are assigned cell ids; one side expands a k-ring so that every
 * true pair within distance d shares at least one cell (no false negatives —
 * property-tested in GridSpec); an exact `dwithin` refinement drops the
 * false positives.
 *
 * Cell id packing: ((ix + OFF) << 32) | (iy + OFF) in a Long — cheap,
 * deterministic, sortable; ids never collide for |coord| < OFF * cellSize.
 */
object Grid {
  /** visible to the engine so Column-form re-expressions of the packing
    * (ElementStore.blockCol) share THIS constant instead of a private copy
    * that could silently desynchronize from kRing's decode. */
  private[graft] val OFF = 1 << 30

  def cellOf(x: Double, y: Double, cellSize: Double): Long = {
    val ix = math.floor(x / cellSize).toLong + OFF
    val iy = math.floor(y / cellSize).toLong + OFF
    (ix << 32) | iy
  }

  def cellX(cell: Long): Long = (cell >>> 32) - OFF
  def cellY(cell: Long): Long = (cell & 0xFFFFFFFFL) - OFF

  /**
   * Cells covering `env` expanded by `radius`: the k-ring superset needed on
   * the probe side of a dwithin-join. With cellSize >= radius this is at most
   * a 3x3 block for point geometries.
   */
  def coverEnvelope(env: Envelope, radius: Double, cellSize: Double): Array[Long] = {
    val e = env.expand(radius)
    val x0 = math.floor(e.minX / cellSize).toLong
    val x1 = math.floor(e.maxX / cellSize).toLong
    val y0 = math.floor(e.minY / cellSize).toLong
    val y1 = math.floor(e.maxY / cellSize).toLong
    val out = new Array[Long](((x1 - x0 + 1) * (y1 - y0 + 1)).toInt)
    var i = 0
    var x = x0
    while (x <= x1) {
      var y = y0
      while (y <= y1) {
        out(i) = ((x + OFF) << 32) | (y + OFF)
        i += 1; y += 1
      }
      x += 1
    }
    out
  }

  /** Cells intersected by the geometry itself (build side of the join). */
  def coverGeom(g: Geom, cellSize: Double): Array[Long] =
    coverEnvelope(g.envelope, 0.0, cellSize)

  /** k-ring around a cell (k=1 -> 3x3). */
  def kRing(cell: Long, k: Int): Array[Long] = {
    val cx = cellX(cell); val cy = cellY(cell)
    val out = new Array[Long]((2 * k + 1) * (2 * k + 1))
    var i = 0
    var dx = -k
    while (dx <= k) {
      var dy = -k
      while (dy <= k) {
        out(i) = ((cx + dx + OFF) << 32) | (cy + dy + OFF)
        i += 1; dy += 1
      }
      dx += 1
    }
    out
  }
}
