package graft.core.mvt

import java.io.ByteArrayOutputStream
import graft.core.geom._

/**
 * Minimal Mapbox Vector Tile 2.1 encoder — the byte-level equivalent of the
 * reference's `ST_AsMVTGeom` + `ST_AsMVT('default')` sink
 * (12-v-deviation_preschools_scb.sql:83-98), written against the public MVT
 * protobuf spec. Pure Scala, no protobuf dependency: the .proto schema is
 * three message types with varint/length-delimited fields only.
 *
 * Message layout (vector_tile.proto):
 *   Tile:    3 = repeated Layer
 *   Layer:  15 = version (=2), 1 = name, 2 = repeated Feature,
 *            3 = repeated keys (string), 4 = repeated Value, 5 = extent
 *   Feature: 1 = id, 2 = packed tags (key-idx, value-idx pairs),
 *            3 = geom type (1 point, 2 linestring, 3 polygon),
 *            4 = packed geometry commands
 *   Value:   1 = string_value (only string attrs are emitted here — the
 *            reference's two attributes are both ::text)
 *
 * Geometry commands: CommandInteger = (id & 7) | (count << 3) with
 * MoveTo=1, LineTo=2, ClosePath=7; parameters are zigzag-encoded deltas in
 * tile-local coordinates.
 */
object Mvt {

  final val DefaultExtent = 4096
  final val DefaultBuffer = 256

  final val GeomPoint = 1
  final val GeomLine = 2

  /** one encodable feature: tile-local integer coordinates. */
  final case class Feature(
      id: Long,
      attrs: Seq[(String, String)],
      geomType: Int,
      coords: Array[(Int, Int)])

  // ---- protobuf primitives --------------------------------------------------

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  @inline def zigzag(n: Int): Long = ((n << 1) ^ (n >> 31)).toLong & 0xffffffffL

  private def writeTag(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    writeVarint(out, ((field << 3) | wire).toLong)

  private def writeBytesField(out: ByteArrayOutputStream, field: Int, b: Array[Byte]): Unit = {
    writeTag(out, field, 2)
    writeVarint(out, b.length.toLong)
    out.write(b, 0, b.length)
  }

  private def writeStringField(out: ByteArrayOutputStream, field: Int, s: String): Unit =
    writeBytesField(out, field, s.getBytes("UTF-8"))

  private def writeVarintField(out: ByteArrayOutputStream, field: Int, v: Long): Unit = {
    writeTag(out, field, 0)
    writeVarint(out, v)
  }

  // ---- geometry -> command stream -------------------------------------------

  /** packed command integers for a point or line in tile-local coords. */
  private[mvt] def geometryCommands(geomType: Int, coords: Array[(Int, Int)]): Array[Long] = {
    val cmds = scala.collection.mutable.ArrayBuffer.empty[Long]
    geomType match {
      case GeomPoint =>
        cmds += ((1L & 7) | (coords.length.toLong << 3)) // MoveTo count=n
        var px = 0; var py = 0
        for ((x, y) <- coords) {
          cmds += zigzag(x - px); cmds += zigzag(y - py)
          px = x; py = y
        }
      case GeomLine =>
        require(coords.length >= 2, "linestring needs >= 2 points")
        cmds += ((1L & 7) | (1L << 3)) // MoveTo count=1
        cmds += zigzag(coords(0)._1); cmds += zigzag(coords(0)._2)
        cmds += ((2L & 7) | ((coords.length - 1).toLong << 3)) // LineTo
        var px = coords(0)._1; var py = coords(0)._2
        for ((x, y) <- coords.drop(1)) {
          cmds += zigzag(x - px); cmds += zigzag(y - py)
          px = x; py = y
        }
      case other => sys.error(s"unsupported geom type $other")
    }
    cmds.toArray
  }

  // ---- ST_AsMVTGeom ---------------------------------------------------------

  /**
   * Project a 3857 geometry into tile-local integer coordinates for
   * `bounds3857`, clipping to the buffered tile (buffer in tile units, 256
   * like PostGIS). Returns None when fully outside — the reference drops the
   * row (ST_AsMVTGeom NULL). Points and polylines (the tile features are
   * centroids and 2-point centroid→centroid arrows; longer lines are clipped
   * per segment, keeping the longest contiguous visible chain).
   */
  def asMvtGeom(g3857: Seq[(Double, Double)], isLine: Boolean, bounds3857: Envelope,
                extent: Int = DefaultExtent, buffer: Int = DefaultBuffer): Option[(Int, Array[(Int, Int)])] = {
    val w = bounds3857.maxX - bounds3857.minX
    val h = bounds3857.maxY - bounds3857.minY
    val local = g3857.map { case (mx, my) =>
      (math.round((mx - bounds3857.minX) / w * extent).toInt,
       math.round((bounds3857.maxY - my) / h * extent).toInt) // MVT y grows DOWN
    }.toArray
    val lo = -buffer; val hi = extent + buffer
    def inside(p: (Int, Int)) = p._1 >= lo && p._1 <= hi && p._2 >= lo && p._2 <= hi
    if (!isLine) {
      // clip EVERY point (a multipoint keeps exactly its in-buffer members,
      // as ST_AsMVTGeom does); empty input or all-outside -> None, not a crash
      val kept = local.filter(inside)
      if (kept.nonEmpty) Some((GeomPoint, kept)) else None
    } else if (local.length < 2) {
      None // degenerate 1-point "line" — drop, as ST_AsMVTGeom yields NULL
    } else {
      // clip every consecutive segment and stitch contiguous survivors into
      // chains; keep the longest (tile features are 2-point arrows, so this
      // is the plain segment clip in practice — but a >2-point polyline now
      // keeps all its visible vertices instead of being silently truncated
      // to the first segment; multi-part output is out of scope for the
      // tile sink, which never produces clip-split lines)
      val chains = scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[(Int, Int)]]()
      var cur: scala.collection.mutable.ArrayBuffer[(Int, Int)] = null
      var i = 0
      while (i < local.length - 1) {
        clipSegment(local(i), local(i + 1), lo, hi) match {
          case Some((a, b)) =>
            if (cur != null && cur.last == a) cur += b
            else { cur = scala.collection.mutable.ArrayBuffer(a, b); chains += cur }
          case None => cur = null
        }
        i += 1
      }
      if (chains.isEmpty) None else Some((GeomLine, chains.maxBy(_.length).toArray))
    }
  }

  /** Liang-Barsky segment clip against the buffered square; None if outside,
    * degenerate (point-length after rounding) segments are kept — harmless
    * and faithful to the reference's unclipped short arrows. */
  private[mvt] def clipSegment(a: (Int, Int), b: (Int, Int), lo: Int, hi: Int): Option[((Int, Int), (Int, Int))] = {
    val (x0, y0) = (a._1.toDouble, a._2.toDouble)
    val (x1, y1) = (b._1.toDouble, b._2.toDouble)
    val dx = x1 - x0; val dy = y1 - y0
    var t0 = 0.0; var t1 = 1.0
    def clip(p: Double, q: Double): Boolean = {
      if (p == 0.0) q >= 0
      else {
        val r = q / p
        if (p < 0) { if (r > t1) return false; if (r > t0) t0 = r }
        else { if (r < t0) return false; if (r < t1) t1 = r }
        true
      }
    }
    if (clip(-dx, x0 - lo) && clip(dx, hi - x0) && clip(-dy, y0 - lo) && clip(dy, hi - y0) && t0 <= t1) {
      Some((
        (math.round(x0 + t0 * dx).toInt, math.round(y0 + t0 * dy).toInt),
        (math.round(x0 + t1 * dx).toInt, math.round(y0 + t1 * dy).toInt)))
    } else None
  }

  // ---- layer / tile encoding ------------------------------------------------

  private def encodeValue(s: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeStringField(out, 1, s)
    out.toByteArray
  }

  private def encodeFeature(f: Feature, keyIdx: Map[String, Int], valIdx: Map[String, Int]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeVarintField(out, 1, f.id)
    // packed tags
    val tags = new ByteArrayOutputStream()
    for ((k, v) <- f.attrs) {
      writeVarint(tags, keyIdx(k).toLong); writeVarint(tags, valIdx(v).toLong)
    }
    writeBytesField(out, 2, tags.toByteArray)
    writeVarintField(out, 3, f.geomType.toLong)
    val geom = new ByteArrayOutputStream()
    geometryCommands(f.geomType, f.coords).foreach(writeVarint(geom, _))
    writeBytesField(out, 4, geom.toByteArray)
    out.toByteArray
  }

  /** one layer message (the reference always emits a single 'default'
    * layer). Keys/values are dictionary-deduped in first-seen order, as
    * ST_AsMVT does. */
  def encodeLayer(name: String, features: Seq[Feature], extent: Int = DefaultExtent): Array[Byte] = {
    val keys = scala.collection.mutable.LinkedHashSet.empty[String]
    val vals = scala.collection.mutable.LinkedHashSet.empty[String]
    for (f <- features; (k, v) <- f.attrs) { keys += k; vals += v }
    val keyIdx = keys.zipWithIndex.toMap
    val valIdx = vals.zipWithIndex.toMap

    val out = new ByteArrayOutputStream()
    writeVarintField(out, 15, 2L) // version
    writeStringField(out, 1, name)
    features.foreach(f => writeBytesField(out, 2, encodeFeature(f, keyIdx, valIdx)))
    keys.foreach(writeStringField(out, 3, _))
    vals.foreach(v => writeBytesField(out, 4, encodeValue(v)))
    writeVarintField(out, 5, extent.toLong)
    out.toByteArray
  }

  /** full tile = repeated Layer under field 3. */
  def encodeTile(layers: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    layers.foreach(writeBytesField(out, 3, _))
    out.toByteArray
  }
}
