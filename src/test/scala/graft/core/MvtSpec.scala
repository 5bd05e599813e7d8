package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.mvt.Mvt
import graft.core.geom.{Envelope, Geom, Pt}

/** MVT 2.1 encoder round-trip: a minimal independent protobuf decoder reads
  * the bytes back and must see the layer/feature/geometry we encoded. */
class MvtSpec extends AnyFunSuite {

  // ---- tiny protobuf reader (independent of the encoder) -------------------
  private final class Reader(b: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (true) {
        val x = b(pos) & 0xff; pos += 1
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
      }
      v
    }
    def field(): (Int, Int) = { val t = varint(); ((t >> 3).toInt, (t & 7).toInt) }
    def bytes(): Array[Byte] = {
      val len = varint().toInt
      val out = java.util.Arrays.copyOfRange(b, pos, pos + len); pos += len; out
    }
    def sub(): Reader = { val len = varint().toInt; val r = new Reader(b, pos, pos + len); pos += len; r }
  }

  private case class DecFeature(id: Long, tags: Seq[Int], geomType: Int, cmds: Seq[Long])
  private case class DecLayer(version: Long, name: String, extent: Long,
      keys: Seq[String], values: Seq[String], features: Seq[DecFeature])

  private def decodeTile(bytes: Array[Byte]): Seq[DecLayer] = {
    val r = new Reader(bytes, 0, bytes.length)
    val layers = scala.collection.mutable.ArrayBuffer.empty[DecLayer]
    while (r.hasMore) {
      val (f, w) = r.field()
      assert(f == 3 && w == 2, s"tile-level field $f/$w")
      val lr = r.sub()
      var version = 0L; var name = ""; var extent = 0L
      val keys = scala.collection.mutable.ArrayBuffer.empty[String]
      val values = scala.collection.mutable.ArrayBuffer.empty[String]
      val features = scala.collection.mutable.ArrayBuffer.empty[DecFeature]
      while (lr.hasMore) lr.field() match {
        case (15, 0) => version = lr.varint()
        case (1, 2)  => name = new String(lr.bytes(), "UTF-8")
        case (5, 0)  => extent = lr.varint()
        case (3, 2)  => keys += new String(lr.bytes(), "UTF-8")
        case (4, 2)  =>
          val vr = lr.sub()
          while (vr.hasMore) vr.field() match {
            case (1, 2) => values += new String(vr.bytes(), "UTF-8")
            case (_, 0) => vr.varint()
            case (_, 2) => vr.bytes()
            case other  => fail(s"value field $other")
          }
        case (2, 2) =>
          val fr = lr.sub()
          var id = 0L; var gt = 0
          val tags = scala.collection.mutable.ArrayBuffer.empty[Int]
          val cmds = scala.collection.mutable.ArrayBuffer.empty[Long]
          while (fr.hasMore) fr.field() match {
            case (1, 0) => id = fr.varint()
            case (3, 0) => gt = fr.varint().toInt
            case (2, 2) => val tr = fr.sub(); while (tr.hasMore) tags += tr.varint().toInt
            case (4, 2) => val gr = fr.sub(); while (gr.hasMore) cmds += gr.varint()
            case other  => fail(s"feature field $other")
          }
          features += DecFeature(id, tags.toSeq, gt, cmds.toSeq)
        case other => fail(s"layer field $other")
      }
      layers += DecLayer(version, name, extent, keys.toSeq, values.toSeq, features.toSeq)
    }
    layers.toSeq
  }

  private def unzig(v: Long): Int = (((v >>> 1) ^ -(v & 1)).toInt)

  test("layer round-trip: version/name/extent/dictionaries/tags/geometry") {
    val f1 = Mvt.Feature(0L, Seq("state" -> "in-both", "upstream_tags" -> "{\"a\":\"1\"}"),
      Mvt.GeomPoint, Array((100, 200)))
    val f2 = Mvt.Feature(0L, Seq("state" -> "not-in-osm"),
      Mvt.GeomLine, Array((0, 0), (50, -30)))
    val tile = Mvt.encodeTile(Seq(Mvt.encodeLayer("default", Seq(f1, f2))))
    val Seq(layer) = decodeTile(tile)
    assert(layer.version == 2 && layer.name == "default" && layer.extent == 4096)
    assert(layer.keys == Seq("state", "upstream_tags"))
    assert(layer.values == Seq("in-both", "{\"a\":\"1\"}", "not-in-osm"))
    val Seq(d1, d2) = layer.features
    assert(d1.geomType == 1)
    assert(d1.tags == Seq(0, 0, 1, 1)) // state->in-both, upstream_tags->json
    // MoveTo count=1 then zigzag(100), zigzag(200)
    assert(d1.cmds == Seq((1L | (1L << 3)), Mvt.zigzag(100), Mvt.zigzag(200)))
    assert(d2.geomType == 2)
    assert(d2.tags == Seq(0, 2)) // state -> not-in-osm (dict reuse of key 0)
    // MoveTo(0,0) LineTo delta (50,-30)
    assert(d2.cmds.take(3) == Seq((1L | (1L << 3)), 0L, 0L))
    assert(d2.cmds.drop(3) == Seq((2L | (1L << 3)), Mvt.zigzag(50), Mvt.zigzag(-30)))
    assert(unzig(Mvt.zigzag(-30)) == -30 && unzig(Mvt.zigzag(50)) == 50)
  }

  test("asMvtGeom: projection, y-flip, buffer clip, line clipping") {
    val bounds = Envelope(0.0, 0.0, 4096.0, 4096.0) // 1 unit = 1 tile px
    // center of the tile -> (2048, 2048); y flips: my=4096 -> local y=0
    assert(Mvt.asMvtGeom(Seq((2048.0, 2048.0)), isLine = false, bounds)
      .exists { case (t, cs) => t == Mvt.GeomPoint && cs.sameElements(Array((2048, 2048))) })
    assert(Mvt.asMvtGeom(Seq((0.0, 4096.0)), isLine = false, bounds).get._2.sameElements(Array((0, 0))))
    // outside the 256-unit buffer -> dropped
    assert(Mvt.asMvtGeom(Seq((-400.0, 2048.0)), isLine = false, bounds).isEmpty)
    // just inside the buffer -> kept with negative local coords
    assert(Mvt.asMvtGeom(Seq((-200.0, 2048.0)), isLine = false, bounds).get._2.sameElements(Array((-200, 2048))))
    // a line crossing the tile is clipped to the buffered box
    val Some((t, cs)) = Mvt.asMvtGeom(Seq((-1000.0, 2048.0), (5000.0, 2048.0)), isLine = true, bounds)
    assert(t == Mvt.GeomLine && cs(0) == (-256, 2048) && cs(1) == (4352, 2048))
    // a line fully outside -> dropped
    assert(Mvt.asMvtGeom(Seq((-2000.0, -2000.0), (-1500.0, -1800.0)), isLine = true, bounds).isEmpty)
    // multipoint: first point outside, second inside -> the visible point is
    // KEPT (not dropped with the whole feature); first-inside/rest-outside
    // keeps only the in-buffer member (no out-of-extent coords emitted)
    assert(Mvt.asMvtGeom(Seq((-400.0, 2048.0), (2048.0, 2048.0)), isLine = false, bounds)
      .get._2.sameElements(Array((2048, 2048))))
    assert(Mvt.asMvtGeom(Seq((2048.0, 2048.0), (9999.0, 2048.0)), isLine = false, bounds)
      .get._2.sameElements(Array((2048, 2048))))
    // all outside / empty -> None, not a crash
    assert(Mvt.asMvtGeom(Seq((-400.0, 2048.0), (9999.0, 0.0)), isLine = false, bounds).isEmpty)
    assert(Mvt.asMvtGeom(Seq.empty, isLine = false, bounds).isEmpty)
  }

  test("property: random features round-trip bit-exactly through encode/decode") {
    val rnd = new scala.util.Random(20260817L)
    (1 to 100).foreach { _ =>
      val feats = (1 to 1 + rnd.nextInt(5)).map { _ =>
        val isLine = rnd.nextBoolean()
        val n = if (isLine) 2 + rnd.nextInt(5) else 1 + rnd.nextInt(4)
        val pts = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        while (pts.length < n) {
          val c = (rnd.nextInt(4609) - 256, rnd.nextInt(4609) - 256)
          if (pts.isEmpty || pts.last != c) pts += c // no zero deltas
        }
        Mvt.Feature(0L,
          Seq("state" -> Seq("in-both", "not-in-osm", "not-in-upstream")(rnd.nextInt(3)),
            ("k" + rnd.nextInt(3)) -> ("v" + rnd.nextInt(5))),
          if (isLine) Mvt.GeomLine else Mvt.GeomPoint, pts.toArray)
      }
      val Seq(layer) = decodeTile(Mvt.encodeTile(Seq(Mvt.encodeLayer("l", feats))))
      assert(layer.features.length == feats.length)
      feats.zip(layer.features).foreach { case (f, d) =>
        assert(d.geomType == f.geomType)
        // walk the command stream back to absolute coordinates
        val coords = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        var x = 0; var y = 0; var i = 0
        while (i < d.cmds.length) {
          val cnt = (d.cmds(i) >> 3).toInt
          i += 1
          (1 to cnt).foreach { _ =>
            x += unzig(d.cmds(i)); y += unzig(d.cmds(i + 1)); i += 2
            coords += ((x, y))
          }
        }
        assert(coords.toSeq == f.coords.toSeq, s"coords mangled for $f")
        val decAttrs = d.tags.grouped(2).map {
          case Seq(ki, vi) => layer.keys(ki) -> layer.values(vi)
        }.toSeq
        assert(decAttrs == f.attrs, "attr dictionaries mangled")
      }
    }
  }

  test("property: line clip outputs stay in the buffered box and on the segment") {
    val bounds = Envelope(0.0, 0.0, 4096.0, 4096.0) // 1 unit = 1 tile px
    val rnd = new scala.util.Random(99L)
    val lo = -256; val hi = 4096 + 256
    (1 to 300).foreach { _ =>
      def c() = rnd.nextDouble() * 8000 - 2000
      val (p1, p2) = ((c(), c()), (c(), c()))
      // the encoder rounds to local ints FIRST, then clips — the independent
      // reference segment is the one between the rounded local endpoints
      def local(p: (Double, Double)) =
        Pt(math.round(p._1).toDouble, math.round(4096.0 - p._2).toDouble)
      val (a, b) = (local(p1), local(p2))
      Mvt.asMvtGeom(Seq(p1, p2), isLine = true, bounds) match {
        case Some((t, cs)) =>
          assert(t == Mvt.GeomLine && cs.length >= 2)
          cs.foreach { case (x, y) =>
            assert(x >= lo && x <= hi && y >= lo && y <= hi,
              s"clipped vertex ($x,$y) outside the buffered box")
            // every output vertex lies on the input segment (clip never bends)
            assert(Geom.distPointSegment(Pt(x, y), a, b) <= 1.5,
              s"vertex ($x,$y) off the segment $a -> $b")
          }
        case None =>
          // a dropped segment must not pass visibly through the box: no
          // sampled point may sit clearly inside the buffer (margin 2 px
          // keeps integer rounding out of the verdict)
          (0 to 400).foreach { i =>
            val t = i / 400.0
            val sx = a.x + t * (b.x - a.x); val sy = a.y + t * (b.y - a.y)
            assert(!(sx > lo + 2 && sx < hi - 2 && sy > lo + 2 && sy < hi - 2),
              s"dropped segment passes through the box at ($sx,$sy)")
          }
      }
    }
  }
}
