package graft.tools
import graft.core.geom._
import graft.core.tags.Tags
import graft.core.cell.Grid
/** Scratch driver used by the verify flow to exercise the core library
  * through its public API (removed or repurposed later). */
object DriveCore {
  def main(args: Array[String]): Unit = {
    val d = Tags.tagDiff(Map("phone" -> "+46123456"), Map("phone" -> "+46123456", "contact:email" -> "hej@example.com"))
    println(s"DRIVE tagDiff -> $d")
    val wkb = Geom.toWkb(Geom.point(617000, 6728000))
    println(s"DRIVE wkb roundtrip -> ${Geom.toWkt(Geom.fromWkb(wkb))}")
    println(s"DRIVE dwithin(100m) -> ${Geom.dwithin(Geom.point(2000,1000), Geom.point(2050,1050), 100)}")
    println(s"DRIVE tile z14 Gävle -> ${Proj.tileOfSweref(617000, 6728000, 14)}")
    println(s"DRIVE kRing size -> ${Grid.kRing(Grid.cellOf(617000, 6728000, 1000), 1).length}")
    println(s"PROBE tagDiff(null,null) -> ${Tags.tagDiff(null, null)}")
    println(s"PROBE fixPhone('') -> '${Tags.fixPhone("")}'")
    println(s"PROBE distance 1-pt line -> ${Geom.distance(Geom.point(0,0), LineStringG(Array(Pt(5,0))))}")
    println(s"PROBE far-west tile -> ${Proj.tileOfSweref(106256, 6073000, 14)}")
    println(s"PROBE matchScore empty tags -> ${Tags.matchScore(Tags.MatchSpec(Some("name"), Seq("ref"), 50, 500, 1000), Map.empty, Map.empty, 10)}")
  }
}
