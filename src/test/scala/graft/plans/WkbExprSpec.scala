package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.geom.Geom
import graft.engine.SparkTestBase
import graft.functions.GeoFunctions

/** r6 parity pin: the native StPointWkb / StEnvelopePolyWkb expressions must
  * be byte-identical to the ScalaUDF closures they replaced (same Geom.toWkb
  * codec) and keep the UDF's null-in-null-out + nullable-output contract. */
class WkbExprSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  test("StPointWkb bytes == Geom.toWkb(point) and null propagates") {
    val r = new scala.util.Random(7)
    val rows = (1 to 300).map { i =>
      if (i % 29 == 0) (i.toLong, null.asInstanceOf[java.lang.Double],
        java.lang.Double.valueOf(r.nextDouble() * 1e6))
      else (i.toLong, java.lang.Double.valueOf(r.nextDouble() * 1e6 - 5e5),
        java.lang.Double.valueOf(r.nextDouble() * 1e6 - 5e5))
    }
    val df = rows.toDF("id", "x", "y")
      .withColumn("wkb", GeoFunctions.stPoint(col("x"), col("y")))
    val got = df.select("id", "x", "y", "wkb").collect()
    got.foreach { row =>
      if (row.isNullAt(1)) assert(row.isNullAt(3), s"null x must give null wkb: $row")
      else {
        val expect = Geom.toWkb(Geom.point(row.getDouble(1), row.getDouble(2)))
        assert(java.util.Arrays.equals(row.getAs[Array[Byte]](3), expect),
          s"byte drift at id=${row.getLong(0)}")
      }
    }
    assert(df.schema("wkb").nullable, "output must stay nullable like the UDF")
  }

  test("StEnvelopePolyWkb bytes == Geom.toWkb(envelopePoly) incl. int inputs cast") {
    val r = new scala.util.Random(11)
    val rows = (1 to 200).map { _ =>
      val x = r.nextDouble() * 1e5; val y = r.nextDouble() * 1e5
      (x, y, x + r.nextDouble() * 1e3, y + r.nextDouble() * 1e3)
    }
    val got = rows.toDF("x0", "y0", "x1", "y1")
      .withColumn("wkb", GeoFunctions.stEnvelopeWkb(col("x0"), col("y0"), col("x1"), col("y1")))
      .collect()
    got.foreach { row =>
      val expect = Geom.toWkb(Geom.envelopePoly(
        row.getDouble(0), row.getDouble(1), row.getDouble(2), row.getDouble(3)))
      assert(java.util.Arrays.equals(row.getAs[Array[Byte]](4), expect))
    }
    // integer-literal inputs must cast like the old UDF did
    val lit1 = Seq(1).toDF("i")
      .select(GeoFunctions.stEnvelopeWkb(lit(0), lit(0), lit(10), lit(20)).as("wkb"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(lit1, Geom.toWkb(Geom.envelopePoly(0, 0, 10, 20))))
  }

  test("native point build stays inside whole-stage codegen (no BatchEval/ScalaUDF node)") {
    val df = spark.range(10)
      .select(GeoFunctions.stPoint(col("id").cast("double"),
        col("id").cast("double") + 1.0).as("g"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && plan.contains("stpointwkb"),
      plan.linesIterator.take(10).mkString("\n"))
  }
}
